"""Minimal XSpace/XPlane parser: per-HLO-op device time from a JAX profiler
trace, with zero dependencies on tensorflow/tensorboard native bridges
(which are protobuf-incompatible in this image).

Wire format (tsl/profiler/protobuf/xplane.proto):
  XSpace   { repeated XPlane planes = 1; }
  XPlane   { int64 id=1; string name=2; repeated XLine lines=3;
             map<int64,XEventMetadata> event_metadata=4; }
  XLine    { int64 id=1; string name=2; repeated XEvent events=4; }
  XEvent   { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3; }
  XEventMetadata { int64 id=1; string name=2; }

Usage: python scripts/parse_xplane.py <trace_dir_or_xplane.pb> [--top 30]
       [--iters N]   (divide totals by N steps for per-iteration ms)
"""

import argparse
import glob
import os
import sys
from collections import defaultdict


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf, start, end):
    """Yield (field_no, wire_type, value_or_span) over a message body."""
    i = start
    while i < end:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
            yield fno, wt, v
        elif wt == 2:
            ln, i = _varint(buf, i)
            yield fno, wt, (i, i + ln)
            i += ln
        elif wt == 5:
            yield fno, wt, int.from_bytes(buf[i:i + 4], "little")
            i += 4
        elif wt == 1:
            yield fno, wt, int.from_bytes(buf[i:i + 8], "little")
            i += 8
        else:
            raise ValueError(f"wire type {wt}")


def parse_plane(buf, span):
    name = ""
    meta = {}
    events = []  # (metadata_id, duration_ps)
    for fno, wt, v in _fields(buf, *span):
        if fno == 2 and wt == 2:
            name = buf[v[0]:v[1]].decode("utf-8", "replace")
        elif fno == 4 and wt == 2:  # event_metadata map entry
            mid, mname = None, ""
            for f2, w2, v2 in _fields(buf, *v):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in _fields(buf, *v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 2 and w3 == 2:
                            mname = buf[v3[0]:v3[1]].decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mname
        elif fno == 3 and wt == 2:  # XLine
            for f2, w2, v2 in _fields(buf, *v):
                if f2 == 4 and w2 == 2:  # XEvent
                    mid = dur = 0
                    for f3, w3, v3 in _fields(buf, *v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    events.append((mid, dur))
    return name, meta, events


def op_times(path):
    """{plane_name: {op_name: total_ms}} from an xplane.pb file."""
    buf = open(path, "rb").read()
    out = {}
    for fno, wt, v in _fields(buf, 0, len(buf)):
        if fno == 1 and wt == 2:
            name, meta, events = parse_plane(buf, v)
            tot = defaultdict(float)
            for mid, dur in events:
                tot[meta.get(mid, f"#{mid}")] += dur / 1e9
            out[name] = dict(tot)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--iters", type=int, default=1)
    p.add_argument("--plane", default=None,
                   help="substring filter for plane names (default: TPU/device)")
    args = p.parse_args()
    path = args.path
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(
            path, "**", "*.xplane.pb"), recursive=True))
        if not cands:
            sys.exit(f"no xplane.pb under {path}")
        path = cands[-1]
    for plane, tot in op_times(path).items():
        want = (args.plane in plane) if args.plane else (
            "TPU" in plane or "/device" in plane.lower())
        if not want:
            continue
        print(f"== {plane}  (top {args.top}, /{args.iters} iters)")
        items = sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]
        total = sum(tot.values())
        for name, ms in items:
            print(f"  {ms / args.iters:9.3f} ms  {100 * ms / total:5.1f}%  "
                  f"{name[:100]}")
        print(f"  {'TOTAL':>9}: {total / args.iters:.3f} ms/iter")


if __name__ == "__main__":
    main()
