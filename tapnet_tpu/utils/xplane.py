"""Minimal XSpace/XPlane parser + device-time attribution helpers.

Parses the protobuf wire format of jax.profiler traces directly (the
tensorboard_plugin_profile native bridge is protobuf-incompatible in this
image), with zero TF dependencies. Used by scripts/parse_xplane.py (CLI) and
by bench.py / scripts/profile_device.py to anchor every throughput claim in
profiler-derived DEVICE time rather than tunnel wall-clock (VERDICT r3
item 1: the `jit_<fn>` outermost event in the TPU device plane is the
per-iteration truth; per-op copy-start/while events include wait time and
double-count).

Wire format (tsl/profiler/protobuf/xplane.proto):
  XSpace   { repeated XPlane planes = 1; }
  XPlane   { int64 id=1; string name=2; repeated XLine lines=3;
             map<int64,XEventMetadata> event_metadata=4; }
  XLine    { int64 id=1; string name=2; repeated XEvent events=4; }
  XEvent   { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3; }
  XEventMetadata { int64 id=1; string name=2; }
"""

from __future__ import annotations

import glob
import os
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
                            mname = buf[v3[0]:v3[1]].decode("utf-8",
                                                            "replace")
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


def latest_xplane(trace_dir: str) -> str:
    """Newest *.xplane.pb under a jax.profiler trace directory.

    Sorted by (mtime, path): jax.profiler names session dirs by timestamp,
    so the lexicographic tiebreak keeps the choice deterministic when a
    fresh checkout gives every committed trace the same mtime."""
    cands = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True),
                   key=lambda p: (os.path.getmtime(p), p))
    if not cands:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    return cands[-1]


def device_op_times(trace_dir: str) -> dict:
    """{op_name: total_ms} for the accelerator device plane of a trace dir."""
    path = trace_dir
    if os.path.isdir(path):
        path = latest_xplane(path)
    for plane, tot in op_times(path).items():
        if "TPU" in plane or "/device:GPU" in plane:
            if tot:  # skip empty Megascale/host planes
                return tot
    raise ValueError(f"no non-empty device plane in {path}")


def jit_device_ms(trace_dir: str, name: str, iters: int = 1) -> float:
    """Device ms/iteration of the outermost `jit_<name>(...)` module events.

    This is THE per-iteration device-time number of record: it excludes host
    dispatch and tunnel latency, and unlike per-op sums it has no
    copy-start/while double counting."""
    tot = device_op_times(trace_dir)
    ms = sum(v for k, v in tot.items()
             if k == f"jit_{name}" or k.startswith(f"jit_{name}("))
    if ms == 0.0:
        raise ValueError(
            f"no jit_{name} events in device plane "
            f"(have: {[k for k in tot if k.startswith('jit_')]!r})")
    return ms / iters
