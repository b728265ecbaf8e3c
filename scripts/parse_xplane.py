"""Per-HLO-op device time from a JAX profiler trace (CLI).

Thin CLI over tapnet_tpu.utils.xplane — a dependency-free XSpace parser
(the tensorflow/tensorboard native bridges are protobuf-incompatible in
this image).

Usage: python scripts/parse_xplane.py <trace_dir_or_xplane.pb> [--top 30]
       [--iters N]   (divide totals by N steps for per-iteration ms)

Caveat: copy-start/while per-op events include wait time (double counting);
the outer `jit_<fn>` event is the per-iteration truth.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tapnet_tpu.utils.xplane import latest_xplane, op_times  # noqa: E402


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
        path = latest_xplane(path)
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
