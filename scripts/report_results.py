"""Evaluate trained checkpoints vs heuristic baselines -> RESULTS.md.

Usage: python scripts/report_results.py [--ckpt-root ckpts] [--batch 512]
Writes a markdown table of greedy-decode packing quality (C/P/S/reward) per
driver config next to the random/first heuristics on the same held-out
instance streams, plus training wall-time from the metrics JSONL.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-root", default="ckpts")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--seed", type=int, default=10_000)
    ap.add_argument("--out", default="RESULTS.md")
    args = ap.parse_args(argv)

    import jax
    from tapnet_tpu.config import CONFIGS
    from tapnet_tpu.train import checkpoints as ckpt
    from tapnet_tpu.train.reinforce import init_train_state
    from tapnet_tpu.train.trainer import TrainLoopConfig, evaluate

    rows = []
    for name, cfg in CONFIGS.items():
        cdir = os.path.join(args.ckpt_root, name)
        path = ckpt.latest_checkpoint(cdir) if os.path.isdir(cdir) else None
        if not path:
            print(f"[skip] no checkpoint for {name}", file=sys.stderr)
            continue
        ts = init_train_state(jax.random.key(0), cfg, args.hidden)
        ts = ckpt.restore_checkpoint(path, ts)
        loop = TrainLoopConfig(hidden=args.hidden, valid_batch=args.batch,
                               valid_seed=args.seed)
        out = evaluate(ts.params, cfg, loop, baselines=True)
        wall = None
        mpath = os.path.join(cdir, "metrics.jsonl")
        if os.path.exists(mpath):
            with open(mpath) as f:
                for line in f:
                    rec = json.loads(line)
                    wall = rec.get("wall", wall)
        rows.append({"config": name, "step": int(ts.step), "wall_s": wall,
                     **{k: round(float(v), 4) for k, v in out.items()}})
        print(json.dumps(rows[-1]))

    if not rows:
        print("no checkpoints found", file=sys.stderr)
        return 1

    lines = [
        "# RESULTS — learned policy vs reference-style heuristics",
        "",
        f"Greedy pointer-decode packing quality on {args.batch} held-out",
        "instances (fixed seed stream, never trained on), next to the fixed",
        "`random` (uniform-feasible, the reference's rollout baseline) and",
        "`first` (lowest-index) policies **on the same instances**.",
        "Reward = C+P+S (each in (0,1], higher is better).",
        "",
        "| config | train steps | train wall (s) | learned reward | "
        "C | P | S | random | first |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['config']} | {r['step']} | "
            f"{round(r['wall_s']) if r['wall_s'] else '—'} | "
            f"**{r['valid_reward']:.3f}** | {r['valid_C']:.3f} | "
            f"{r['valid_P']:.3f} | {r['valid_S']:.3f} | "
            f"{r['random_reward']:.3f} | {r['first_reward']:.3f} |")
    lines += [
        "",
        "Hardware: 1x TPU v5e chip (training + eval); instances sampled",
        "on device; training is the single fused XLA step of",
        "`train/reinforce.py` (sample -> rollout -> REINFORCE -> Adam).",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
