"""Headline benchmark: env-steps/s/chip, 2D TAP, batch 4096 (BASELINE.json).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} (plus a
`train_env_steps_per_s` field for the learner-facing number — the
policy-rollout REINFORCE train step measured on the same chip).

vs_baseline compares against the reference's own mechanism — the per-instance
Python step loop (BASELINE.json names it; our CPU oracle implements it
exactly) — measured live on this host, since the empty reference mount has no
published numbers (BASELINE.md).

`python bench.py --detail` additionally writes BENCH_DETAIL.json with
per-config rows (heuristic-fused / general-path / train-step env-steps/s) so
every throughput number in the README has a committed reproduction.
"""

import argparse
import json
import os
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--detail", action="store_true",
                        help="also write per-config BENCH_DETAIL.json")
    parser.add_argument("--configs", default=None,
                        help="comma-separated config subset for --detail "
                             "(merges into an existing BENCH_DETAIL.json)")
    parser.add_argument("--skip-headline", action="store_true",
                        help="with --detail: skip the headline measurement")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tapnet_tpu.config import CONFIGS
    from tapnet_tpu.benchmarks import (measure_env_steps_per_s,
                                       measure_oracle_steps_per_s,
                                       measure_train_steps_per_s)

    cfg = CONFIGS["2d-basic"]
    baseline = measure_oracle_steps_per_s(cfg)
    if not (args.detail and args.skip_headline):
        value = measure_env_steps_per_s(cfg, batch=4096, iters=200)
        train_value = measure_train_steps_per_s(cfg, batch=4096, iters=20)
        print(json.dumps({
            "metric": "env-steps/s/chip (2D TAP, batch 4096, full mask+policy+step rollout)",
            "value": round(value, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(value / baseline, 2),
            "train_env_steps_per_s": round(train_value, 1),
        }))

    if args.detail:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json")
        detail = {"host_oracle_steps_per_s": round(baseline, 1), "configs": {}}
        if args.configs and os.path.exists(out):
            with open(out) as f:
                detail = json.load(f)
            detail["host_oracle_steps_per_s"] = round(baseline, 1)
        subset = (set(args.configs.split(",")) if args.configs
                  else set(CONFIGS))
        def flush():
            with open(out, "w") as f:
                json.dump(detail, f, indent=2)
                f.write("\n")

        for name, c in CONFIGS.items():
            if name not in subset:
                continue
            from tapnet_tpu.ops.pallas_env import eligible
            row = detail["configs"].setdefault(name, {})
            if eligible(c) and jax.default_backend() == "tpu":
                row["heuristic_fused"] = round(
                    measure_env_steps_per_s(c, batch=4096, iters=100,
                                            fused=True), 1)
                flush()
            row["general_path"] = round(
                measure_env_steps_per_s(c, batch=4096, iters=50,
                                        fused=False), 1)
            flush()
            row["train_step"] = round(
                measure_train_steps_per_s(c, batch=4096, iters=10), 1)
            flush()
            print(f"{name}: {row}", file=sys.stderr)
        print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
