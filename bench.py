"""Headline benchmark: env-steps/s/chip, 2D TAP, batch 4096 (BASELINE.json).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference's own mechanism — the per-instance
Python step loop (BASELINE.json names it; our CPU oracle implements it
exactly) — measured live on this host, since the empty reference mount has no
published numbers (BASELINE.md).
"""

import json
import sys


def main():
    from tapnet_tpu.config import CONFIGS
    from tapnet_tpu.benchmarks import (measure_env_steps_per_s,
                                       measure_oracle_steps_per_s)

    cfg = CONFIGS["2d-basic"]
    value = measure_env_steps_per_s(cfg, batch=4096, iters=200)
    baseline = measure_oracle_steps_per_s(cfg)
    print(json.dumps({
        "metric": "env-steps/s/chip (2D TAP, batch 4096, full mask+policy+step rollout)",
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(value / baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
