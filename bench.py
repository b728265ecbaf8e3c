"""Headline benchmark: env-steps/s/chip, 2D TAP, batch 4096 (BASELINE.json).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference's own mechanism — the per-instance
Python step loop (BASELINE.json names it; our CPU oracle implements it
exactly) — measured live on this host, since the empty reference mount has no
published numbers (BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure_oracle_steps_per_s(cfg, n_instances: int = 8) -> float:
    """Reference mechanism: per-instance Python loop (steps/s, one process)."""
    from tapnet_tpu.oracle import generate_instance, oracle_rollout

    # Pin the oracle's eager RNG ops to host CPU: the reference ran on-host,
    # and routing its tiny ops through the TPU tunnel would inflate vs_baseline.
    with jax.default_device(jax.devices("cpu")[0]):
        key = jax.random.key(0)
        keys = jax.random.split(key, n_instances)
        instances = [generate_instance(k, cfg) for k in keys]
        t0 = time.perf_counter()
        steps = 0
        for inst, k in zip(instances, keys):
            _, actions, _ = oracle_rollout(inst, cfg, policy="random", key=k)
            steps += int((np.asarray(actions) >= 0).sum())
        return steps / (time.perf_counter() - t0)


def measure_env_steps_per_s(cfg, batch: int, iters: int = 10) -> float:
    """Batched jitted rollouts on the default backend (TPU when present)."""
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env import sample_batch

    key = jax.random.key(0)
    batch_inst = sample_batch(key, batch, cfg)
    keys = jax.random.split(key, batch)
    jax.block_until_ready(batch_inst)

    # warmup/compile
    out = E.rollout_batch(batch_inst, keys, cfg, policy="random")
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(iters):
        keys = jax.random.split(jax.random.key(i + 1), batch)
        out = E.rollout_batch(batch_inst, keys, cfg, policy="random")
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    # every real block is packed once per rollout
    steps_per_rollout = int(np.asarray(batch_inst.n_total).sum())
    return steps_per_rollout * iters / dt


def main():
    from tapnet_tpu.config import CONFIGS

    cfg = CONFIGS["2d-basic"]
    batch = 4096
    value = measure_env_steps_per_s(cfg, batch)
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
