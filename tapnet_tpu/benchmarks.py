"""Throughput measurement utilities (BASELINE.json metric machinery).

Used by the repo-root bench.py (driver entry) and `python -m tapnet_tpu.cli
bench`. The baseline measurement reproduces the reference's own mechanism —
the per-instance Python step loop — live on this host (BASELINE.md: the
empty reference mount has no published numbers).
"""

from __future__ import annotations

import time

import jax
import numpy as np


def measure_oracle_steps_per_s(cfg, n_instances: int = 8) -> float:
    """Reference mechanism: per-instance Python loop (steps/s, one process).

    Eager RNG ops are pinned to host CPU so TPU-tunnel latency doesn't
    unfairly inflate the speedup reported against this baseline.
    """
    from tapnet_tpu.oracle import generate_instance, oracle_rollout

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


def measure_train_steps_per_s(cfg, batch: int = 4096, hidden: int = 128,
                              iters: int = 10) -> float:
    """Learned-policy REINFORCE train step: env-steps/s/chip.

    This is the learner-facing number (BASELINE.json north star: env batches
    "feeding a sharded learner"): one full sample->rollout->replay->grad->
    Adam step per iteration, counted as batch * num_blocks env steps.
    Any batch fits: the replay pass auto-chunks the decode-step axis with
    rematerialization (train.rollout.replay_logp_sum)."""
    from tapnet_tpu.train.reinforce import init_train_state, make_train_step

    ts = init_train_state(jax.random.key(0), cfg, hidden=hidden)
    step = make_train_step(cfg, batch=batch, hidden=hidden)
    ts, m = step(ts)
    jax.block_until_ready(m)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, m = step(ts)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return iters * batch * cfg.num_blocks / dt


def measure_env_steps_per_s(cfg, batch: int, iters: int = 10,
                            fused: bool = None) -> float:
    """Batched rollouts on the default backend (TPU when present).

    Uses the fused whole-rollout Pallas kernel when the config is eligible
    (bit-exact vs the general path — parity-tested); pass fused=False to
    measure the general jit/vmap path.
    """
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env import sample_batch
    from tapnet_tpu.ops.pallas_env import eligible, fused_rollout_batch

    if fused is None:
        fused = eligible(cfg) and jax.default_backend() == "tpu"
    run = (lambda b, k: fused_rollout_batch(b, k, cfg, policy="random")) \
        if fused else \
        (lambda b, k: E.rollout_batch(b, k, cfg, policy="random"))

    key = jax.random.key(0)
    batch_inst = sample_batch(key, batch, cfg)
    keys = jax.random.split(key, batch)
    jax.block_until_ready(batch_inst)

    jax.block_until_ready(run(batch_inst, keys))  # compile

    # pre-derive per-iteration key batches so host-side key construction is
    # not measured; dispatches pipeline, block once at the end
    key_batches = [jax.random.split(jax.random.key(i + 1), batch)
                   for i in range(iters)]
    jax.block_until_ready(key_batches)
    t0 = time.perf_counter()
    for kb in key_batches:
        out = run(batch_inst, kb)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    steps_per_rollout = int(np.asarray(batch_inst.n_total).sum())
    return steps_per_rollout * iters / dt
