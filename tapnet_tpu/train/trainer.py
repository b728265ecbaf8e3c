"""Training loop: epochs of fused train steps + greedy validation.

Reference stack (SURVEY.md §3.1): epoch loop over a DataLoader with
per-instance env stepping. Here an epoch is `steps_per_epoch` invocations of
the single fused XLA train step (instances sampled on device), followed by a
greedy-decode validation on a fixed held-out key and a checkpoint write.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.train import checkpoints as ckpt
from tapnet_tpu.train.metrics import MetricsLogger
from tapnet_tpu.train.reinforce import (TrainState, init_train_state,
                                        make_train_step)
from tapnet_tpu.train.rollout import policy_rollout_batch


@dataclasses.dataclass(frozen=True)
class TrainLoopConfig:
    epochs: int = 10
    steps_per_epoch: int = 100
    batch: int = 128
    valid_batch: int = 256
    hidden: int = 128
    lr: float = 5e-4
    clip: float = 2.0
    temperature: float = 1.0
    seed: int = 0
    valid_seed: int = 10_000
    ckpt_dir: Optional[str] = None
    metrics_path: Optional[str] = None


def evaluate(params, cfg: TAPConfig, loop: TrainLoopConfig,
             baselines: bool = False):
    """Greedy-decode validation on a fixed held-out instance stream.

    With baselines=True also rolls the reference-style fixed policies
    ("random" uniform-feasible and "first" lowest-index) on the SAME
    instances, so learned-vs-heuristic packing quality is directly
    comparable (the reference validates the same way, SURVEY.md §3.2).
    """
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env.sampler import sample_batch

    key = jax.random.key(loop.valid_seed)
    instances = sample_batch(key, loop.valid_batch, cfg)
    keys = jax.random.split(key, loop.valid_batch)
    states, _, rewards, _ = policy_rollout_batch(
        params["actor"], instances, keys, cfg, loop.hidden, greedy=True)
    vol, dc, dp, sn, sd = jax.vmap(
        lambda s, i: E.reward_terms(s, i, cfg))(states, instances)
    f = lambda n, d: (n / jnp.maximum(d, 1)).astype(jnp.float32).mean()
    out = {"valid_reward": rewards.mean(), "valid_C": f(vol, dc),
           "valid_P": f(vol, dp), "valid_S": f(sn, sd)}
    if baselines:
        for policy in ("random", "first"):
            _, _, r = E.rollout_batch(instances, keys, cfg, policy=policy)
            out[f"{policy}_reward"] = r.mean()
    return out


def train(cfg: TAPConfig, loop: TrainLoopConfig, resume: bool = True,
          mesh=None) -> TrainState:
    logger = MetricsLogger(loop.metrics_path)
    ts = init_train_state(jax.random.key(loop.seed), cfg, loop.hidden,
                          loop.lr, loop.clip)
    if resume and loop.ckpt_dir:
        path = ckpt.latest_checkpoint(loop.ckpt_dir)
        if path:
            ts = ckpt.restore_checkpoint(path, ts)
            logger.log(int(ts.step), {}, event="resumed", ckpt=path)
    if mesh is not None:
        from tapnet_tpu.parallel.mesh import put_replicated
        ts = put_replicated(ts, mesh)

    train_step = make_train_step(cfg, loop.batch, loop.hidden, loop.lr,
                                 loop.clip, loop.temperature, mesh=mesh)
    total = loop.epochs * loop.steps_per_epoch
    while int(ts.step) < total:
        epoch = int(ts.step) // loop.steps_per_epoch
        for _ in range(loop.steps_per_epoch - int(ts.step) % loop.steps_per_epoch):
            ts, metrics = train_step(ts)
        logger.log(int(ts.step), metrics, epoch=epoch,
                   **{k: v for k, v in evaluate(ts.params, cfg, loop).items()})
        if loop.ckpt_dir:
            ckpt.save_checkpoint(loop.ckpt_dir, ts)
    logger.close()
    return ts
