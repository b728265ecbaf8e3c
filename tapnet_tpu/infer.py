"""Inference / serving surface: instances in, packing plans out.

The reference's "test" task rolls the trained net greedily and writes the
resulting packing (SURVEY.md §3.2); there is no standalone serving API. This
module provides one: `pack()` turns a batch of instances into executable
transport-and-pack plans in a single device program — learned policy (greedy
or sampled pointer decode) or fixed heuristic (via the fused whole-rollout
Pallas kernel when the config is eligible).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.types import EnvState, Instance


@dataclasses.dataclass(frozen=True)
class PackingStep:
    """One robot operation: which block, how, where it lands."""

    order: int        # 0-based transport order
    block: int        # block id in the instance
    rotation: int     # rotation state (0 = as-is)
    container: int    # target container index
    x: int
    y: int            # depth offset (0 in 2D)
    z: int            # landing height
    stable: bool


class PackingPlan:
    """Batched packing result with per-instance step extraction."""

    def __init__(self, states: EnvState, actions, rewards, cfg: TAPConfig):
        self.states = states
        self.actions = np.asarray(actions)
        self.rewards = np.asarray(rewards)
        self.cfg = cfg

    def __len__(self) -> int:
        return self.actions.shape[0]

    def steps(self, i: int) -> List[PackingStep]:
        """The executable transport sequence for instance i."""
        cfg = self.cfg
        placements = np.asarray(self.states.placements[i])
        out: List[PackingStep] = []
        for order, a in enumerate(self.actions[i]):
            if a < 0:
                continue
            b, r, c = cfg.decompose_action(int(a))
            cc, rr, x, y, z, stable = (int(v) for v in placements[b])
            out.append(PackingStep(order=len(out), block=b, rotation=rr,
                                   container=cc, x=x, y=y, z=z,
                                   stable=bool(stable)))
        return out

    def complete(self, i: int) -> bool:
        """Did every real block of instance i get packed?

        (Padding blocks are pre-packed at reset, so all-packed == complete.)
        """
        return bool(np.asarray(self.states.packed[i]).all())

    def heightmap(self, i: int) -> np.ndarray:
        return np.asarray(self.states.heightmap[i])


def pack(instances: Instance, cfg: TAPConfig,
         actor_params: Optional[Any] = None, hidden: int = 128,
         policy: str = "greedy", key=None, temperature: float = 1.0,
         prefer_fused: Optional[bool] = None,
         n_samples: int = 16) -> PackingPlan:
    """Pack a batch of instances; returns a PackingPlan.

    policy: "greedy" / "sample" use the learned actor (actor_params
    required); "best" draws `n_samples` sampled decodes per instance in one
    batched program and keeps each instance's best-reward plan (a TPU-native
    serving upgrade over the reference's greedy-only test path); "first" /
    "random" are the fixed heuristics. Heuristic rollouts use the fused
    Pallas kernel on TPU for eligible configs.
    """
    B = instances.dims.shape[0]
    if key is None:
        key = jax.random.key(0)
    keys = jax.random.split(key, B)

    if policy == "best":
        if actor_params is None:
            raise ValueError("policy='best' needs actor_params")
        from tapnet_tpu.train.rollout import policy_rollout_best_of
        states, actions, rewards = policy_rollout_best_of(
            actor_params, instances, key, cfg, hidden,
            n_samples=n_samples, temperature=temperature)
        return PackingPlan(states, actions, rewards, cfg)
    if policy in ("greedy", "sample"):
        if actor_params is None:
            raise ValueError(f"policy={policy!r} needs actor_params")
        from tapnet_tpu.train.rollout import policy_rollout_batch
        states, actions, rewards, _ = policy_rollout_batch(
            actor_params, instances, keys, cfg, hidden,
            greedy=(policy == "greedy"), temperature=temperature)
    elif policy in ("first", "random"):
        from tapnet_tpu.env import core as E
        from tapnet_tpu.ops.pallas_env import eligible, fused_rollout_batch
        if prefer_fused is None:
            prefer_fused = jax.default_backend() == "tpu"
        if prefer_fused and eligible(cfg):
            states, actions, rewards = fused_rollout_batch(
                instances, keys, cfg, policy=policy)
        else:
            states, actions, rewards = E.rollout_batch(
                instances, keys, cfg, policy=policy)
    else:
        raise ValueError(policy)
    return PackingPlan(states, actions, rewards, cfg)
