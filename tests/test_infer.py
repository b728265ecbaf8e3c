"""Serving surface: pack() -> executable PackingPlan."""

import numpy as np
import jax

from tapnet_tpu import CONFIGS, pack
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.models import init_params
from tapnet_tpu.oracle.env import OracleEnv


def test_pack_heuristic_plan_replays_in_oracle():
    """Plans must be executable: replay each step in the CPU oracle env."""
    cfg = CONFIGS["2d-rot"]
    B = 6
    key = jax.random.key(3)
    instances = sample_batch(key, B, cfg)
    plan = pack(instances, cfg, policy="random", key=key)
    assert len(plan) == B
    for i in range(B):
        assert plan.complete(i)
        inst = jax.tree.map(lambda x: np.asarray(x[i]), instances)
        env = OracleEnv(inst, cfg)
        for s in plan.steps(i):
            a = cfg.compose_action(s.block, s.rotation, s.container)
            assert env.action_mask()[a]
            env.step(a)
            # the oracle lands the block exactly where the plan says
            assert tuple(env.state.placements[s.block][:5]) == (
                s.container, s.rotation, s.x, s.y, s.z)
        assert env.done()
        assert np.array_equal(env.state.heightmap, plan.heightmap(i))


def test_pack_learned_policy_greedy():
    cfg = CONFIGS["3d-basic"]
    B = 4
    key = jax.random.key(1)
    instances = sample_batch(key, B, cfg)
    params = init_params(key, cfg, hidden=32)["actor"]
    plan = pack(instances, cfg, actor_params=params, hidden=32,
                policy="greedy")
    assert all(plan.complete(i) for i in range(B))
    assert np.isfinite(plan.rewards).all()
    # greedy is deterministic
    plan2 = pack(instances, cfg, actor_params=params, hidden=32,
                 policy="greedy")
    assert np.array_equal(plan.actions, plan2.actions)
