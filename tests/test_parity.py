"""Bit-exactness parity: batched JAX env vs CPU oracle (BASELINE.json's
"trajectories and returns matching the reference CPU environment exactly
under fixed seed", across all 5 driver configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tapnet_tpu.config import CONFIGS
from tapnet_tpu.env import core as jenv
from tapnet_tpu.env.sampler import sample_instance, sample_batch
from tapnet_tpu.oracle import OracleEnv, generate_instance, oracle_rollout

SEEDS = [0, 1, 2, 3, 11, 12, 13, 14]


def to_np(tree):
    return jax.tree.map(np.asarray, tree)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_sampler_parity(name):
    """Same key -> bit-identical instance from oracle and on-device sampler."""
    cfg = CONFIGS[name]
    jit_sample = jax.jit(sample_instance, static_argnames="cfg")
    for seed in SEEDS[:4]:
        key = jax.random.key(seed)
        a = generate_instance(key, cfg)
        b = to_np(jit_sample(key, cfg=cfg))
        for field, x, y in zip(a._fields, a, b):
            assert np.array_equal(np.asarray(x), y), (name, seed, field)


@pytest.mark.parametrize("name", list(CONFIGS))
@pytest.mark.parametrize("policy", ["first", "random"])
def test_rollout_parity(name, policy):
    """Fixed-policy rollouts agree exactly: actions, heightmaps, placements,
    packed flags, integer reward terms."""
    cfg = CONFIGS[name]
    for seed in SEEDS[:3]:
        key = jax.random.key(seed)
        inst_o = generate_instance(key, cfg)
        env, actions_o, _ = oracle_rollout(inst_o, cfg, policy=policy, key=key)

        inst_j = sample_instance(key, cfg)
        state, actions_j, rew = jenv.rollout(inst_j, key, cfg, policy=policy)
        state, actions_j = to_np(state), np.asarray(actions_j)

        assert np.array_equal(actions_o, actions_j), (name, seed)
        assert np.array_equal(env.state.heightmap, state.heightmap)
        assert np.array_equal(env.state.packed, state.packed)
        assert np.array_equal(env.state.placements, state.placements)
        assert env.reward_ints() == tuple(
            int(v) for v in jenv.reward_terms(
                jax.tree.map(jnp.asarray, state._replace()), inst_j, cfg))
        assert abs(env.reward() - float(rew)) < 1e-5


@pytest.mark.parametrize("name", ["2d-rot", "multi-container"])
def test_stepwise_mask_parity(name):
    """Per-step action masks agree exactly (not just chosen actions)."""
    cfg = CONFIGS[name]
    key = jax.random.key(3)
    inst_o = generate_instance(key, cfg)
    inst_j = sample_instance(key, cfg)
    env = OracleEnv(inst_o, cfg)
    state = jenv.reset(inst_j, cfg)
    jit_mask = jax.jit(jenv.action_mask, static_argnames="cfg")
    jit_step = jax.jit(jenv.step, static_argnames="cfg")
    for t in range(cfg.num_blocks):
        mask_o = env.action_mask()
        mask_j = np.asarray(jit_mask(state, inst_j, cfg=cfg))
        assert np.array_equal(mask_o, mask_j), t
        if not mask_o.any():
            break
        a = int(np.nonzero(mask_o)[0][0])
        env.step(a)
        state = jit_step(state, jnp.int32(a), inst_j, cfg=cfg)
        assert np.array_equal(env.state.heightmap, np.asarray(state.heightmap)), t


def test_batch_rollout_matches_loop():
    """vmapped batch rollout == per-instance rollouts (same per-instance keys)."""
    cfg = CONFIGS["2d-rot"]
    key = jax.random.key(9)
    B = 8
    keys = jax.random.split(key, B)
    batch = sample_batch(key, B, cfg)
    states, actions, rewards = jenv.rollout_batch(batch, keys, cfg, policy="random")
    for i in range(B):
        inst_i = jax.tree.map(lambda x: x[i], batch)
        s, a, r = jenv.rollout(inst_i, keys[i], cfg, policy="random")
        assert np.array_equal(np.asarray(a), np.asarray(actions[i]))
        assert np.array_equal(np.asarray(s.heightmap),
                              np.asarray(states.heightmap[i]))
        assert float(r) == float(rewards[i])


def test_finite_height_cap_parity():
    """Finite target height exercises the per-action placeability scan."""
    from tapnet_tpu.config import TAPConfig
    cfg = TAPConfig(target_height=4, allow_rot=True)
    for seed in SEEDS[:3]:
        key = jax.random.key(seed)
        inst_o = generate_instance(key, cfg)
        env, actions_o, _ = oracle_rollout(inst_o, cfg, policy="random", key=key)
        inst_j = sample_instance(key, cfg)
        state, actions_j, _ = jenv.rollout(inst_j, key, cfg, policy="random")
        assert np.array_equal(actions_o, np.asarray(actions_j)), seed
        assert np.array_equal(env.state.heightmap, np.asarray(state.heightmap))
        assert np.array_equal(env.state.placements, np.asarray(state.placements))
