"""Pallas fused reward kernel: bit-exact parity vs the jnp composition
(SURVEY.md §7 Phase 3). On CPU the kernel runs in interpreter mode; the
TPU path is exercised by bench.py and was verified bit-equal on hardware."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tapnet_tpu.config import CONFIGS
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.ops import (batched_reward, batched_reward_terms,
                            heightmap_reductions)

INTERP = dict(interpret=True)  # CPU test mode


@pytest.mark.parametrize("shape", [(4, 1, 10, 1), (16, 2, 8, 8), (3, 3, 5, 7)])
def test_reductions_match_jnp(shape):
    x = jax.random.randint(jax.random.key(0), shape, 0, 100, dtype=jnp.int32)
    mx, sm = heightmap_reductions(x, **INTERP)
    assert np.array_equal(np.asarray(mx), np.asarray(x.max(axis=(2, 3))))
    assert np.array_equal(np.asarray(sm), np.asarray(x.sum(axis=(2, 3))))


@pytest.mark.parametrize("name", ["2d-basic", "3d-basic", "multi-container"])
def test_reward_terms_parity(name):
    cfg = CONFIGS[name]
    B = 16
    key = jax.random.key(0)
    batch = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    states, _, rewards = E.rollout_batch(batch, keys, cfg, policy="random")
    ref = jax.vmap(lambda s, i: jnp.stack(E.reward_terms(s, i, cfg)))(
        states, batch)
    out = jnp.stack(batched_reward_terms(
        states.heightmap, states.placements, batch.dims, **INTERP), axis=1)
    assert np.array_equal(np.asarray(ref), np.asarray(out))
    r = batched_reward(states.heightmap, states.placements, batch.dims,
                       cfg.reward_terms, **INTERP)
    assert np.array_equal(np.asarray(r), np.asarray(rewards))


def test_empty_heightmaps():
    """Nothing packed: used-container masking yields zero denominators."""
    hm = jnp.zeros((4, 2, 8, 8), jnp.int32)
    placements = jnp.full((4, 10, 6), -1, jnp.int32)
    dims = jnp.ones((4, 10, 3), jnp.int32)
    vol, dc, dp, sn, sd = batched_reward_terms(hm, placements, dims, **INTERP)
    assert (np.asarray(vol) == 0).all() and (np.asarray(dc) == 0).all()
    r = batched_reward(hm, placements, dims, ("C", "P", "S"), **INTERP)
    assert (np.asarray(r) == 0).all()
