"""Fused whole-rollout Pallas kernel: bit-exact vs the general env path.

Also verified bit-equal on real TPU hardware (both policies, both 2D
configs); CPU tests run the kernel in interpreter mode.
"""

import numpy as np
import jax
import pytest

from tapnet_tpu.config import CONFIGS, TAPConfig
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.ops.pallas_env import eligible, fused_rollout_batch


@pytest.mark.parametrize("name", ["2d-basic", "2d-rot"])
@pytest.mark.parametrize("policy", ["first", "random"])
def test_fused_rollout_parity(name, policy):
    cfg = CONFIGS[name]
    assert eligible(cfg)
    B = 40  # non-multiple of the 128 tile: exercises padding lanes
    key = jax.random.key(0)
    batch = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    s_ref, a_ref, r_ref = E.rollout_batch(batch, keys, cfg, policy=policy)
    s_f, a_f, r_f = fused_rollout_batch(batch, keys, cfg, policy=policy,
                                        interpret=True)
    assert np.array_equal(np.asarray(a_ref), np.asarray(a_f))
    assert np.array_equal(np.asarray(s_ref.heightmap), np.asarray(s_f.heightmap))
    assert np.array_equal(np.asarray(s_ref.placements), np.asarray(s_f.placements))
    assert np.array_equal(np.asarray(s_ref.packed), np.asarray(s_f.packed))
    assert np.array_equal(np.asarray(r_ref), np.asarray(r_f))


def test_fused_hard_variant_parity():
    cfg = TAPConfig(reward_type="C+P+S-lb-hard", allow_rot=True)
    assert eligible(cfg)
    B = 24
    key = jax.random.key(7)
    batch = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    s_ref, a_ref, r_ref = E.rollout_batch(batch, keys, cfg, policy="random")
    s_f, a_f, r_f = fused_rollout_batch(batch, keys, cfg, policy="random",
                                        interpret=True)
    assert np.array_equal(np.asarray(a_ref), np.asarray(a_f))
    assert np.array_equal(np.asarray(s_ref.heightmap), np.asarray(s_f.heightmap))
    assert np.array_equal(np.asarray(r_ref), np.asarray(r_f))


def test_eligibility_gate():
    assert not eligible(CONFIGS["3d-basic"])
    assert not eligible(CONFIGS["2d-rolling"])
    assert not eligible(CONFIGS["multi-container"])
    with pytest.raises(AssertionError):
        fused_rollout_batch(
            sample_batch(jax.random.key(0), 4, CONFIGS["3d-basic"]),
            jax.random.split(jax.random.key(0), 4), CONFIGS["3d-basic"],
            interpret=True)
