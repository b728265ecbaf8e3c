"""Native C++ env: differential-tested against the JAX env (and thus the
oracle and Pallas kernels, which have their own parity tests)."""

import numpy as np
import jax
import pytest

from tapnet_tpu.config import CONFIGS, TAPConfig
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_batch

native = pytest.importorskip("tapnet_tpu.native")
if not native.is_available():
    pytest.skip("no C++ toolchain", allow_module_level=True)


def _rbits(keys, N):
    def draws(key):
        return jax.numpy.stack([
            jax.random.bits(jax.random.fold_in(key, t), dtype=jax.numpy.uint32)
            for t in range(N)])
    return np.asarray(jax.vmap(draws)(keys))


# "first" is a degenerate draw of the same selection code path; random covers
# it and more, so the first-fit points run under -m slow
@pytest.mark.parametrize("name,policy", [
    pytest.param(n, pol,
                 marks=([pytest.mark.slow] if pol == "first" else []))
    for n in CONFIGS for pol in ("first", "random")])
def test_native_matches_jax_env(name, policy):
    cfg = CONFIGS[name]
    B = 12
    key = jax.random.key(17)
    batch = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    s_ref, a_ref, _ = E.rollout_batch(batch, keys, cfg, policy=policy)
    rbits = _rbits(keys, cfg.num_blocks) if policy == "random" else None
    s_n, a_n, terms = native.rollout_batch(batch, cfg, policy=policy,
                                           rbits=rbits)
    assert np.array_equal(np.asarray(a_ref), a_n)
    assert np.array_equal(np.asarray(s_ref.heightmap), s_n.heightmap)
    assert np.array_equal(np.asarray(s_ref.placements), s_n.placements)
    assert np.array_equal(np.asarray(s_ref.packed), s_n.packed)
    ref_terms = np.stack([np.asarray(x) for x in jax.vmap(
        lambda s, i: E.reward_terms(s, i, cfg))(s_ref, batch)], axis=1)
    assert np.array_equal(ref_terms.astype(np.int32), terms)


def test_native_hard_variant_and_finite_height():
    cfg = TAPConfig(reward_type="C+P-lb-hard", allow_rot=True,
                    target_height=6, container_height=12)
    B = 16
    key = jax.random.key(23)
    batch = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    s_ref, a_ref, _ = E.rollout_batch(batch, keys, cfg, policy="random")
    s_n, a_n, _ = native.rollout_batch(
        batch, cfg, policy="random", rbits=_rbits(keys, cfg.num_blocks))
    assert np.array_equal(np.asarray(a_ref), a_n)
    assert np.array_equal(np.asarray(s_ref.heightmap), s_n.heightmap)
    assert s_n.heightmap.max() <= 6


def test_native_replay_validates_plans():
    """Replaying a valid trajectory reproduces it; corrupting it is caught."""
    cfg = CONFIGS["2d-rot"]
    B = 6
    key = jax.random.key(5)
    batch = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    s_ref, a_ref, _ = E.rollout_batch(batch, keys, cfg, policy="random")
    a_ref = np.asarray(a_ref)

    s_n, a_n, _ = native.rollout_batch(batch, cfg, policy="replay",
                                       actions=a_ref)
    assert np.array_equal(a_ref, a_n)
    assert np.array_equal(np.asarray(s_ref.heightmap), s_n.heightmap)

    # corrupt instance 0: repeat its first action (re-packing is infeasible)
    bad = a_ref.copy()
    bad[0, 1] = bad[0, 0]
    _, a_bad, _ = native.rollout_batch(batch, cfg, policy="replay",
                                       actions=bad)
    assert a_bad[0, 1] == -1  # flagged as no-op
    assert np.array_equal(a_bad[1:], a_ref[1:])  # others untouched
