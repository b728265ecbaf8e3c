"""Mixed 2D/3D batch sampling (SPEC.md §9, BASELINE.json config 5: "mixed
2D/3D batch"): flat (depth-1) instances interleaved with 3D instances inside
one 3D multi-container env, sampled on device, bit-exact vs the oracle, and
eligible for the fused Pallas rollout kernel.
"""

import numpy as np
import jax
import pytest

from tapnet_tpu.config import CONFIGS
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_batch_mixed
from tapnet_tpu.oracle import oracle_rollout
from tapnet_tpu.oracle.generator import generate_instance, mix_flat

CFG = CONFIGS["multi-container"]


def test_mixed_batch_sampler_matches_oracle():
    B = 12
    key = jax.random.key(21)
    batch = sample_batch_mixed(key, B, CFG, p2d=0.5)
    keys = jax.random.split(key, B)
    n_flat = 0
    for i in range(B):
        flat = mix_flat(keys[i], 0.5)
        n_flat += int(flat)
        ref = generate_instance(keys[i], CFG, flat=flat)
        for field in ("dims", "pos0", "n_total", "up", "rot"):
            assert np.array_equal(np.asarray(getattr(batch, field)[i]),
                                  np.asarray(getattr(ref, field))), (i, field)
        got = jax.tree.map(lambda x: np.asarray(x[i]), batch)
        nt = int(got.n_total)
        if flat:  # every real block is 2D: d = 1, y0 = 0
            assert (got.dims[:nt, 1] == 1).all()
            assert (got.pos0[:nt, 1] == 0).all()
        # volume conservation: splits partition the initial container
        depth = 1 if flat else CFG.container_depth
        vol = int(np.prod(got.dims[:nt].astype(np.int64), axis=1).sum())
        assert vol == CFG.container_width * depth * CFG.container_height
    assert 0 < n_flat < B  # p2d=0.5 with 12 draws: both kinds present


def test_mixed_batch_rollout_parity_and_fused():
    B = 8
    key = jax.random.key(33)
    batch = sample_batch_mixed(key, B, CFG, p2d=0.5)
    keys = jax.random.split(key, B)
    s_j, a_j, r_j = E.rollout_batch(batch, keys, CFG, policy="random")
    assert bool(np.asarray(s_j.packed).all())
    for i in range(B):
        inst = jax.tree.map(lambda x: np.asarray(x[i]), batch)
        env, actions, _ = oracle_rollout(inst, CFG, policy="random",
                                         key=keys[i])
        assert np.array_equal(actions, np.asarray(a_j[i]))
        assert np.array_equal(env.state.heightmap,
                              np.asarray(s_j.heightmap[i]))

    from tapnet_tpu.ops.pallas_env import eligible, fused_rollout_batch
    assert eligible(CFG)
    s_f, a_f, r_f = fused_rollout_batch(batch, keys, CFG, policy="random",
                                        interpret=True)
    assert np.array_equal(np.asarray(a_j), np.asarray(a_f))
    assert np.array_equal(np.asarray(s_j.heightmap), np.asarray(s_f.heightmap))
    np.testing.assert_array_equal(np.asarray(r_j), np.asarray(r_f))


def test_mixed_batch_validation():
    with pytest.raises(ValueError, match="3D"):
        sample_batch_mixed(jax.random.key(0), 4, CONFIGS["2d-basic"])
    import dataclasses
    big = dataclasses.replace(CONFIGS["multi-container"], num_blocks=65,
                              min_blocks=65)
    with pytest.raises(ValueError, match="depth-1"):
        sample_batch_mixed(jax.random.key(0), 4, big)


def test_mixed_p2d_extremes():
    B = 6
    key = jax.random.key(4)
    all3d = sample_batch_mixed(key, B, CFG, p2d=0.0)
    allfl = sample_batch_mixed(key, B, CFG, p2d=1.0)
    for i in range(B):
        nt = int(np.asarray(all3d.n_total[i]))
        assert (np.asarray(allfl.dims)[i, :int(np.asarray(allfl.n_total[i])), 1]
                == 1).all()
        # p2d=0 must reproduce plain sample_batch exactly
    from tapnet_tpu.env.sampler import sample_batch
    plain = sample_batch(key, B, CFG)
    assert np.array_equal(np.asarray(plain.dims), np.asarray(all3d.dims))


def test_capped_multi_container_forces_spillover():
    """Driver config 6 (VERDICT r3 item 4): per-container capacity
    6*8*8 = 384 < the 512-volume instance, so the container axis provably
    matters — any rollout that places more than 384 volume MUST use
    container 1, and heuristic rollouts route a substantial fraction of
    placements there. The cap itself is never violated."""
    cfg = CONFIGS["multi-container-capped"]
    cap_volume = cfg.target_width * cfg.target_depth * cfg.target_height
    B = 32
    key = jax.random.key(5)
    from tapnet_tpu.env.sampler import sample_batch
    batch = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    states, actions, _ = E.rollout_batch(batch, keys, cfg, policy="first")

    assert int(states.heightmap.max()) <= cfg.target_height
    cont = np.asarray(states.placements[:, :, 0])          # [B, N]
    dims = np.asarray(batch.dims)
    placed_vol = np.where(cont >= 0, dims.prod(axis=2), 0)  # [B, N]
    total = placed_vol.sum(axis=1)
    spilled = (np.where(cont == 1, placed_vol, 0).sum(axis=1) > 0)
    # provable spillover: volume beyond one container's capacity => c1 used
    assert np.all(spilled[total > cap_volume])
    assert (total > cap_volume).any()  # the bound actually binds in-sample
    # and the axis is exercised broadly, not marginally
    frac1 = (cont == 1).sum() / max((cont >= 0).sum(), 1)
    assert frac1 > 0.10
