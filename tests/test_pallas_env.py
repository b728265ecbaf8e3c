"""Fused whole-rollout Pallas kernels: bit-exact vs the general env path.

Also verified bit-equal on real TPU hardware (both policies, all eligible
configs); CPU tests run the kernels in interpreter mode.
"""

import numpy as np
import jax
import pytest

from tapnet_tpu.config import CONFIGS, TAPConfig
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.ops.pallas_env import eligible, fused_rollout_batch


def _assert_rollout_equal(cfg, B, policy, seed=0):
    key = jax.random.key(seed)
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


@pytest.mark.parametrize("name", ["2d-basic", "2d-rot"])
@pytest.mark.parametrize("policy", ["first", "random"])
def test_fused_rollout_parity_2d(name, policy):
    cfg = CONFIGS[name]
    assert eligible(cfg)
    # B=40: non-multiple of the 128 tile exercises padding lanes
    _assert_rollout_equal(cfg, B=40, policy=policy)


@pytest.mark.parametrize("name", ["3d-basic", "multi-container"])
@pytest.mark.parametrize("policy", ["first", "random"])
def test_fused_rollout_parity_3d(name, policy):
    cfg = CONFIGS[name]
    assert eligible(cfg)
    _assert_rollout_equal(cfg, B=24, policy=policy, seed=3)


@pytest.mark.slow  # N=50 interpret-mode kernel; hardware gate: PARITY_TPU.json
def test_fused_rollout_parity_rolling_window():
    cfg = CONFIGS["2d-rolling"]
    assert eligible(cfg)
    _assert_rollout_equal(cfg, B=12, policy="random", seed=5)


@pytest.mark.slow  # see above
def test_fused_rolling_window_3d():
    cfg = TAPConfig(dim=3, num_blocks=16, min_blocks=8, container_width=6,
                    container_depth=6, container_height=6, target_width=6,
                    target_depth=6, window=4, allow_rot=True)
    assert eligible(cfg)
    _assert_rollout_equal(cfg, B=10, policy="random", seed=9)


@pytest.mark.parametrize("dim", [2, 3])
def test_fused_hard_variant_parity(dim):
    if dim == 2:
        cfg = TAPConfig(reward_type="C+P+S-lb-hard", allow_rot=True)
    else:
        cfg = TAPConfig(dim=3, container_width=6, container_depth=6,
                        container_height=6, target_width=6, target_depth=6,
                        num_blocks=8, min_blocks=8, allow_rot=True,
                        reward_type="C+P+S-lb-hard")
    assert eligible(cfg)
    _assert_rollout_equal(cfg, B=24, policy="random", seed=7)


def test_fused_2d_multi_container_parity():
    cfg = TAPConfig(num_containers=2, container_height=20, allow_rot=True)
    assert eligible(cfg)
    _assert_rollout_equal(cfg, B=24, policy="random", seed=11)


def test_eligibility_gate():
    # round-4: coverage is TOTAL — every driver config (incl. config 6,
    # 3D capped multi-container) and every variant family is fused-eligible
    for name in CONFIGS:
        assert eligible(CONFIGS[name]), name
    assert eligible(TAPConfig(num_containers=2, container_height=20))
    assert eligible(TAPConfig(target_height=12))
    assert eligible(TAPConfig(dim=3, container_width=8, container_depth=8,
                              container_height=8, target_width=8,
                              target_depth=8, target_height=10))
    assert eligible(TAPConfig(reward_type="C+P-mcs-soft"))


MCS_FUSED_CASES = {
    "2d-mcs-soft": TAPConfig(reward_type="C+P+S-mcs-soft"),
    "2d-mcs-hard": TAPConfig(allow_rot=True, reward_type="C+P-mcs-hard"),
    "3d-mcs-soft": TAPConfig(dim=3, container_width=6, container_depth=6,
                             container_height=6, target_width=6,
                             target_depth=6, allow_rot=True,
                             reward_type="C+S-mcs-soft"),
    "3d-mcs-hard-multicont": TAPConfig(dim=3, num_blocks=8, min_blocks=8,
                                       container_width=6, container_depth=6,
                                       container_height=6, target_width=6,
                                       target_depth=6, num_containers=2,
                                       reward_type="C+P+S-mcs-hard"),
}


@pytest.mark.parametrize("name", list(MCS_FUSED_CASES))
@pytest.mark.parametrize("policy", ["random"])
def test_fused_rollout_parity_mcs(name, policy):
    """mcs exact-score placement inside the monolithic rollout kernel
    (round-3 coverage extension): bit-equal to the general path."""
    cfg = MCS_FUSED_CASES[name]
    assert eligible(cfg)
    _assert_rollout_equal(cfg, B=24, policy=policy, seed=9)


CAPPED_FUSED_CASES = {
    "2d-capped-hard": TAPConfig(allow_rot=True, target_height=12,
                                reward_type="C+P+S-lb-hard"),
    "2d-capped-tight": TAPConfig(target_height=3,
                                 reward_type="C+P-lb-soft"),
    "2d-capped-mcs": TAPConfig(allow_rot=True, target_height=14,
                               reward_type="C+P+S-mcs-hard"),
}


@pytest.mark.parametrize("name", list(CAPPED_FUSED_CASES))
def test_fused_rollout_parity_capped(name):
    """Finite-height 2D configs inside the monolithic kernel (round-3): the
    per-action place-ok mask comes from a width-indexed min-landing table;
    a tight cap leaves instances legitimately unfinished — both paths must
    agree on exactly which blocks never place."""
    cfg = CAPPED_FUSED_CASES[name]
    assert eligible(cfg)
    _assert_rollout_equal(cfg, B=24, policy="random", seed=13)


CAPPED_3D_MC_CASES = {
    # driver config 6: spillover-mandatory capped multi-container
    "config6": CONFIGS["multi-container-capped"],
    # 3D single-container cap — exercises the (w, d)-indexed min-landing
    # table without the general selection
    "3d-capped": TAPConfig(dim=3, container_width=8, container_depth=8,
                           container_height=8, target_width=8,
                           target_depth=8, target_height=5, allow_rot=True),
    # 2D capped multi-container — exercises _select_general with the
    # width-indexed tables
    "2d-capped-mc": TAPConfig(container_height=20, target_height=7,
                              num_containers=2, allow_rot=True),
    # capped multi-container with exact-fraction mcs placement on top
    "3d-capped-mc-mcs": TAPConfig(dim=3, container_width=6,
                                  container_depth=6, container_height=6,
                                  target_width=6, target_depth=6,
                                  target_height=4, num_containers=2,
                                  allow_rot=True,
                                  reward_type="C+P+S-mcs-hard"),
    # THREE containers: _select_general's flat-order ranking beyond C=2
    "2d-capped-3c": TAPConfig(container_height=24, target_height=5,
                              num_containers=3, allow_rot=True),
}


@pytest.mark.parametrize("name", list(CAPPED_3D_MC_CASES))
@pytest.mark.parametrize("policy", ["first", "random"])
def test_fused_rollout_parity_capped_3d_multicontainer(name, policy):
    """Round-4 coverage completion (VERDICT r3 item 4): 3D and
    multi-container finite-height configs inside the monolithic kernel —
    per-container (w, d)-indexed min-landing mask tables + flat-order
    selection over container-dependent masks. Bit-exact vs the general
    path, including which blocks strand and where spillover lands."""
    cfg = CAPPED_3D_MC_CASES[name]
    assert eligible(cfg)
    _assert_rollout_equal(cfg, B=24, policy=policy, seed=17)
