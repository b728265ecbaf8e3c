"""Parity: step-kernel policy rollouts == general-path policy rollouts.

The fused per-decode-step select+place kernel (ops/pallas_policy_step.py)
must reproduce the general jit/vmap rollout exactly — same actions, same env
state, same replay record — for every eligible config (lb rule; finite and
unbounded height; soft/hard; rotation; multi-container; rolling window).
Runs the kernel in interpreter mode on the CPU test mesh.
"""

import numpy as np
import jax
import pytest

from tapnet_tpu.config import CONFIGS, TAPConfig
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.models import init_params
from tapnet_tpu.ops import pallas_policy_step as PS
from tapnet_tpu.train.rollout import rollout_batch_record

CASES = {
    "2d-basic": CONFIGS["2d-basic"],
    "2d-rot": CONFIGS["2d-rot"],
    "3d-basic": CONFIGS["3d-basic"],
    "multi-container": CONFIGS["multi-container"],
    "2d-capped-hard": TAPConfig(allow_rot=True, target_height=12,
                                reward_type="C+P+S-lb-hard"),
    "2d-multicont": TAPConfig(dim=2, num_blocks=8, min_blocks=8,
                              container_width=8, container_height=8,
                              target_width=8, num_containers=2,
                              allow_rot=True),
    "2d-mcs-soft": TAPConfig(allow_rot=True, reward_type="C+P+S-mcs-soft"),
    "2d-mcs-hard": TAPConfig(allow_rot=True, reward_type="C+P-mcs-hard"),
    "3d-mcs": TAPConfig(dim=3, container_width=8, container_depth=8,
                        container_height=8, target_width=8, target_depth=8,
                        allow_rot=True, reward_type="C+S-mcs-soft"),
    "mcs-multicont": TAPConfig(dim=3, num_blocks=8, min_blocks=8,
                               container_width=6, container_depth=6,
                               container_height=6, target_width=6,
                               target_depth=6, num_containers=2,
                               reward_type="C+P+S-mcs-hard"),
}


# greedy decode exercises the same kernel with a different score source, so
# most greedy points add compile time, not coverage: two stay fast, the rest
# run under -m slow (plus all on hardware via scripts/tpu_parity.py)
_FAST_GREEDY = ("2d-basic", "3d-mcs")


@pytest.mark.parametrize("name,greedy", [
    pytest.param(n, g,
                 marks=([pytest.mark.slow]
                        if g and n not in _FAST_GREEDY else []))
    for n in CASES for g in (False, True)])
def test_stepfused_rollout_matches_general(name, greedy):
    cfg = CASES[name]
    assert PS.eligible(cfg)
    B = 128
    key = jax.random.key(17)
    params = init_params(key, cfg, hidden=32)["actor"]
    instances = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)

    s_g, r_g, lp_g = jax.jit(
        lambda p, i, k: rollout_batch_record(
            p, i, k, cfg, 32, greedy=greedy, step_kernel=False))(
        params, instances, keys)
    s_f, r_f, lp_f = jax.jit(
        lambda p, i, k: rollout_batch_record(
            p, i, k, cfg, 32, greedy=greedy, step_kernel=True,
            interpret=True))(params, instances, keys)

    np.testing.assert_array_equal(np.asarray(r_g.action), np.asarray(r_f.action))
    np.testing.assert_array_equal(np.asarray(r_g.flags), np.asarray(r_f.flags))
    np.testing.assert_array_equal(np.asarray(r_g.heightmap),
                                  np.asarray(r_f.heightmap))
    np.testing.assert_array_equal(np.asarray(r_g.mask), np.asarray(r_f.mask))
    for f in ("heightmap", "packed", "placements", "t"):
        np.testing.assert_array_equal(np.asarray(getattr(s_g, f)),
                                      np.asarray(getattr(s_f, f)), err_msg=f)
    np.testing.assert_allclose(np.asarray(lp_g), np.asarray(lp_f),
                               rtol=1e-6, atol=1e-6)


def test_rolling_window_stepfused():
    cfg = CONFIGS["2d-rolling"]
    assert PS.eligible(cfg)
    B = 128
    key = jax.random.key(3)
    params = init_params(key, cfg, hidden=32)["actor"]
    instances = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    s_g, r_g, _ = jax.jit(
        lambda p, i, k: rollout_batch_record(p, i, k, cfg, 32,
                                             step_kernel=False))(
        params, instances, keys)
    s_f, r_f, _ = jax.jit(
        lambda p, i, k: rollout_batch_record(p, i, k, cfg, 32,
                                             step_kernel=True,
                                             interpret=True))(
        params, instances, keys)
    np.testing.assert_array_equal(np.asarray(r_g.action), np.asarray(r_f.action))
    np.testing.assert_array_equal(np.asarray(s_g.placements),
                                  np.asarray(s_f.placements))
    np.testing.assert_array_equal(np.asarray(s_g.heightmap),
                                  np.asarray(s_f.heightmap))


def test_all_configs_eligible():
    """No silent perf cliffs: every expressible config runs the step kernel
    (VERDICT r1 item 4 — mcs was the last exclusion)."""
    for cfg in CASES.values():
        assert PS.eligible(cfg)
    assert PS.eligible(TAPConfig(reward_type="C+P-mcs-soft"))
    assert PS.eligible(TAPConfig(target_height=5))
