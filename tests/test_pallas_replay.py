"""Custom-VJP Pallas replay head (ops/pallas_replay) vs the XLA replay.

The replay is the DIFFERENTIATED pass, so parity here is about both the
value and the hand-derived backward: sum_t log pi and every parameter
gradient (including the chain through embed_static_T into the token
encoder) must match jax.grad of the XLA path to f32 accumulation-order
tolerance (SPEC.md §12 tier 2). Interpret mode on CPU; hardware runs live
in scripts/tpu_parity.py -> PARITY_TPU.json.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.config import CONFIGS, TAPConfig
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.models.tapnet import init_params
from tapnet_tpu.train import rollout as RO

ELIGIBLE = ["2d-basic", "2d-rot", "3d-basic", "multi-container",
            # finite-height joined in round 5: the mask rides in as
            # RECORDED data instead of a flag rebuild
            "multi-container-capped"]
# round 5: rolling rides the STEP-GRID replay schedule (one decode step per
# grid cell) — driver config under -m slow, small config for fast coverage
WINDOWED = ["2d-rolling"]
SMALL_ROLLING = TAPConfig(num_blocks=12, min_blocks=6, container_width=8,
                          container_height=12, target_width=8, window=4,
                          allow_rot=True)


def _setup(cfg, B=128, hidden=48, seed=3):
    if isinstance(cfg, str):
        cfg = CONFIGS[cfg]
    key = jax.random.key(seed)
    params = init_params(key, cfg, hidden)["actor"]
    instances = sample_batch(key, B, cfg)
    keys = jax.random.split(jax.random.key(seed + 4), B)
    _, record, _ = RO.rollout_batch_record(
        params, instances, keys, cfg, hidden=hidden, step_kernel=False,
        actor_kernel=False, with_logp=False)
    return cfg, params, instances, jax.lax.stop_gradient(record), hidden


def _assert_value_grad_parity(name, atol=5e-5):
    # exact-f32 matmuls for BOTH paths: JAX 0.9's default precision runs
    # bf16 passes even for f32 on this CPU backend, which would put ~1e-4
    # of the XLA path's own rounding into the comparison
    with jax.default_matmul_precision("highest"):
        cfg, params, instances, record, hidden = _setup(name)

        def lp(p, kernel):
            return RO.replay_logp_sum(p, instances, record, cfg,
                                      hidden=hidden, kernel=kernel,
                                      interpret=kernel).sum()

        vx, gx = jax.value_and_grad(lambda p: lp(p, False))(params)
        vk, gk = jax.value_and_grad(lambda p: lp(p, True))(params)
    np.testing.assert_allclose(float(vk), float(vx), rtol=1e-5, atol=1e-3)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gx),
            jax.tree_util.tree_leaves_with_path(gk)):
        scale = np.max(np.abs(np.asarray(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=atol,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("name", ELIGIBLE)
def test_value_and_grad_parity(name):
    _assert_value_grad_parity(name)


@pytest.mark.slow  # S=50 interpret replay; hardware gate: PARITY_TPU.json
@pytest.mark.parametrize("name", WINDOWED)
def test_value_and_grad_parity_rolling(name):
    """The step-grid schedule on the driver rolling config vs jax.grad of
    the windowed XLA replay (which it replaces on TPU)."""
    _assert_value_grad_parity(name)


def test_value_and_grad_parity_small_rolling():
    """Fast step-grid coverage: windowed replay kernel on a 12-block
    rotation config."""
    _assert_value_grad_parity(SMALL_ROLLING)


def test_primal_mode_skips_forward_but_keeps_gradients():
    """logp0 (use_primal): the custom-VJP returns the caller's primal
    verbatim — the fused rollout kernel's own logp in training — while the
    gradients stay BIT-IDENTICAL to the full fwd+bwd path, because the
    hand-derived backward kernel is self-contained (it re-runs the head
    itself and never reads the primal)."""
    with jax.default_matmul_precision("highest"):
        cfg, params, instances, record, hidden = _setup("2d-basic")
        B = record.action.shape[1]
        logp0 = jnp.linspace(-3.0, -1.0, B)

        def lp(p, l0):
            return RO.replay_logp_sum(p, instances, record, cfg,
                                      hidden=hidden, kernel=True,
                                      interpret=True, logp0=l0)

        v1, g1 = jax.value_and_grad(lambda p: lp(p, None).sum())(params)
        v0, g0 = jax.value_and_grad(lambda p: lp(p, logp0).sum())(params)
    np.testing.assert_allclose(float(v0), float(np.asarray(logp0).sum()),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the rollout-kernel logp it receives in training matches the
    # replay-kernel value to tier-2 tolerance (same keys => same actions
    # under highest precision => same record)
    with jax.default_matmul_precision("highest"):
        keys = jax.random.split(jax.random.key(3 + 4), B)
        _, _, lp_roll = RO.rollout_batch_record(
            params, instances, keys, cfg, hidden=hidden, actor_kernel=True,
            interpret=True, with_logp=True)
        lp_replay = RO.replay_logp_sum(params, instances, record, cfg,
                                       hidden=hidden, kernel=True,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(lp_roll), np.asarray(lp_replay),
                               rtol=1e-4, atol=1e-3)


def test_steps_schedule_matches_monolithic():
    """Both kernel schedules are the same math: force the step-grid
    schedule onto a config the monolithic schedule owns and compare value
    and gradients kernel-vs-kernel."""
    from tapnet_tpu.ops import pallas_replay as PR

    with jax.default_matmul_precision("highest"):
        cfg, params, instances, record, hidden = _setup("2d-basic")

        def lp(p):
            return RO.replay_logp_sum(p, instances, record, cfg,
                                      hidden=hidden, kernel=True,
                                      interpret=True).sum()

        v_mono, g_mono = jax.value_and_grad(lp)(params)
        orig = PR._steps_grid
        PR._steps_grid = lambda cfg: True
        try:
            v_steps, g_steps = jax.value_and_grad(lp)(params)
        finally:
            PR._steps_grid = orig
    np.testing.assert_allclose(float(v_steps), float(v_mono),
                               rtol=1e-6, atol=1e-4)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_mono),
            jax.tree_util.tree_leaves_with_path(g_steps)):
        scale = np.max(np.abs(np.asarray(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_per_instance_values_match():
    cfg, params, instances, record, hidden = _setup("2d-basic")
    lx = RO.replay_logp_sum(params, instances, record, cfg, hidden=hidden,
                            kernel=False)
    lk = RO.replay_logp_sum(params, instances, record, cfg, hidden=hidden,
                            kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lx),
                               rtol=1e-4, atol=1e-4)


def test_temperature_and_padding_actions():
    """temperature != 1 flows through the kernel's masked-logit scaling and
    its backward; instances with no-op steps (action = -1, from n_total <
    num_blocks padding) contribute zero logp and zero gradient."""
    from tapnet_tpu.config import TAPConfig

    cfg = TAPConfig(num_blocks=8, min_blocks=4, container_width=8,
                    container_height=8, target_width=8, allow_rot=True)
    key = jax.random.key(5)
    hidden = 48
    params = init_params(key, cfg, hidden)["actor"]
    instances = sample_batch(key, 128, cfg)
    keys = jax.random.split(jax.random.key(9), 128)
    _, record, _ = RO.rollout_batch_record(
        params, instances, keys, cfg, hidden=hidden, step_kernel=False,
        actor_kernel=False, with_logp=False)
    record = jax.lax.stop_gradient(record)
    assert (np.asarray(record.action) == -1).any()  # padding steps exist

    def lp(p, kernel):
        return RO.replay_logp_sum(p, instances, record, cfg, hidden=hidden,
                                  temperature=0.7, kernel=kernel,
                                  interpret=kernel).sum()

    vx, gx = jax.value_and_grad(lambda p: lp(p, False))(params)
    vk, gk = jax.value_and_grad(lambda p: lp(p, True))(params)
    np.testing.assert_allclose(float(vk), float(vx), rtol=1e-5, atol=1e-3)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gk)):
        scale = np.max(np.abs(np.asarray(a))) + 1e-9
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=5e-5)
