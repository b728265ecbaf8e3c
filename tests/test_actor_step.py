"""Fused actor-head decode-step kernel (ops/pallas_actor_step) parity.

SPEC.md §12 two-tier exactness contract, tier checks in interpret mode:
- integer state — flags, mask, env updates, full action SEQUENCES — must be
  bit-equal to the general XLA path in f32 compute (gumbel argmax margins
  dwarf the ~1e-6 accumulation-order logit divergence, and exact logit ties
  only arise between identical tokens, where both paths take the lowest
  index);
- float logits must agree to accumulation-order tolerance.

Hardware (interpret=False) runs of the same checks live in
scripts/tpu_parity.py -> PARITY_TPU.json.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.config import CONFIGS, TAPConfig
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.models.features import build_tokens
from tapnet_tpu.models.tapnet import TAPNetActor, init_params
from tapnet_tpu.ops import pallas_actor_step as AS
from tapnet_tpu.train import rollout as RO

ELIGIBLE = ["2d-basic", "2d-rot", "3d-basic", "multi-container"]
# rolling joined the kernel's coverage in round 5 (in-kernel window +
# multi-limb precedence bitmasks); its N=50 interpret runs are multi-minute,
# so the driver config runs under -m slow and a small rolling config keeps
# fast coverage (hardware gate: PARITY_TPU.json).
WINDOWED = ["2d-rolling"]
SMALL_ROLLING = TAPConfig(num_blocks=12, min_blocks=6, container_width=8,
                          container_height=12, target_width=8, window=4,
                          allow_rot=True)
# two precedence-bitmask limbs (N > 31) with a small board
TWO_LIMB = TAPConfig(num_blocks=34, min_blocks=20, container_width=8,
                     container_height=40, target_width=8, window=6)


def _rollouts(cfg, B=128, hidden=48, seed=3, greedy=False):
    # exact-f32 matmuls: the tier-1 bit-exactness contract presumes f32
    # compute, but JAX 0.9's DEFAULT matmul precision runs bf16 passes
    # even for f32 on this CPU backend — enough drift (~1e-3 logits) to
    # flip sampled near-ties between two correct paths
    with jax.default_matmul_precision("highest"):
        key = jax.random.key(seed)
        params = init_params(key, cfg, hidden)
        instances = sample_batch(key, B, cfg)
        keys = jax.random.split(jax.random.key(seed + 7), B)
        gen = RO.rollout_batch_record(params["actor"], instances, keys, cfg,
                                      hidden=hidden, step_kernel=False,
                                      actor_kernel=False, greedy=greedy)
        ker = RO.rollout_batch_record(params["actor"], instances, keys, cfg,
                                      hidden=hidden, actor_kernel=True,
                                      interpret=True, greedy=greedy)
        jax.block_until_ready((gen, ker))
    return params, instances, gen, ker


def _assert_sampled_parity(cfg, seed=3):
    """Tier-1+2 composite: SAMPLED rollouts are action-sequence equal (the
    gumbel perturbation makes logit ties measure-zero, so ~1e-6 logit
    divergence cannot flip an argmax), hence all integer state matches
    bit-exactly."""
    _, _, (s_g, r_g, lp_g), (s_k, r_k, lp_k) = _rollouts(cfg, seed=seed,
                                                         greedy=False)
    np.testing.assert_array_equal(np.asarray(r_k.action),
                                  np.asarray(r_g.action))
    np.testing.assert_array_equal(np.asarray(r_k.flags),
                                  np.asarray(r_g.flags))
    np.testing.assert_array_equal(np.asarray(r_k.mask), np.asarray(r_g.mask))
    np.testing.assert_array_equal(np.asarray(s_k.packed),
                                  np.asarray(s_g.packed))
    np.testing.assert_array_equal(np.asarray(s_k.heightmap),
                                  np.asarray(s_g.heightmap))
    np.testing.assert_array_equal(np.asarray(s_k.placements),
                                  np.asarray(s_g.placements))
    np.testing.assert_array_equal(np.asarray(s_k.t), np.asarray(s_g.t))
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_g),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ELIGIBLE)
def test_trajectory_parity_sampled(name):
    _assert_sampled_parity(CONFIGS[name])


@pytest.mark.slow  # N=50 interpret rollout; hardware gate: PARITY_TPU.json
@pytest.mark.parametrize("name", WINDOWED)
def test_trajectory_parity_sampled_rolling(name):
    """Round-5 coverage: the driver rolling config through the fused actor
    kernel — in-kernel window rank, 2-limb precedence, full-token scoring
    with window masking — bit-matches the windowed general path."""
    _assert_sampled_parity(CONFIGS[name])


def test_trajectory_parity_sampled_small_rolling():
    """Fast rolling coverage: window rank + window-masked mask/logits on a
    12-block rotation config (single precedence limb)."""
    _assert_sampled_parity(SMALL_ROLLING)


@pytest.mark.slow  # N=34 interpret rollout
def test_trajectory_parity_sampled_two_limb():
    """N > 31: the two-limb precedence bitmask path, plus a window."""
    _assert_sampled_parity(TWO_LIMB)


def test_precedence_bitmask_limbs():
    """precedence_bitmasks packs >31-block graphs into 31-bit limbs whose
    blocked-test reproduces env.core._accessibility exactly."""
    from tapnet_tpu.env.core import _accessibility

    cfg = TWO_LIMB
    key = jax.random.key(11)
    instances = sample_batch(key, 16, cfg)
    N = cfg.num_blocks
    upm, rotm = AS.precedence_bitmasks(instances, cfg)     # [2N, B]
    upm, rotm = np.asarray(upm), np.asarray(rotm)
    packed = np.asarray(
        jax.random.bernoulli(key, 0.4, (16, N))).astype(bool)
    acc0_ref, accr_ref = jax.vmap(_accessibility)(
        instances, jnp.asarray(packed))
    unpk = (~packed).astype(np.int64)                      # [B, N]
    for limbs, ref in ((upm, acc0_ref), (rotm, accr_ref)):
        blocked = np.zeros((16, N), bool)
        for limb in range(2):
            ub = np.zeros((16,), np.int64)
            for j in range(31 * limb, min(N, 31 * (limb + 1))):
                ub |= unpk[:, j] << (j - 31 * limb)
            blocked |= (limbs[limb * N:(limb + 1) * N].T & ub[:, None]) != 0
        got = unpk.astype(bool) & ~blocked
        if ref is accr_ref:
            got &= prev_acc
        np.testing.assert_array_equal(got, np.asarray(ref))
        prev_acc = got


def test_eligibility():
    # round 5: every unbounded-height config (incl. rolling) is eligible;
    # only the finite-height cap falls back to the select_step path
    for name, cfg in CONFIGS.items():
        assert AS.eligible(cfg) == (cfg.target_height == 0), name
    assert not AS.eligible(TAPConfig(target_height=12,
                                     reward_type="C+P+S-lb-hard"))


@pytest.mark.parametrize("name", ["2d-basic", "3d-basic"])
def test_trajectory_greedy_divergence_is_tie_bound(name):
    """Greedy decode sits exactly on argmax ties between duplicate blocks;
    the kernel's transposed embedding breaks such bit-ties differently
    (SPEC.md §12 — why auto-selection is sampled-only). The contract for an
    EXPLICIT greedy kernel rollout: divergence stays a small fraction of
    decisions and end-state packing quality is statistically unchanged."""
    from tapnet_tpu.env import core as EC

    cfg = CONFIGS[name]
    _, instances, (s_g, r_g, _), (s_k, r_k, _) = _rollouts(cfg, greedy=True)
    ag, ak = np.asarray(r_g.action), np.asarray(r_k.action)
    assert (ag != ak).mean() < 0.2, (ag != ak).mean()
    R_g = jax.vmap(lambda s, i: EC.reward(s, i, cfg))(s_g, instances)
    R_k = jax.vmap(lambda s, i: EC.reward(s, i, cfg))(s_k, instances)
    assert abs(float(R_g.mean()) - float(R_k.mean())) < 0.02


@pytest.mark.parametrize("name", ["2d-rot", "multi-container"])
def test_reset_state_logits_tolerance(name):
    """Tier-2 contract: kernel logits vs the XLA head on the same state
    agree to accumulation-order tolerance (f32: ~1e-5)."""
    cfg = CONFIGS[name]
    B, hidden = 128, 48
    key = jax.random.key(5)
    params = init_params(key, cfg, hidden)
    instances = sample_batch(key, B, cfg)
    actor = TAPNetActor(cfg, hidden)

    # XLA head on the reset state
    states0 = jax.vmap(lambda i: E.reset(i, cfg))(instances)
    static, dynamic, hm = jax.vmap(
        lambda i, s: build_tokens(i, s, cfg))(instances, states0)
    merged = jnp.concatenate([dynamic, static], axis=-1)
    se_bth = actor.apply(params["actor"], static,
                         method=TAPNetActor.embed_static)
    ref = jax.vmap(lambda se, dy, hg: actor.apply(
        params["actor"], se, dy, hg, None,
        method=TAPNetActor.head))(se_bth, merged, hm)        # [B, A]

    # kernel on the same reset state (batch-on-lanes head operand layout)
    N, W, D, C = (cfg.num_blocks, cfg.target_width, cfg.target_depth,
                  cfg.num_containers)
    A = cfg.num_actions
    se = se_bth.transpose(1, 2, 0)                           # [T, h, B]
    ctx = se_bth.mean(axis=1).T                              # [h, B]
    statp = static.transpose(2, 1, 0)                        # [4, T, B]
    statm = static.mean(axis=1).T                            # [4, B]
    upm, rotm = AS.precedence_bitmasks(instances, cfg)
    fits = AS.fits_planes(instances, cfg)
    ops = AS.head_operands(params["actor"], cfg, jnp.float32)
    out = AS.actor_select_step(
        jnp.zeros((1, 1)), states0.packed.T.astype(jnp.int32),
        jnp.zeros((C * W, D, B), jnp.int32),
        jnp.full((N * 6, B), -1, jnp.int32),
        jnp.full((1, B), -1, jnp.int32),
        instances.dims[:, :, 0].T, instances.dims[:, :, 1].T,
        instances.dims[:, :, 2].T, upm, rotm, fits,
        jnp.zeros((A, B)), se, ctx, statp, statm, ops,
        cfg=cfg, interpret=True)
    logits = out[6].T                                        # [B, A]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # flags from the kernel match features.dynamic_flags on the same state
    from tapnet_tpu.models.features import dynamic_flags
    want = jax.vmap(lambda i, p: dynamic_flags(i, p, cfg))(
        instances, states0.packed)
    np.testing.assert_array_equal(np.asarray(out[4].T), np.asarray(want))


def test_reinforce_grads_with_actor_kernel_interpret():
    """REINFORCE wiring: a loss whose rollout runs the fused actor kernel
    (interpret) yields the same rewards and gradients as the general path —
    the trajectories are bit-equal (tier 1), so the replayed logp and its
    grads match to logit tolerance."""
    from tapnet_tpu.env import core as EC

    cfg = CONFIGS["2d-basic"]
    hidden = 32
    params = init_params(jax.random.key(0), cfg, hidden)["actor"]
    instances = sample_batch(jax.random.key(1), 128, cfg)
    keys = jax.random.split(jax.random.key(2), 128)

    def loss(p, actor_kernel):
        states, record, _ = RO.rollout_batch_record(
            jax.lax.stop_gradient(p), instances, keys, cfg, hidden=hidden,
            step_kernel=False, actor_kernel=actor_kernel,
            interpret=actor_kernel, with_logp=False)
        record = jax.lax.stop_gradient(record)
        logp = RO.replay_logp_sum(p, instances, record, cfg, hidden=hidden)
        R = jax.vmap(lambda s, i: EC.reward(s, i, cfg))(states, instances)
        return -(R * logp).mean(), R

    (l_g, R_g), g_g = jax.value_and_grad(
        lambda p: loss(p, False), has_aux=True)(params)
    (l_k, R_k), g_k = jax.value_and_grad(
        lambda p: loss(p, True), has_aux=True)(params)

    assert np.isfinite(float(l_k))
    np.testing.assert_allclose(np.asarray(R_k), np.asarray(R_g),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(l_k), float(l_g), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
