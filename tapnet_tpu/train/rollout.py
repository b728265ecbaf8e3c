"""Policy rollouts: batched decode loop + parallel replay for REINFORCE.

The reference interleaves GPU policy calls with a per-instance CPU env loop
and host<->device copies every decode step (SURVEY.md §3.1 hot loop). Here
the whole batch moves through ONE lax.scan of N decode steps (actor applied
inside the scan), and — the TPU-first part — the *differentiated* pass never
touches the scan at all:

- `rollout_batch_record` rolls the batch WITHOUT gradients, recording the
  tiny per-step observation state (packed bits, heightmaps, masks, actions);
- `replay_logp_sum` recomputes all B·N decode logits in ONE batched forward
  over the recorded observations, so the REINFORCE backward pass is a single
  stack of MXU-shaped GEMMs instead of N sequential scan iterations with
  saved residuals.

Decode-history conditioning stays parallel in replay because the "history"
at step t is just the recorded action at t-1 (a shift, not a recurrence).
The static-dims embedding is hoisted out of the decode loop entirely
(`TAPNetActor.embed_static`) — it never changes across steps.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.env import core as E
from tapnet_tpu.models.features import (dynamic_flags, heightmap_grid,
                                        mask_from_flags, merge_tokens,
                                        static_tokens, tokens_from_flags)
from tapnet_tpu.models.tapnet import TAPNetActor
from tapnet_tpu.types import EnvState, Instance

NEG = jnp.float32(-1e9)


class RolloutRecord(NamedTuple):
    """Per-step observations seen by the policy (pre-step state), stacked on
    a leading decode-step axis of length N. Enough to replay every decode
    logit in parallel."""

    flags: jax.Array      # uint8[N, B, num_blocks] (features.dynamic_flags)
    heightmap: jax.Array  # int32[N, B, C, W, D]
    mask: jax.Array       # bool[N, B, A]
    action: jax.Array     # int32[N, B] (-1 = no feasible action)


def _masked_logits(logits, mask, temperature):
    return jnp.where(mask, logits / temperature, NEG)


def rollout_batch_record(actor_params, instances: Instance, keys,
                         cfg: TAPConfig, hidden: int = 128,
                         greedy: bool = False, temperature: float = 1.0,
                         dtype=jnp.float32, step_kernel=None,
                         interpret: bool = False, mesh=None,
                         axis: str = "data", with_logp: bool = True,
                         actor_kernel=None):
    """Roll a batch with the actor; returns (states, RolloutRecord, logp_sum).

    Sampling is Gumbel-argmax over masked logits (identical in law to
    categorical sampling), with the exact per-instance threefry schedule
    gumbel(fold_in(keys[b], t)) — all N draws precomputed OUTSIDE the decode
    scan (bit-identical values, ~5 fewer ops per step). logp_sum is computed
    inline (non-diff convenience for eval); training recomputes it via
    replay_logp_sum and passes with_logp=False so the scan carry does no
    dead log-softmax work (carried values are not DCE-able).

    actor_kernel: fuse the ENTIRE decode step — flags, mask, the actor
    head's GEMMs/attention, masked gumbel argmax, select/place — into one
    Pallas kernel per step (ops.pallas_actor_step; integer state bit-exact,
    logits to accumulation-order tolerance — SPEC.md §12 two-tier
    contract). None = auto: on TPU for eligible configs (unbounded height,
    no rolling window) on SAMPLED rollouts only — greedy decode sits
    exactly on argmax ties between duplicate blocks, where the kernel's
    transposed embedding chain breaks bit-ties differently than the XLA
    head (SPEC.md §12), so greedy eval keeps the reference path unless the
    caller opts in explicitly. TAPNET_ACTOR_KERNEL=0 disables the auto
    path.

    step_kernel: fuse everything between actor calls into one Pallas kernel
    per decode step (ops.pallas_policy_step; bit-exact vs the general path).
    None = auto: on TPU when the config is eligible and the (per-shard)
    batch is a multiple of 128. Under `mesh` both kernels run per-shard via
    shard_map (the batch axis is embarrassingly parallel).
    """
    import os

    from tapnet_tpu.ops import pallas_actor_step as AS
    from tapnet_tpu.ops import pallas_policy_step as PS

    B = instances.dims.shape[0]
    shard_B = B // mesh.shape[axis] if mesh is not None else B
    if actor_kernel is None:
        actor_kernel = (not greedy and AS.eligible(cfg) and shard_B % 128 == 0
                        and jax.default_backend() == "tpu"
                        and os.environ.get("TAPNET_ACTOR_KERNEL", "1") != "0")
    if actor_kernel:
        return _rollout_record_actorfused(actor_params, instances, keys, cfg,
                                          hidden, greedy, temperature, dtype,
                                          interpret, mesh, axis, with_logp)
    if step_kernel is None:
        step_kernel = (PS.eligible(cfg) and shard_B % PS.TB == 0
                       and jax.default_backend() == "tpu")
    if step_kernel:
        return _rollout_record_stepfused(actor_params, instances, keys, cfg,
                                         hidden, greedy, temperature, dtype,
                                         interpret, mesh, axis, with_logp)
    return _rollout_record_general(actor_params, instances, keys, cfg,
                                   hidden, greedy, temperature, dtype,
                                   with_logp)


def _gumbel_all(keys, cfg: TAPConfig):
    """All decode-step gumbel draws [N, B, A]: gumbel(fold_in(keys[b], t)),
    the same per-step schedule the scan body used to draw inline."""
    ts = jnp.arange(cfg.num_blocks, dtype=jnp.int32)
    g = jax.vmap(lambda k: jax.vmap(lambda t: jax.random.gumbel(
        jax.random.fold_in(k, t), (cfg.num_actions,)))(ts))(keys)
    return jnp.swapaxes(g, 0, 1)


def _use_windowed_head(cfg: TAPConfig) -> bool:
    """Rolling unbounded-height configs score only the <=window observable
    tokens per decode step (scattered back to the full action space) — see
    _make_windowed_head / _replay_logp_windowed."""
    return 0 < cfg.window < cfg.num_blocks and cfg.target_height == 0


def _window_onehot(f, Kw: int):
    """Shared window-gather plan from int32 flag words [..., N] (leading
    axes arbitrary): (win, rank, onehot [..., Kw, N] bool, validw).

    The rollout head and the replay MUST build the identical one-hot for
    REINFORCE correctness (replayed logp of the sampled actions); keeping
    one implementation makes divergence impossible."""
    win = (f >> 3) & 1
    rank = jnp.cumsum(win, axis=-1) - win
    onehot = ((rank[..., None, :]
               == jnp.arange(Kw, dtype=jnp.int32)[:, None])
              & (win[..., None, :] == 1))
    return win, rank, onehot, onehot.any(axis=-1)


def _window_dsum(f, win, t_frac, stat_mean, cfg: TAPConfig, cdt):
    """Shared exact full-token context summary [..., 8]: the head's mean
    merged token computed from integer bit counts (sums of 0/1 are exact
    in any float dtype) + the precomputed static-feature means. t_frac
    must broadcast against f[..., N].sum(-1); stat_mean is [..., 4] cdt."""
    N, R = cfg.num_blocks, cfg.num_rot
    T = N * R
    pk = (f & 1).sum(-1).astype(jnp.float32)
    a0 = ((f >> 1) & 1).sum(-1).astype(jnp.float32)
    ar = ((f >> 2) & 1).sum(-1).astype(jnp.float32)
    wn = win.sum(-1).astype(jnp.float32)
    acc_mean = (a0 + ar) / T if R == 2 else a0 / N
    tf = jnp.broadcast_to(jnp.asarray(t_frac, jnp.float32), pk.shape)
    dyn4 = jnp.stack([pk / N, acc_mean, wn / N, tf], axis=-1).astype(cdt)
    return jnp.concatenate(
        [dyn4, jnp.broadcast_to(stat_mean, dyn4.shape[:-1] + (4,))], axis=-1)


def _make_windowed_head(actor, actor_params, instances: Instance,
                        static, static_emb, cfg: TAPConfig, hidden, dtype):
    """Per-decode-step head for rolling configs: gather the <=window
    observable blocks, score those tokens only, scatter scores back to the
    full [B, A] logit vector (0 at non-window positions — all masked).

    Valid-position logits are BIT-IDENTICAL to the full head in f32 compute:
    gathers are exact one-hot contractions and the context summaries are
    exact integer-count arithmetic (see _replay_logp_windowed, which shares
    the math). In bf16 compute the summaries here are computed MORE exactly
    than the full head's (integer counts summed in f32, cast once, vs the
    full head's bf16-accumulated means), so the two can differ by rounding —
    what is guaranteed in bf16 is rollout/replay consistency (both use these
    shared helpers), which is what REINFORCE correctness needs (ADVICE r4).
    Cuts per-step head bytes/FLOPs by ~N/window (5x for the rolling
    driver config, where the decode scan was HBM-bound on [B, 100, h]
    intermediates).

    Returns fn(flags u8[B, N], heightmap [B, C, W, D], prev [B], t_frac)
    -> logits f32[B, A].
    """
    cdt = jnp.dtype(dtype).type
    N, R, C, Kw = (cfg.num_blocks, cfg.num_rot, cfg.num_containers,
                   cfg.window)
    B = instances.dims.shape[0]
    h = hidden
    ctx = static_emb.mean(axis=1)                                # [B, h]
    stat_mean = static.astype(cdt).mean(axis=1)                  # [B, 4]
    se_bn = static_emb.reshape(B, N, R * h)
    # compute-dtype static features: the head casts merged tokens to cdt
    # anyway, and a one-hot gather of pre-rounded values equals rounding
    # the f32 gather
    static_bn = static.astype(cdt).reshape(B, N, R * 4)

    def head_one(se, dy, hg, pa, cx, ds):
        return actor.apply(actor_params, se, dy, hg, pa, cx, ds,
                           method=TAPNetActor.head_ctx)

    def win_head(flags, heightmap, prev, t_frac):
        f = flags.astype(jnp.int32)                    # [B, N]
        win, rank, onehot, validw = _window_onehot(f, Kw)  # oh [B, Kw, N]
        oh32 = onehot.astype(jnp.float32)

        # one-hot contractions at precision="highest": a one-hot dot has
        # exactly one nonzero term, so the ACCUMULATION is exact in any
        # dtype — but the default matmul precision truncates the VALUE
        # operand to bf16 passes (JAX 0.9 does this even for f32 on CPU;
        # measured ~4e-3 logit drift vs the full head, enough to flip
        # sampled near-ties against the fused actor kernel, which matches
        # the full head to ~1e-6). "highest" keeps the gathered value
        # bit-exact, which is what this docstring promises.
        hi = "highest"
        ohc = onehot.astype(cdt)
        se_g = jnp.einsum("bwn,bnf->bwf", onehot.astype(se_bn.dtype),
                          se_bn, precision=hi).reshape(B, Kw * R, h)
        gf = jnp.einsum("bwn,bn->bw", ohc,
                        f.astype(cdt), precision=hi).astype(jnp.int32)
        static_g = jnp.einsum("bwn,bnf->bwf", ohc, static_bn, precision=hi)
        dyn_g = tokens_from_flags(
            gf, jnp.asarray(t_frac, jnp.float32), cfg)  # [B, Kw*R, 4]
        merged = jnp.concatenate(
            [dyn_g, static_g.reshape(B, Kw * R, 4)], axis=-1)

        dsum = _window_dsum(f, win, t_frac, stat_mean, cfg, cdt)  # [B, 8]

        hmg = heightmap_grid(heightmap, cfg)
        scores = jax.vmap(head_one)(se_g, merged, hmg, prev,
                                    ctx, dsum)         # [B, Kw*R*C]
        # scatter back to the full action space (exact: 1.0 * score)
        full = jnp.einsum("bwn,bwz->bnz", oh32,
                          scores.reshape(B, Kw, R * C), precision=hi)
        return full.reshape(B, cfg.num_actions)

    return win_head


def _rollout_record_general(actor_params, instances: Instance, keys,
                            cfg: TAPConfig, hidden, greedy, temperature,
                            dtype, with_logp=True):
    actor = TAPNetActor(cfg, hidden, dtype=jnp.dtype(dtype).type)
    B = instances.dims.shape[0]

    states0 = jax.vmap(lambda i: E.reset(i, cfg))(instances)
    static = jax.vmap(lambda i: static_tokens(i, cfg))(instances)  # [B, T, F]
    static_emb = actor.apply(actor_params, static,
                             method=TAPNetActor.embed_static)      # [B, T, h]
    win_head = (_make_windowed_head(actor, actor_params, instances, static,
                                    static_emb, cfg, hidden, dtype)
                if _use_windowed_head(cfg) else None)
    ts = jnp.arange(cfg.num_blocks, dtype=jnp.int32)
    xs = (ts, jnp.zeros((cfg.num_blocks, 1, 1)) if greedy
          else _gumbel_all(keys, cfg))

    def body(carry, x):
        t, g = x
        state, prev, logp_sum = carry
        flags = jax.vmap(lambda i, p: dynamic_flags(i, p, cfg))(
            instances, state.packed)                               # [B, nb] u8
        if cfg.target_height == 0:
            # mask is a pure function of (flags, static dims) without a
            # height cap — one accessibility pass per step, not two
            mask = mask_from_flags(flags, instances, cfg)          # [B, A]
        else:
            mask = jax.vmap(lambda s, i: E.action_mask(s, i, cfg))(
                state, instances)                                  # [B, A]
        if win_head is not None:
            logits = win_head(flags, state.heightmap, prev,
                              state.t / cfg.num_blocks)            # [B, A]
        else:
            dynamic = merge_tokens(static, tokens_from_flags(
                flags, state.t / cfg.num_blocks, cfg))             # [B, T, F]
            hmg = heightmap_grid(state.heightmap, cfg)             # [B,C,W,D,1]
            logits = jax.vmap(
                lambda se, dy, hg, pa: actor.apply(
                    actor_params, se, dy, hg, pa, method=TAPNetActor.head)
            )(static_emb, dynamic, hmg, prev)                      # [B, A]
        masked = _masked_logits(logits, mask, temperature)
        if greedy:
            a = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        else:
            a = jnp.argmax(masked + g, axis=-1).astype(jnp.int32)
        valid = mask.any(axis=-1)
        if with_logp:
            logp = jnp.take_along_axis(jax.nn.log_softmax(masked, axis=-1),
                                       a[:, None], axis=-1)[:, 0]
            logp_sum = logp_sum + jnp.where(valid, logp, 0.0)
        a = jnp.where(valid, a, -1)
        rec = RolloutRecord(flags=flags, heightmap=state.heightmap,
                            mask=mask, action=a)
        state = jax.vmap(lambda s, aa, i: E.step(s, aa, i, cfg))(
            state, a, instances)
        return (state, a, logp_sum), rec

    (states, _, logp_sum), record = jax.lax.scan(
        body, (states0, jnp.full((B,), -1, jnp.int32), jnp.zeros(B)), xs)
    return states, record, logp_sum


def _rollout_record_stepfused(actor_params, instances: Instance, keys,
                              cfg: TAPConfig, hidden, greedy, temperature,
                              dtype, interpret, mesh=None, axis="data",
                              with_logp=True):
    """Kernel-path twin of _rollout_record_general: batch-last env state
    carried through the scan; one ops.pallas_policy_step.select_step call
    replaces the ~40 small select/scan/update ops per decode step."""
    from tapnet_tpu.ops import pallas_policy_step as PS

    if mesh is None:
        select_step = functools.partial(PS.select_step, cfg=cfg,
                                        interpret=interpret)
    else:
        # per-shard kernel launches; batch is the LAST axis of every operand
        from jax.sharding import PartitionSpec as P
        bl = lambda nd: P(*([None] * (nd - 1)), axis)
        select_step = jax.shard_map(
            functools.partial(PS.select_step, cfg=cfg, interpret=interpret),
            mesh=mesh,
            in_specs=(bl(2), bl(2), bl(2), bl(3), bl(2), bl(2), bl(2), bl(2)),
            out_specs=(bl(2), bl(3), bl(2), bl(1)),
            check_vma=False)

    actor = TAPNetActor(cfg, hidden, dtype=jnp.dtype(dtype).type)
    B = instances.dims.shape[0]
    N, W, D, C = (cfg.num_blocks, cfg.target_width, cfg.target_depth,
                  cfg.num_containers)

    static = jax.vmap(lambda i: static_tokens(i, cfg))(instances)
    static_emb = actor.apply(actor_params, static,
                             method=TAPNetActor.embed_static)
    win_head = (_make_windowed_head(actor, actor_params, instances, static,
                                    static_emb, cfg, hidden, dtype)
                if _use_windowed_head(cfg) else None)

    # batch-last instance constants / initial state
    dims_w = instances.dims[:, :, 0].T.astype(jnp.int32)         # [N, B]
    dims_d = instances.dims[:, :, 1].T.astype(jnp.int32)
    dims_h = instances.dims[:, :, 2].T.astype(jnp.int32)
    states0 = jax.vmap(lambda i: E.reset(i, cfg))(instances)
    packed0 = states0.packed.T.astype(jnp.int32)                 # [N, B]
    hm0 = jnp.zeros((C * W, D, B), jnp.int32)
    plc0 = jnp.full((N * 6, B), -1, jnp.int32)

    ts = jnp.arange(N, dtype=jnp.int32)
    xs = (ts, jnp.zeros((N, 1, 1)) if greedy else _gumbel_all(keys, cfg))

    def body(carry, x):
        t, g = x
        packed_bl, hm_bl, plc_bl, prev, logp_sum = carry
        packed_bm = packed_bl.T.astype(bool)                     # [B, N]
        hm_bm = hm_bl.reshape(C, W, D, B).transpose(3, 0, 1, 2)  # [B,C,W,D]
        state_bm = EnvState(heightmap=hm_bm, packed=packed_bm,
                            placements=None, t=None)
        flags = jax.vmap(lambda i, p: dynamic_flags(i, p, cfg))(
            instances, packed_bm)                                # [B, nb] u8
        if cfg.target_height == 0:
            mask = mask_from_flags(flags, instances, cfg)        # [B, A]
        else:
            mask = jax.vmap(lambda s, i: E.action_mask(s, i, cfg))(
                state_bm, instances)                             # [B, A]
        if win_head is not None:
            logits = win_head(flags, hm_bm, prev,
                              t / cfg.num_blocks)                # [B, A]
        else:
            dynamic = merge_tokens(static, tokens_from_flags(
                flags, t / cfg.num_blocks, cfg))                 # [B, T, F]
            hmg = heightmap_grid(hm_bm, cfg)
            logits = jax.vmap(
                lambda se, dy, hg, pa: actor.apply(
                    actor_params, se, dy, hg, pa, method=TAPNetActor.head)
            )(static_emb, dynamic, hmg, prev)                    # [B, A]
        masked = _masked_logits(logits, mask, temperature)
        score = masked if greedy else masked + g

        packed_n, hm_n, plc_n, a = select_step(
            score.T, mask.T.astype(jnp.int32), packed_bl, hm_bl, plc_bl,
            dims_w, dims_d, dims_h)

        if with_logp:
            valid = a >= 0
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(masked, axis=-1),
                jnp.maximum(a, 0)[:, None], axis=-1)[:, 0]
            logp_sum = logp_sum + jnp.where(valid, logp, 0.0)
        rec = RolloutRecord(flags=flags, heightmap=hm_bm,
                            mask=mask, action=a)
        return (packed_n, hm_n, plc_n, a, logp_sum), rec

    import os
    unroll = int(os.environ.get("TAPNET_ROLLOUT_UNROLL", "1"))
    (packed_f, hm_f, plc_f, _, logp_sum), record = jax.lax.scan(
        body, (packed0, hm0, plc0, jnp.full((B,), -1, jnp.int32),
               jnp.zeros(B)), xs, unroll=min(unroll, N))

    states = EnvState(
        heightmap=hm_f.reshape(C, W, D, B).transpose(3, 0, 1, 2),
        packed=packed_f.T.astype(bool),
        placements=plc_f.reshape(N, 6, B).transpose(2, 0, 1),
        t=jnp.sum((record.action >= 0).astype(jnp.int32), axis=0))
    return states, record, logp_sum


def _rollout_record_actorfused(actor_params, instances: Instance, keys,
                               cfg: TAPConfig, hidden, greedy, temperature,
                               dtype, interpret, mesh=None, axis="data",
                               with_logp=True):
    """Whole-decode-step kernel twin of _rollout_record_general: ONE
    ops.pallas_actor_step launch per decode step replaces flags + mask +
    head + sampling + select/place (~30 XLA ops). Only the static
    embedding, the gumbel sweep and the scan skeleton stay in XLA.

    Integer record state (flags, mask, actions given equal logit argmax,
    env updates) is bit-exact vs the general path; logits agree to GEMM
    accumulation-order tolerance (SPEC.md §12)."""
    from tapnet_tpu.ops import pallas_actor_step as AS

    cdt = jnp.dtype(dtype).type
    actor = TAPNetActor(cfg, hidden, dtype=cdt)
    B = instances.dims.shape[0]
    N, W, D, C = (cfg.num_blocks, cfg.target_width, cfg.target_depth,
                  cfg.num_containers)
    R, A = cfg.num_rot, cfg.num_actions
    S = N  # decode steps

    # per-rollout constants. The static embedding is computed TRANSPOSED
    # (embed_static_T: same chain, W^T @ X) so the kernel's [h, T, B]
    # operand is born in its batch-on-lanes layout — transposing the
    # ordinary embed_static output forced XLA into a layout copy worth
    # ~0.9 ms/step at batch 4096 (traced; see ops/pallas_actor_step.py).
    from tapnet_tpu.models.tapnet import embed_static_T

    static = jax.vmap(lambda i: static_tokens(i, cfg))(instances)  # [B, T, 4]
    T = cfg.num_blocks * cfg.num_rot
    static_t4 = static.transpose(1, 0, 2).reshape(T * B, 4).T      # [4, T*B]
    se_htb = embed_static_T(actor_params, static_t4,
                            dtype).reshape(-1, T, B)               # [h, T, B]
    # leading-dims transpose only (B stays the lane dim — cheap copy); the
    # kernel slices se[t] per token, which must be the LEADING axis
    se = jnp.transpose(se_htb, (1, 0, 2))                          # [T, h, B]
    ctx = se_htb.mean(axis=1)                                      # [h, B]
    # statp reuses the already-transposed static_t4 (free reshape): a
    # second [B, T, 4] -> [4, T, B] transpose materialized as a bf16 copy
    # worth 0.64 ms/step in the trace (tiny minor dims copy scalar-ish)
    statp = static_t4.astype(cdt).reshape(4, T, B)                 # [4, T, B]
    statm = static.astype(cdt).mean(axis=1).T                      # [4, B]
    upm, rotm = AS.precedence_bitmasks(instances, cfg)             # [L*N, B]
    fits = AS.fits_planes(instances, cfg)                          # [R*N, B]
    params = AS.head_operands(actor_params, cfg, dtype)

    dims_w = instances.dims[:, :, 0].T.astype(jnp.int32)           # [N, B]
    dims_d = instances.dims[:, :, 1].T.astype(jnp.int32)
    dims_h = instances.dims[:, :, 2].T.astype(jnp.int32)
    states0 = jax.vmap(lambda i: E.reset(i, cfg))(instances)
    packed0 = states0.packed.T.astype(jnp.int32)
    hm0 = jnp.zeros((C * W, D, B), jnp.int32)
    plc0 = jnp.full((N * 6, B), -1, jnp.int32)

    tfs = (jnp.arange(S, dtype=jnp.float32) / S).reshape(S, 1, 1)
    g_all = (jnp.zeros((S, A, B)) if greedy
             else jnp.swapaxes(_gumbel_all(keys, cfg), 1, 2))      # [S, A, B]

    step_fn = functools.partial(AS.actor_select_step, cfg=cfg,
                                temperature=temperature, dtype=dtype,
                                interpret=interpret)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        bl = lambda nd: P(*([None] * (nd - 1)), axis)   # batch-last operand
        rep = lambda x: P(*([None] * x.ndim))
        step_fn = jax.shard_map(
            step_fn, mesh=mesh,
            in_specs=(rep(tfs[0]), bl(2), bl(3), bl(2), bl(2),
                      bl(2), bl(2), bl(2), bl(2), bl(2), bl(2), bl(2),
                      bl(3), bl(2), bl(3), bl(2),
                      tuple(rep(p) for p in params)),
            out_specs=(bl(2), bl(3), bl(2), bl(1), bl(2), bl(2), bl(2),
                       bl(1)),
            check_vma=False)

    def body(carry, x):
        tf_x, g = x
        packed_bl, hm_bl, plc_bl, prev, logp_sum = carry
        rec_hm = hm_bl                                   # pre-step state
        packed_n, hm_n, plc_n, a, flags, mask, logits, lp = step_fn(
            tf_x, packed_bl, hm_bl, plc_bl, prev, dims_w, dims_d, dims_h,
            upm, rotm, fits, g, se, ctx, statp, statm, params)
        if with_logp:
            # log pi of the chosen action comes straight from the kernel
            # (same shifted-softmax formula as the XLA path, already zero
            # at invalid steps) — the XLA log_softmax over [A, B] this
            # replaced was the only with_logp cost
            logp_sum = logp_sum + lp
        return ((packed_n, hm_n, plc_n, a[None], logp_sum),
                (flags, rec_hm, mask, a))

    import os
    unroll = int(os.environ.get("TAPNET_ROLLOUT_UNROLL", "1"))
    carry0 = (packed0, hm0, plc0, jnp.full((1, B), -1, jnp.int32),
              jnp.zeros(B))
    (packed_f, hm_f, plc_f, _, logp_sum), ys = jax.lax.scan(
        body, carry0, (tfs, g_all), unroll=min(unroll, S))
    flags_y, hms_y, masks_y, acts = ys

    record = RolloutRecord(
        flags=jnp.swapaxes(flags_y, 1, 2).astype(jnp.uint8),   # [S, B, N]
        heightmap=hms_y.reshape(S, C, W, D, B).transpose(0, 4, 1, 2, 3),
        mask=jnp.swapaxes(masks_y, 1, 2).astype(bool),         # [S, B, A]
        action=acts)                                           # [S, B]
    states = EnvState(
        heightmap=hm_f.reshape(C, W, D, B).transpose(3, 0, 1, 2),
        packed=packed_f.T.astype(bool),
        placements=plc_f.reshape(N, 6, B).transpose(2, 0, 1),
        t=jnp.sum((acts >= 0).astype(jnp.int32), axis=0))
    return states, record, logp_sum


def _replay_logp_kernel(actor_params, instances: Instance,
                        record: RolloutRecord, cfg: TAPConfig, hidden,
                        temperature, dtype, interpret=False, logp0=None):
    """Pallas custom-VJP replay (ops.pallas_replay): forward logp + hand-
    derived backward in two kernel launches; the only XLA-differentiated
    remnants are the embed_static_T chain and head_operands casts, whose
    backwards are a handful of well-shaped GEMMs."""
    from tapnet_tpu.models.tapnet import embed_static_T
    from tapnet_tpu.ops import pallas_actor_step as AS
    from tapnet_tpu.ops.pallas_replay import replay_logp_fused

    cdt = jnp.dtype(dtype).type
    B = record.action.shape[1]
    N, W, D, C = (cfg.num_blocks, cfg.target_width, cfg.target_depth,
                  cfg.num_containers)
    T = N * cfg.num_rot

    static = jax.vmap(lambda i: static_tokens(i, cfg))(instances)  # [B, T, 4]
    static_t4 = static.transpose(1, 0, 2).reshape(T * B, 4).T      # [4, T*B]
    se_htb = embed_static_T(actor_params, static_t4,
                            dtype).reshape(-1, T, B)               # [h, T, B]
    se = jnp.transpose(se_htb, (1, 0, 2))                          # [T, h, B]
    ctx = se_htb.mean(axis=1)                                      # [h, B]
    statp = static_t4.astype(cdt).reshape(4, T, B)
    statm = static.astype(cdt).mean(axis=1).T
    params = AS.head_operands(actor_params, cfg, dtype)

    flags = jnp.swapaxes(record.flags.astype(jnp.int32), 1, 2)     # [S, N, B]
    hms = record.heightmap.transpose(0, 2, 3, 4, 1).reshape(
        N, C * W, D, B)                                            # batch-last
    # the RECORDED mask, batch-last — bit-exact rollout output, valid for
    # every config (finite-height masks cannot be rebuilt from flags); in
    # the kernel-rollout train step this transpose cancels against the
    # record's own (same jit)
    masks = jnp.swapaxes(record.mask, 1, 2).astype(jnp.int32)      # [S, A, B]
    prev = jnp.concatenate([jnp.full((1, B), -1, jnp.int32),
                            record.action[:-1]], axis=0)           # [S, B]
    statics = (cfg, float(temperature), jnp.dtype(dtype).name,
               bool(interpret), logp0 is not None)
    return replay_logp_fused(
        statics, (params, se, ctx),
        (flags, hms, masks, record.action, prev, statp, statm,
         jnp.zeros((B,), jnp.float32) if logp0 is None
         else jax.lax.stop_gradient(logp0)))


def replay_logp_sum(actor_params, instances: Instance, record: RolloutRecord,
                    cfg: TAPConfig, hidden: int = 128,
                    temperature: float = 1.0, dtype=jnp.float32,
                    chunk: int = 0, windowed: bool = None,
                    kernel=None, interpret: bool = False, logp0=None):
    """Differentiable sum_t log pi(a_t | s_t) recomputed in parallel.

    All N decode steps of all B instances batch into MXU-shaped forwards:
    the gradient graph contains no per-decode-step recurrence.

    chunk: process the decode-step axis in rematerialized chunks of this
    many steps (0 = auto: keep ≤ ~40960 decode rows live at once). The
    replay activations are O(chunk*B*T*hidden); without chunking a 50-block
    rolling config at batch 4096 materializes ~5 GB of bf16 activations and
    OOMs a 16 GB chip. jax.checkpoint recomputes each chunk's forward in
    the backward pass, so peak memory is one chunk instead of N steps.

    windowed (auto: on for rolling unbounded-height configs when the
    Pallas replay is unavailable): replay only the <=window observable
    (block, rot) tokens per decode row instead of all N*R — see
    _replay_logp_windowed. For the 50-block/window-10 driver config this
    cuts replay bytes and FLOPs ~5x vs the general XLA replay. On TPU the
    step-grid replay KERNEL takes precedence for rolling too (round 5):
    it scores all N*R tokens but keeps every head activation in VMEM, so
    it beats the windowed XLA pass despite the 5x token work — the window
    enters only through recorded flag bit 3 + logit masking, which
    reproduces the windowed softmax exactly (exp(-1e9 - max) == 0).
    """
    if kernel is None and windowed is None:
        import os

        from tapnet_tpu.ops import pallas_replay as PR
        if (PR.eligible(cfg) and record.action.shape[1] % 128 == 0
                and jax.default_backend() == "tpu"
                and os.environ.get("TAPNET_REPLAY_KERNEL", "1") != "0"):
            kernel = True
    if kernel:
        return _replay_logp_kernel(actor_params, instances, record, cfg,
                                   hidden, temperature, dtype, interpret,
                                   logp0=logp0)
    if windowed is None:
        windowed = 0 < cfg.window < cfg.num_blocks and cfg.target_height == 0
    if windowed:
        assert cfg.window > 0, "windowed replay needs a rolling window"
        assert cfg.target_height == 0, "windowed replay rebuilds the mask " \
            "from flags; finite-height masks need the recorded candidates"
        return _replay_logp_windowed(actor_params, instances, record, cfg,
                                     hidden, temperature, dtype, chunk)
    actor = TAPNetActor(cfg, hidden, dtype=jnp.dtype(dtype).type)
    N = cfg.num_blocks
    B = record.action.shape[1]
    if chunk <= 0:
        chunk = max(1, min(N, 40960 // max(B, 1)))
    # chunk must divide N for a clean scan; shrink to the largest divisor
    while N % chunk:
        chunk -= 1

    static = jax.vmap(lambda i: static_tokens(i, cfg))(instances)  # [B, T, F]
    static_emb = actor.apply(actor_params, static,
                             method=TAPNetActor.embed_static)      # [B, T, h]

    ts = jnp.arange(N, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,) + record.action.shape[1:], -1,
                                     jnp.int32), record.action[:-1]], axis=0)

    def head_one(se, dy, hg, pa):
        return actor.apply(actor_params, se, dy, hg, pa,
                           method=TAPNetActor.head)

    def logp_steps(se_emb, flags_c, hm_c, mask_c, act_c, prev_c, ts_c):
        """logp for a [K, B, ...] slab of decode steps; returns [K, B].

        Dynamic tokens come straight from the recorded uint8 bit flags —
        elementwise expansion, no dependency-graph or window recompute.

        The [K, B] leading axes are kept as separate batch dims (nested
        vmap) rather than flattened to [K*B]: under a data-sharded mesh a
        K-major reshape would interleave the sharded B axis and force XLA
        to all-gather the whole replay record to every device (caught by
        tests/test_parallel.py::test_hlo_collective_audit_train_step)."""
        K = ts_c.shape[0]
        if cfg.target_height == 0:
            # the mask is a pure function of (flags, static dims) for
            # unbounded-height configs; rebuilding it here lets XLA drop
            # the recorded [N, B, A] mask from the replay working set
            mask_c = mask_from_flags(flags_c, instances, cfg)
        dynamic = merge_tokens(static, tokens_from_flags(
            flags_c, ts_c[:, None].astype(jnp.float32) / cfg.num_blocks,
            cfg))                                             # [K, B, T, F]
        hmg = heightmap_grid(hm_c, cfg)                       # [K,B,C,W,D,1]
        se_nb = jnp.broadcast_to(se_emb[None], (K,) + se_emb.shape)
        logits = jax.vmap(jax.vmap(head_one))(se_nb, dynamic, hmg,
                                              prev_c)         # [K, B, A]
        masked = _masked_logits(logits, mask_c, temperature)
        # one-hot masked sum, NOT take_along_axis: the per-row dynamic
        # gather of [K*B] short rows lowered to a serialized fusion worth
        # ~0.5 ms/step on the 2d-basic trace (the same cliff the windowed
        # replay hit in round 4); the compare+select+reduce is pure VPU
        lsm = jax.nn.log_softmax(masked, axis=-1)
        onehot = (jnp.maximum(act_c, 0)[..., None]
                  == jnp.arange(masked.shape[-1], dtype=jnp.int32))
        lp = jnp.sum(jnp.where(onehot, lsm, 0.0), axis=-1)
        return jnp.where(act_c >= 0, lp, 0.0)

    if chunk >= N:
        return logp_steps(static_emb, record.flags, record.heightmap,
                          record.mask, record.action, prev, ts).sum(axis=0)

    nchunks = N // chunk
    resh = lambda x: x.reshape((nchunks, chunk) + x.shape[1:])
    xs = (resh(record.flags), resh(record.heightmap), resh(record.mask),
          resh(record.action), resh(prev), resh(ts))
    ck = jax.checkpoint(
        lambda se, args: logp_steps(se, *args).sum(axis=0))

    def body(acc, args):
        return acc + ck(static_emb, args), None

    total, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32), xs)
    return total


def _replay_logp_windowed(actor_params, instances: Instance,
                          record: RolloutRecord, cfg: TAPConfig, hidden,
                          temperature, dtype, chunk: int = 0):
    """Windowed replay: per decode row, gather the <=window observable
    blocks and compute logits for those tokens only.

    Correctness: every action outside the window is masked to -1e9, and
    exp(-1e9 - max) == 0 exactly in float32, so the full-softmax logp equals
    the softmax over the window candidates alone. The only full-token-set
    quantities the head consumes are its context summaries (mean static
    embedding, mean merged token); the first is per-instance, the second is
    exact bit-count arithmetic over the recorded flags (integer sums / T).

    EVERY gather here is expressed as a one-hot contraction (einsum) or a
    masked reduction, never as take_along_axis: TPU lowers per-row dynamic
    gathers of short rows to scalar index loops — a profiled first cut
    spent 16-25 ms PER GATHER on [K*B*Kw]-row take_along_axis calls
    (runs/trace_r4 evidence), more than the entire tensor math. One-hot
    contractions ride the MXU/VPU in both directions (the backward of the
    static-embedding gather is a GEMM, not a serialized scatter-add).
    """
    actor = TAPNetActor(cfg, hidden, dtype=jnp.dtype(dtype).type)
    cdt = jnp.dtype(dtype).type
    N, R, C, Kw = (cfg.num_blocks, cfg.num_rot, cfg.num_containers,
                   cfg.window)
    B = record.action.shape[1]
    h = hidden
    if chunk <= 0:
        import os
        chunk = int(os.environ.get("TAPNET_REPLAY_CHUNK", "0"))
    if chunk <= 0:
        # single-slab when the rematerialized activations fit comfortably
        # (~6 tensors of [B, N, Kw*R, h] compute-dtype each — measured 11%
        # faster than 2-way batch chunking for the rolling driver config);
        # the 8 GB estimate threshold leaves ~half a 16 GB chip for
        # everything else; past it, chunk the batch axis so one chunk's
        # rematerialized slab is ~1 GB (ADVICE r4: threshold and chunk
        # budget are intentionally different numbers)
        est = B * N * Kw * R * h * jnp.dtype(dtype).itemsize * 6
        chunk = N if est <= 8e9 else max(1, min(N, 163840 // max(B, 1)))
    while N % chunk:
        chunk -= 1

    static = jax.vmap(lambda i: static_tokens(i, cfg))(instances)  # [B, T, 4]
    static_emb = actor.apply(actor_params, static,
                             method=TAPNetActor.embed_static)      # [B, T, h]
    ctx = static_emb.mean(axis=1)                                  # [B, h]
    stat_mean = static.astype(cdt).mean(axis=1)                    # [B, 4]
    se_bn = static_emb.reshape(B, N, R * h)
    # cdt static features: merged is cast to cdt below, and one-hot gather
    # of pre-rounded values equals rounding the f32 gather
    static_bn = static.astype(cdt).reshape(B, N, R * 4)
    dims = instances.dims.astype(jnp.int32)                        # [B, N, 3]

    # per-rotation geometric fits are STATIC per instance — precompute once
    # so the per-chunk mask needs no dims gather at all
    fits_pre = []                                                  # R x [B,N]
    for r in range(cfg.num_rot):
        d = dims
        if r == 1:
            ax0, ax1 = cfg.rot_axes
            perm = [ax1 if k == ax0 else ax0 if k == ax1 else k
                    for k in range(3)]
            d = d[..., jnp.array(perm)]
        fits_pre.append(((d[..., 0] <= cfg.target_width)
                         & (d[..., 1] <= cfg.target_depth))
                        .astype(cdt))

    ts = jnp.arange(N, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,) + record.action.shape[1:], -1,
                                     jnp.int32), record.action[:-1]], axis=0)
    act = record.action

    # ---- windowed PLAN: every non-differentiable per-step tensor, computed
    # once for ALL N steps up front. Under jax.checkpoint the chunk body is
    # re-executed during the backward pass, so int plumbing placed inside it
    # runs twice and stays trapped in the while loop; here it runs once and
    # XLA fuses it across the whole [N] axis. The body below is pure tensor
    # math: one-hot rebuild + gather GEMM + head + masked log-softmax.
    f = record.flags.astype(jnp.int32)                 # [N, B, Nb]
    win, rank, onehot, validw = _window_onehot(f, Kw)  # oh [N, B, Kw, Nb]
    # compute-dtype one-hot: a one-hot dot has exactly one nonzero term,
    # so bf16 accumulation is still exact (and halves the oh bytes)
    ohc = onehot.astype(cdt)
    # compact index form for the body's one-hot rebuild (4 MB, not 400)
    bidx = (onehot * jnp.arange(N, dtype=jnp.int32)).sum(-1)   # [N, B, Kw]

    # recorded-flag / instance-constant gathers as one-hot contractions at
    # precision="highest" (default matmul precision bf16-truncates the
    # VALUE operand — see _make_windowed_head); take_along_axis is banned
    # here: TPU lowers short-row dynamic gathers to scalar loops that cost
    # more than all the tensor math combined (16-25 ms each, traced)
    hi = "highest"
    gf = jnp.einsum("sbwn,sbn->sbw", ohc,
                    f.astype(cdt), precision=hi).astype(jnp.int32)
    static_g = jnp.einsum("sbwn,bnf->sbwf", ohc, static_bn,
                          precision=hi)                       # [N,B,Kw,R*4]

    dyn_g = tokens_from_flags(
        gf, ts[:, None].astype(jnp.float32) / N, cfg)  # [N, B, Kw*R, 4]
    merged = jnp.concatenate(
        [dyn_g, static_g.reshape(N, B, Kw * R, 4)],
        axis=-1).astype(cdt)                           # [N, B, Kw*R, 8]

    # candidate mask (mask_from_flags restricted to the gathered set): win
    # bit is true by construction for valid rows; padding rows are forced
    # infeasible via validw; geometric fits precomputed per instance
    accr_g = ((gf >> 2) & 1).astype(bool)
    per_rot = []
    for r in range(cfg.num_rot):
        fits = jnp.einsum("sbwn,bn->sbw", ohc, fits_pre[r],
                          precision=hi) > 0.5
        ok = validw if r == 0 else (validw & accr_g)
        per_rot.append(ok & fits)
    mask_g = jnp.broadcast_to(
        jnp.stack(per_rot, axis=-1)[..., None],
        (N, B, Kw, cfg.num_rot, C)).reshape(N, B, Kw * R * C)

    # exact context summaries from bit counts (shared with the rollout head)
    dsum = _window_dsum(f, win, ts[:, None].astype(jnp.float32) / N,
                        stat_mean[None], cfg, cdt)     # [N, B, 8]

    # position of the chosen action among the window candidates
    rc = cfg.num_rot * C
    blk = jnp.clip(act, 0) // rc
    rank_a = jnp.sum(jnp.where(
        blk[..., None] == jnp.arange(N, dtype=jnp.int32), rank, 0),
        axis=-1)                                       # [N, B]
    pos = jnp.clip(rank_a * rc + jnp.clip(act, 0) % rc, 0, Kw * R * C - 1)

    def head_one(se, dy, hg, pa, cx, ds):
        return actor.apply(actor_params, se, dy, hg, pa, cx, ds,
                           method=TAPNetActor.head_ctx)

    # ---- BATCH-major evaluation. The record and plan are step-major
    # ([N, B, ...], scan-stacked); the one-hot gather dot wants its batch
    # dimension LEADING on both operands (else XLA inserts ~0.5 GB layout
    # copies around every [S*Kw, N] x [N, R*h] GEMM — traced at ~14 ms of
    # the round-4 first cut). Plan outputs are small (<= 65 MB), so
    # transposing THEM is cheap, and the big tensors (one-hot, gathered
    # embeddings, tanh activations) are then BORN in dot-friendly layout.
    # Rematerialization chunks the BATCH axis (not steps): each chunk is a
    # full [Bc, N] slab, so the gather stays one well-shaped GEMM per
    # instance.
    bmaj = lambda x: jnp.swapaxes(x, 0, 1)
    plan = tuple(bmaj(x) for x in (bidx, validw, merged, mask_g, dsum,
                                   record.heightmap, prev, pos, act))

    def logp_rows(se_bn_c, ctx_c, bidx_c, validw_c, merged_c, mask_c,
                  dsum_c, hm_c, prev_c, pos_c, act_c):
        """logp for a [Bc, N, ...] slab of instances; returns [Bc]."""
        Bc = bidx_c.shape[0]
        # one-hot rebuild from the compact plan (cheap compare — rebuilt
        # rather than stored: [B, N, Kw, Nb] in bf16 would be 400 MB of xs)
        oh = ((bidx_c[..., None] == jnp.arange(N, dtype=jnp.int32))
              & validw_c[..., None]).astype(se_bn_c.dtype)  # [Bc,S,Kw,Nb]
        # differentiable gather of static embeddings: one-hot GEMM (exact
        # at precision="highest" — each output row is 1.0 * one input row;
        # backward is a GEMM too)
        se_g = jnp.einsum("bswn,bnf->bswf", oh, se_bn_c,
                          precision="highest").reshape(Bc, N, Kw * R, h)
        hmg = heightmap_grid(hm_c, cfg)                # [Bc, S, C, W, D, 1]
        ctx_ns = jnp.broadcast_to(ctx_c[:, None], (Bc, N) + ctx_c.shape[1:])
        scores = jax.vmap(jax.vmap(head_one))(
            se_g, merged_c, hmg, prev_c, ctx_ns, dsum_c)  # [Bc,S,Kw*R*C]
        masked = _masked_logits(scores, mask_c, temperature)
        logp_all = jax.nn.log_softmax(masked, axis=-1)
        lp = jnp.sum(jnp.where(
            pos_c[..., None] == jnp.arange(Kw * R * C, dtype=jnp.int32),
            logp_all, 0.0), axis=-1)                   # [Bc, S]
        return jnp.where(act_c >= 0, lp, 0.0).sum(axis=1)

    # batch-chunk so one chunk's rematerialized activations stay ~1 GB
    # (`chunk` counts decode rows as before: Bc = chunk_rows / N)
    bc = max(1, (chunk * B // N) if chunk < N else B)
    while B % bc:
        bc -= 1
    if bc >= B:
        return logp_rows(se_bn, ctx, *plan)

    nchunks = B // bc
    resh = lambda x: x.reshape((nchunks, bc) + x.shape[1:])
    xs = tuple(resh(x) for x in (se_bn, ctx) + plan)
    ck = jax.checkpoint(lambda args: logp_rows(*args))

    def body(_, args):
        return None, ck(args)

    _, lp = jax.lax.scan(body, None, xs)
    return lp.reshape(B)


# ------------------------------------------------------------------ #
# stable public API (eval / inference / tests)

def policy_rollout(actor_params, instance: Instance, key, cfg: TAPConfig,
                   hidden: int = 128, greedy: bool = False,
                   temperature: float = 1.0, with_reward: bool = True):
    """Roll ONE instance with the actor; returns (state, actions, R, logp)."""
    instances = jax.tree.map(lambda x: x[None], instance)
    states, record, logp = rollout_batch_record(
        actor_params, instances, key[None], cfg, hidden, greedy, temperature)
    state = jax.tree.map(lambda x: x[0], states)
    actions = record.action[:, 0]
    R = E.reward(state, instance, cfg) if with_reward else jnp.float32(0.0)
    return state, actions, R, logp[0]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "hidden", "greedy", "temperature"))
def policy_rollout_batch(actor_params, instances: Instance, keys,
                         cfg: TAPConfig, hidden: int = 128,
                         greedy: bool = False, temperature: float = 1.0):
    """Batched (states, actions [B, N], rewards [B], logp_sum [B])."""
    states, record, logp = rollout_batch_record(
        actor_params, instances, keys, cfg, hidden, greedy, temperature)
    rewards = jax.vmap(lambda s, i: E.reward(s, i, cfg))(states, instances)
    return states, record.action.T, rewards, logp


@functools.partial(jax.jit,
                   static_argnames=("cfg", "hidden", "n_samples",
                                    "temperature"))
def policy_rollout_best_of(actor_params, instances: Instance, key,
                           cfg: TAPConfig, hidden: int = 128,
                           n_samples: int = 16, temperature: float = 1.0):
    """Best-of-K sampled decode: K independent sampled rollouts per instance
    in ONE batched program, keeping the best-reward trajectory of each.

    A TPU-natively cheap capability the reference's greedy-only eval never
    had (VERDICT r4 item 5): the rollout is embarrassingly parallel over
    instances, so K samples are just a K-times-wider batch riding the same
    fused kernels — at batch 256 x K=16 that is one 4096-row rollout, the
    bench's standard shape. Returns (states, actions [B, N], rewards [B])
    of the per-instance argmax-reward sample.
    """
    B = instances.dims.shape[0]
    K = n_samples
    rep = jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), instances)
    keys = jax.random.split(key, B * K)
    states, record, _ = rollout_batch_record(
        actor_params, rep, keys, cfg, hidden, greedy=False,
        temperature=temperature, with_logp=False)
    rewards = jax.vmap(lambda s, i: E.reward(s, i, cfg))(states, rep)
    best = jnp.argmax(rewards.reshape(B, K), axis=1)          # [B]
    rows = jnp.arange(B, dtype=jnp.int32) * K + best
    states_b = jax.tree.map(lambda x: x[rows], states)
    actions_b = record.action.T[rows]
    return states_b, actions_b, rewards.reshape(B, K)[jnp.arange(B), best]
