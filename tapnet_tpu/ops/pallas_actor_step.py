"""Fused ACTOR-HEAD decode-step kernel: the whole per-step policy in one launch.

The per-step select+place kernel (`pallas_policy_step.py`) removed the env
half of the learned-rollout decode step; the actor half — dynamic flags,
feasibility mask, the pointer head's GEMMs/attention, masked Gumbel argmax —
still ran as ~30 small XLA ops per step, and PERF.md §3 shows the 2d-basic
train step is LATENCY-bound on exactly that op stream (no op >5%, ~3x from
its bandwidth light speed). This kernel fuses the entire decode step:

    packed/heightmap state -> accessibility (bitmask precedence) -> flags
    -> mask -> dyn-MLP + heightmap-encoder + prev-embed + query GEMMs
    -> additive pointer attention -> masked logits (+ gumbel) -> argmax
    -> select/place (shared `pallas_policy_step.select_place` body)

one `pallas_call` per decode step. EVERYTHING inside stays batch-on-lanes
([state, B] — the layout of every env kernel here): the head's GEMMs run
transposed (W^T @ X with the batch as the GEMM N dimension), so the float
path needs ZERO in-kernel transposes and meets the integer env math in its
native layout. Three alternatives were built and traced first: producing
the static embedding row-major and transposing outside lost the whole
rollout win to a ~0.9 ms/step XLA layout copy; flipping the head row-major
inside the kernel cost ~2x in small in-kernel transposes; slicing a
[h, T, B] embedding along the middle (sublane) dim per token cost ~2x in
offset relayouts. The winning form keeps the kernel pure batch-on-lanes
with per-token LEADING-dim slices of a [T, h, B] embedding, which
`models.tapnet.embed_static_T` computes transposed in XLA (same chain,
W^T @ X -> [h, T, B]) followed by one lane-preserving leading-dims
transpose.

Exactness contract (SPEC.md §12, two tiers):
- integer state (flags, mask, env updates, placements) is BIT-EXACT vs the
  general path — accessibility/window/fit logic is integer math reproduced
  1:1 (tested in tests/test_actor_step.py);
- float logits follow the same formula with the same rounding points as the
  XLA head (per-layer cast to the compute dtype) but different GEMM /
  LayerNorm accumulation order, so they agree to accumulation-order
  tolerance, not bitwise. In f32 the observed divergence is ~1e-6 relative
  — far below typical gumbel argmax margins — so action sequences match in
  practice and the tests assert action equality PLUS a logit tolerance;
  bf16 rollouts are validated distributionally (SPEC.md §12 /
  scripts/tpu_parity.py).

Coverage: unbounded-height configs with N <= 62 — including ROLLING
(windowed) ones. The precedence graph packs into ceil(N/31) int32 bitmask
limbs per column; the rolling observation window is computed IN-KERNEL as
rank-by-prefix-sum over the accessible frontier, with the prefix sum as a
strictly-lower-triangular [N, N] matmul on the MXU (0/1 operands and
counts < 2^8 are exact in any float pass). The head then scores ALL T
tokens with non-window logits masked to -1e9 — mathematically identical to
the general path's windowed gather+scatter head (exp(-1e9 - max) == 0
exactly, and token scores have no window-slot-rank dependence; see
models/tapnet.py head_ctx) while staying expressible as the leading-dim
slices this layout needs (the per-lane variable-index window gather that
blocked rolling in round 4 is never materialized). Finite-height configs
keep the select_step path (`rollout.py` auto-selects per config).

Reference parity anchor: the decode loop this replaces is SURVEY.md §3.1's
actor-in-the-loop GPU/CPU hot loop (model.py forward + pack.py step per
decode step, unverified names — mount empty)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.ops.pallas_policy_step import select_place

NEG = -1e9


def eligible(cfg: TAPConfig) -> bool:
    """Unbounded height, bitmask-size precedence (<= 2 int32 limbs).

    Rolling windows are handled in-kernel (round 5); only a finite height
    cap — whose mask needs per-action candidate scans — falls back."""
    return cfg.target_height == 0 and cfg.num_blocks <= 62


def _num_limbs(N: int) -> int:
    """31-bit int32 bitmask limbs covering N blocks (sign bit unused)."""
    return (N + 30) // 31


def batch_tile(B: int, T: int = 0, h: int = 0, itemsize: int = 4) -> int:
    """Largest power-of-two batch tile <= TAPNET_ACTOR_BT (default 1024)
    dividing B (B % 128 == 0). The tile bounds per-launch VMEM: blocks are
    double-buffered across grid steps, and the static-embedding block
    [h, T, BT] dominates (~5 MB at T=20/f32/BT=1024). When (T, h) are
    given, the tile also shrinks until the double-buffered embedding block
    fits ~56 MB — the 50-token rolling config at f32 would otherwise hold
    2x26 MB of se blocks alone against the 100 MB budget."""
    import os

    bt = int(os.environ.get("TAPNET_ACTOR_BT", "1024"))
    while bt > 128 and B % bt:
        bt //= 2
    while bt > 128 and T * h * bt * itemsize * 2 > 56e6:
        bt //= 2
    return bt


def head_operands(actor_params, cfg: TAPConfig, dtype):
    """Transpose the actor-head params into the kernel's [out, in] GEMM
    layout (W^T @ X with batch as the GEMM N dim), cast to the compute
    dtype exactly where the flax Dense would. Order matches _kernel's
    parameter refs. These are a few KB; the transposes are trace-time
    noise next to the rollout."""
    cdt = jnp.dtype(dtype).type
    p = actor_params["params"]
    col = lambda b: b.astype(cdt)[:, None]                 # bias -> [out, 1]
    tr = lambda k: k.astype(cdt).T                         # kernel -> [out, in]
    hm = p["hm_enc"]
    return (
        tr(p["dyn_hidden"]["kernel"]), col(p["dyn_hidden"]["bias"]),
        tr(p["dyn_proj"]["kernel"]),
        tr(hm["Dense_0"]["kernel"]), col(hm["Dense_0"]["bias"]),
        tr(hm["Dense_1"]["kernel"]), col(hm["Dense_1"]["bias"]),
        p["prev_embed"]["embedding"].astype(cdt).T,        # [h, A+1]
        tr(p["query"]["kernel"]), col(p["query"]["bias"]),
        p["v"].astype(jnp.float32),                        # [h, 1]
    )


def _kernel(cfg: TAPConfig, h: int, scale: float, temperature: float,
            dtype):
    N, W, D = cfg.num_blocks, cfg.target_width, cfg.target_depth
    R, C = cfg.num_rot, cfg.num_containers
    T, A = N * R, cfg.num_actions
    Kw = cfg.window
    cdt = jnp.dtype(dtype).type
    f32 = jnp.float32
    inv_s = 1.0 / scale

    def kernel(tf_ref, packed_ref, hm_ref, plc_ref, prev_ref,
               dims_w_ref, dims_d_ref, dims_h_ref,
               upm_ref, rotm_ref, fits_ref, g_ref,
               se_ref, ctx_ref, statp_ref, statm_ref,
               w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
               et_ref, wqt_ref, bq_ref, v_ref,
               packed_out, hm_out, plc_out, act_out,
               flags_out, mask_out, logits_out, logp_out):
        BT = packed_ref.shape[1]

        def mm(a, b):  # W^T [out, in] @ X [in, BT], f32 accumulation (MXU)
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=f32)

        # ---- accessibility from bitmask precedence (env.core._accessibility
        # semantics: blocked0[i] = any_j up[j, i] & unpacked[j]) — EXACT.
        # Columns pack into L = ceil(N/31) 31-bit int32 limbs (sign bit
        # unused) so N up to 62 (the rolling config's 50) stays bitmask.
        packed = packed_ref[:]                               # [N, BT] i32
        unpk = 1 - packed
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
        L = _num_limbs(N)
        upm = upm_ref[:]                                     # [L*N, BT]
        rotm = rotm_ref[:]
        blocked0 = jnp.zeros((N, BT), bool)
        blockedr = jnp.zeros((N, BT), bool)
        for limb in range(L):
            in_l = (iota_n >= 31 * limb) & (iota_n < 31 * (limb + 1))
            pw = jnp.where(in_l, jnp.left_shift(
                jnp.int32(1), jnp.clip(iota_n - 31 * limb, 0, 30)), 0)
            ub_l = jnp.sum(unpk * pw, axis=0, keepdims=True)  # [1, BT]
            blocked0 |= (upm[limb * N:(limb + 1) * N] & ub_l) != 0
            blockedr |= (rotm[limb * N:(limb + 1) * N] & ub_l) != 0
        acc0 = (unpk == 1) & ~blocked0
        accr = acc0 & ~blockedr
        acc0_i = acc0.astype(jnp.int32)
        accr_i = accr.astype(jnp.int32)
        if Kw > 0:
            # rolling window: rank-by-prefix-sum over the accessible
            # frontier (features.dynamic_flags: rank[i] = #accessible
            # j < i; win = acc0 & rank < Kw). The strict prefix sum runs
            # as a strictly-lower-triangular [N, N] matmul — 0/1 operands
            # and counts < 2^8 are exact through any MXU pass decomposition.
            r_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
            c_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
            tril = (c_i < r_i).astype(f32)
            rank = mm(tril, acc0_i.astype(f32)).astype(jnp.int32)
            win_i = acc0_i * (rank < Kw).astype(jnp.int32)
        else:
            # window bit == acc0 for window == 0 (features.dynamic_flags)
            win_i = acc0_i
        flags_out[:] = packed + 2 * acc0_i + 4 * accr_i + 8 * win_i

        # ---- feasibility mask, rows in flat (block, rot, container) order
        # (features.mask_from_flags: ok = win [& accr for the rotated copy])
        fits = fits_ref[:]                                   # [R*N, BT] i32
        ok_r = [win_i if r == 0 else win_i * accr_i for r in range(R)]
        mask_rows = []
        for i in range(N):
            for r in range(R):
                row = ok_r[r][i:i + 1] * fits[r * N + i:r * N + i + 1]
                mask_rows.extend([row] * C)
        mask_a = jnp.concatenate(mask_rows, axis=0)          # [A, BT] i32
        mask_out[:] = mask_a

        # ---- exact-count context summary dsum [8, BT] (head's mean merged
        # token: sums of 0/1 flags are exact in f32; statics precomputed)
        tf = tf_ref[0, 0]                                    # f32 scalar
        pk = jnp.sum(packed, axis=0, keepdims=True).astype(f32)
        a0 = jnp.sum(acc0_i, axis=0, keepdims=True).astype(f32)
        ar = jnp.sum(accr_i, axis=0, keepdims=True).astype(f32)
        wn = jnp.sum(win_i, axis=0, keepdims=True).astype(f32)
        acc_mean = (a0 + ar) / f32(T) if R == 2 else a0 / f32(N)
        ones = jnp.ones((1, BT), f32)
        dsum = jnp.concatenate([
            (pk / f32(N)).astype(cdt), acc_mean.astype(cdt),
            (wn / f32(N)).astype(cdt), (ones * tf).astype(cdt),
            statm_ref[:]], axis=0)                           # [8, BT] cdt

        # ---- heightmap encoder per container: flatten x-major + max/mean
        hm_all = hm_ref[:]                                   # [C*W, D, BT]
        hm_encs = []
        for c in range(C):
            hmc = hm_all[c * W:(c + 1) * W]                  # [W, D, BT]
            flat = (hmc[:, 0, :] if D == 1 else
                    jnp.concatenate([hmc[x] for x in range(W)], axis=0))
            xc = (flat.astype(f32) * f32(inv_s)).astype(cdt)  # [W*D, BT]
            mx = jnp.max(xc, axis=0, keepdims=True)
            mn = (jnp.sum(xc.astype(f32), axis=0, keepdims=True)
                  / f32(W * D)).astype(cdt)
            feats = jnp.concatenate([xc, mx, mn], axis=0)    # [W*D+2, BT]
            e1 = jnp.maximum(
                mm(w1t_ref[:], feats).astype(cdt) + b1_ref[:], 0)
            hm_encs.append(mm(w2t_ref[:], e1).astype(cdt) + b2_ref[:])

        # ---- decode-history embedding via one-hot GEMM (index 0 = start)
        idx = jnp.clip(prev_ref[:] + 1, 0, A)                # [1, BT]
        iota_e = jax.lax.broadcasted_iota(jnp.int32, (A + 1, BT), 0)
        prev_emb = mm(et_ref[:], (iota_e == idx).astype(cdt)).astype(cdt)

        # ---- query per container: Dense over [hm, ctx, prev, dsum]
        ctx = ctx_ref[:]                                     # [h, BT] cdt
        qs = []
        for c in range(C):
            qin = jnp.concatenate([hm_encs[c], ctx, prev_emb, dsum], axis=0)
            qs.append(mm(wqt_ref[:], qin).astype(cdt) + bq_ref[:])

        # ---- per-token dyn MLP + additive attention
        # merged token t=(i,r): [packed_i, acc(r), win_i, tf, static4(t)]
        statp = statp_ref[:]                                 # [4, T, BT] cdt
        tf_row = (ones * tf).astype(cdt)
        vvec = v_ref[:].astype(f32)                          # [h, 1]
        pk_c = packed.astype(cdt)
        ac_c = [acc0_i.astype(cdt), accr_i.astype(cdt)]
        wn_c = win_i.astype(cdt)
        # batch the dyn-MLP GEMMs across tokens: one lane-concat of the
        # [8, BT] token inputs (structured copies, no relayout) feeds ONE
        # GEMM pair over [.., T*BT] instead of T tiny pairs; per-column
        # contraction order is identical, so tier-2 semantics are
        # unchanged. dyn comes back to [h, BT] per token via lane-offset
        # slices (free in this layout).
        x_cols = []
        for i in range(N):
            for r in range(R):
                t = i * R + r
                x_cols.append(jnp.concatenate([
                    pk_c[i:i + 1], ac_c[r][i:i + 1], wn_c[i:i + 1],
                    tf_row, statp[:, t]], axis=0))           # [8, BT]
        x_all = jnp.concatenate(x_cols, axis=1)              # [8, T*BT]
        h1_all = jnp.maximum(
            mm(w8t_ref[:], x_all).astype(cdt) + b8_ref[:], 0)
        dyn_all = mm(wpt_ref[:], h1_all).astype(cdt)         # [h, T*BT]
        score_rows = []
        for t in range(T):
            dyn_t = dyn_all[:, t * BT:(t + 1) * BT]          # [h, BT]
            se_t = se_ref[t]                                 # [h, BT]
            for c in range(C):
                act = jnp.tanh(se_t + dyn_t + qs[c])
                # full-precision multiply+reduce over h — the same
                # contraction order as the XLA head's `act @ v`
                # (bit-matched it in the f32 hardware parity run); a
                # default-precision f32 MXU dot here is a bf16-pass
                # decomposition (measured 8.8e-3 logit divergence)
                s_tc = jnp.sum(act.astype(f32) * vvec, axis=0,
                               keepdims=True).astype(cdt).astype(f32)
                score_rows.append(s_tc)
        scores = jnp.concatenate(score_rows, axis=0)         # [A, BT] f32
        logits_out[:] = scores

        masked = jnp.where(mask_a == 1, scores / f32(temperature), f32(NEG))
        p_n, h_n, l_n, a_n = select_place(
            cfg, masked + g_ref[:], mask_a, packed, hm_all, plc_ref[:],
            dims_w_ref[:], dims_d_ref[:], dims_h_ref[:])
        packed_out[:] = p_n
        hm_out[:] = h_n
        plc_out[:] = l_n
        act_out[:] = a_n

        # ---- log pi(a | s) of the chosen action, same shifted-softmax
        # formula as pallas_replay._logp_row / jax.nn.log_softmax: emitting
        # it here makes the rollout's logp stream ~free, which lets the
        # replay custom-VJP skip its forward kernel (the REINFORCE gradient
        # never needs the primal recomputed — see replay_logp_fused)
        mx_l = jnp.max(masked, axis=0, keepdims=True)        # [1, BT]
        e_l = jnp.exp(masked - mx_l)
        s_l = jnp.sum(e_l, axis=0, keepdims=True)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, BT), 0)
        sel = (iota_a == jnp.maximum(a_n, 0)).astype(f32)
        lp = jnp.sum(sel * (masked - mx_l - jnp.log(s_l)), axis=0,
                     keepdims=True)
        logp_out[:] = jnp.where(a_n >= 0, lp, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "temperature", "dtype",
                                             "interpret"))
def actor_select_step(tf, packed, hm, plc, prev, dims_w, dims_d, dims_h,
                      upm, rotm, fits, g, se, ctx, statp, statm, params,
                      cfg: TAPConfig, temperature: float = 1.0,
                      dtype=jnp.float32, interpret: bool = False):
    """One fused actor+select decode step over batch-last state.

    tf f32[1,1] (t/N), packed i32[N,B], hm i32[C*W,D,B], plc i32[N*6,B],
    prev i32[1,B], dims_* i32[N,B], upm/rotm i32[L*N,B] (precedence column
    bitmasks, L = ceil(N/31) limbs), fits i32[R*N,B], g f32[A,B] (gumbel;
    zeros = greedy),
    se cdt[T,h,B] (embed_static_T output, reshaped + leading-dims
    transposed — lane-preserving, so cheap), ctx cdt[h,B],
    statp cdt[4,T,B], statm cdt[4,B],
    params = head_operands(...).

    Returns (packed', hm', plc', action[B], flags i32[N,B], mask i32[A,B],
    logits f32[A,B], logp f32[B] — log pi(action|state), 0 where invalid).
    B must be a multiple of 128.
    """
    assert eligible(cfg)
    from tapnet_tpu.models.features import _scale

    N, W, D, C = (cfg.num_blocks, cfg.target_width, cfg.target_depth,
                  cfg.num_containers)
    R, A = cfg.num_rot, cfg.num_actions
    T = N * R
    h = se.shape[1]
    B = packed.shape[1]
    Lb = _num_limbs(N)
    BT = batch_tile(B, T, h, jnp.dtype(dtype).itemsize)
    assert B % BT == 0, f"batch {B} must be a multiple of 128"

    grid = (B // BT,)
    bspec = lambda *shape: pl.BlockSpec(
        (*shape, BT), lambda i: tuple([0] * len(shape)) + (i,),
        memory_space=pltpu.VMEM)
    full = lambda x: pl.BlockSpec(
        x.shape, lambda i: tuple([0] * x.ndim), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _kernel(cfg, h, _scale(cfg), temperature, dtype),
        grid=grid,
        in_specs=[full(tf), bspec(N), bspec(C * W, D), bspec(N * 6),
                  bspec(1), bspec(N), bspec(N), bspec(N),
                  bspec(Lb * N), bspec(Lb * N), bspec(R * N), bspec(A),
                  bspec(T, h), bspec(h), bspec(4, T), bspec(4)]
                 + [full(p) for p in params],
        out_specs=(bspec(N), bspec(C * W, D), bspec(N * 6), bspec(1),
                   bspec(N), bspec(A), bspec(A), bspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((N, B), jnp.int32),
            jax.ShapeDtypeStruct((C * W, D, B), jnp.int32),
            jax.ShapeDtypeStruct((N * 6, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((N, B), jnp.int32),
            jax.ShapeDtypeStruct((A, B), jnp.int32),
            jax.ShapeDtypeStruct((A, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
        # the default 16 MB scoped-vmem budget rejects the double-buffered
        # [T, h, BT] static-embedding blocks at production batch sizes; the
        # chip has 128 MB of VMEM and this kernel is its only tenant
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20) if not interpret else None,
        interpret=interpret,
    )(tf, packed, hm, plc, prev, dims_w, dims_d, dims_h,
      upm, rotm, fits, g, se, ctx, statp, statm, *params)
    packed_o, hm_o, plc_o, act, flags, mask, logits, logp = outs
    return packed_o, hm_o, plc_o, act[0], flags, mask, logits, logp[0]


def precedence_bitmasks(instances, cfg: TAPConfig):
    """Column bitmasks of the up/rot obstruction graphs, batch-last
    i32[L*N, B] with L = ceil(N/31) 31-bit limbs (sign bit unused):
    upm[l*N + i, b] = sum_{j in limb l} up[b, j, i] << (j - 31l)."""
    N = cfg.num_blocks
    L = _num_limbs(N)
    j = jnp.arange(N, dtype=jnp.int32)

    def limbs(graph):
        g = graph.astype(jnp.int32)                          # [B, j, i]
        rows = []
        for limb in range(L):
            in_l = ((j >= 31 * limb) & (j < 31 * (limb + 1)))
            pw = jnp.where(in_l, jnp.int32(1) << jnp.clip(
                j - 31 * limb, 0, 30), 0)[None, :, None]
            rows.append((g * pw).sum(axis=1).T)              # [N, B]
        return jnp.concatenate(rows, axis=0)                 # [L*N, B]

    return limbs(instances.up), limbs(instances.rot)


def fits_planes(instances, cfg: TAPConfig):
    """Per-rotation geometric target fit, batch-last i32[R*N, B]."""
    rows = []
    for r in range(cfg.num_rot):
        d = instances.dims
        if r == 1:
            ax0, ax1 = cfg.rot_axes
            perm = [ax1 if k == ax0 else ax0 if k == ax1 else k
                    for k in range(3)]
            d = d[..., jnp.array(perm)]
        rows.append(((d[..., 0] <= cfg.target_width)
                     & (d[..., 1] <= cfg.target_depth))
                    .astype(jnp.int32).T)                    # [N, B]
    return jnp.concatenate(rows, axis=0)
