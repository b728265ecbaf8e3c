"""Custom-VJP Pallas replay head: the REINFORCE differentiated pass in two
kernel launches (forward logp + hand-derived backward).

After the fused actor-step kernel took the 2d-basic rollout to ~0.45 ms,
the train step's residual is the REPLAY — recomputing all B*N decode logits
differentiably. In XLA that pass is ~100 small fusions plus layout copies
(~2 ms/step of the 2.76 ms total, traced); here it is ONE forward kernel
(sum_t log pi(a_t|s_t) from the recorded observations) and ONE backward
kernel that recomputes the head per decode step in VMEM and accumulates
parameter gradients on the fly — no saved activations, no HBM intermediates
beyond the record itself.

Layout: identical to ops/pallas_actor_step.py — batch on lanes, W^T @ X
GEMMs, per-token MXU dots (measured ~0.2-0.4 us each inside the actor
kernel). The backward derivation (kernel layout, per decode step k):

    g_scores = d_logp * valid * (onehot(a) - softmax) * mask / temp
    per (t, c):  dpre = (v * g_scores[t*C+c]) * (1 - act^2)
        d_se[t] += dpre;  d_dyn[t] += dpre;  d_q[c] += dpre
    dyn path:  dWp^T += d_dyn @ h1^T ; dh1 = Wp^T^T... (contract over h)
               masked by relu;  dW8^T += dh1 @ x^T ; db8 += sum(dh1)
    query path: dWq^T += d_q @ qin^T ; dqin = contract(Wq^T, d_q)
               -> split into d_hm_enc / d_ctx / d_prev_emb / (dsum: data)
    hm path:   dW2^T, db2, de1 (relu-masked), dW1^T, db1
    prev path: dE^T += d_prev_emb @ onehot_prev^T

Parameter gradients accumulate across the batch grid via revisited output
blocks (TPU grids are sequential); d_se / d_ctx are per-batch outputs that
chain into the XLA backward of `models.tapnet.embed_static_T`.

Gradient semantics: this is a jax.custom_vjp whose value and gradient both
follow the same formula as the XLA replay with different accumulation
order (SPEC.md §12 tier 2); tests/test_pallas_replay.py checks value and
every parameter gradient against jax.grad of the XLA path to f32
tolerance.

Coverage: every UNBOUNDED-height config, including ROLLING (the window
enters replay only through the recorded flag bit 3, which `_head_fwd` has
always consumed — win-masked logits reproduce the windowed-gather softmax
exactly via exp(-1e9 - max) == 0). Two kernel schedules share the math:

- MONOLITHIC (window == 0, N <= 31): the whole S-step loop Python-unrolled
  in one launch per batch tile — S*N <= ~1000 token bodies compile fine
  and it is the proven flagship schedule (2d-basic 20.7M);
- STEP-GRID (rolling / N > 31): grid = (batch tiles, S) with one decode
  step per grid cell — the rolling config's S*N = 2500 token bodies would
  otherwise explode Mosaic compile time and VMEM. TPU grids run the last
  axis innermost and sequentially, so logp / d_se accumulate in VMEM
  scratch across the step axis and the recorded [S, ...] slabs STREAM
  per-step instead of sitting resident.

Reference anchor: the reference's single backward pass over the episode
(SURVEY.md §3.1 REINFORCE update, unverified — mount empty)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tapnet_tpu.config import TAPConfig

NEG = -1e9


def eligible(cfg: TAPConfig) -> bool:
    """Every config (round 5): the feasibility mask rides in as RECORDED
    data ([S, A, B], bit-exact from the rollout) instead of being rebuilt
    from flags + static fits — which a finite height cap would break.
    Window / N / target_height route to a schedule, never out."""
    return True


def _steps_grid(cfg: TAPConfig) -> bool:
    """Use the step-grid schedule when the monolithic unroll would be too
    big (rolling windows ride it too: same math, streaming schedule)."""
    return cfg.window > 0 or cfg.num_blocks > 31


def batch_tile(B: int, T: int, h: int) -> int:
    """Replay batch tile: biggest power-of-2 <= TAPNET_REPLAY_BT (default
    1024) dividing B, shrunk while the VMEM estimate exceeds ~40 MB. The
    backward is the binding constraint: double-buffered se/d_se blocks plus
    the live d_se accumulators and per-step saved activations come to
    ~30 f32 bytes per (token, hidden, lane) element (BT=2048 at T=10
    measured 149 MB > the 128 MB chip — OOM)."""
    import os

    bt = int(os.environ.get("TAPNET_REPLAY_BT", "1024"))
    while bt > 128 and B % bt:
        bt //= 2
    while bt > 128 and T * h * bt * 30 > 40e6:
        bt //= 2
    return bt


def _head_fwd(cfg, h, scale, temperature, dtype, refs, tf, flags_k, prev_row,
              hm_k, mask_k, want_saved=False):
    """Forward head math for one decode step from recorded state; tf is the
    decode-progress scalar t/N (python float in the monolithic kernels,
    traced f32 in the step-grid ones); mask_k i32[A, BT] is the RECORDED
    feasibility mask (bit-exact rollout output — works for finite-height
    configs whose mask cannot be rebuilt from flags). Returns
    (masked_logits [A, BT] f32, mask_f [A, BT] f32, saved dict)."""
    (se_ref, ctx_ref, statp_ref, statm_ref,
     w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
     et_ref, wqt_ref, bq_ref, v_ref) = refs
    N, W, D = cfg.num_blocks, cfg.target_width, cfg.target_depth
    R, C = cfg.num_rot, cfg.num_containers
    T, A = N * R, cfg.num_actions
    cdt = jnp.dtype(dtype).type
    f32 = jnp.float32
    BT = flags_k.shape[1]

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    packed = flags_k & 1                                   # [N, BT] i32
    acc0_i = (flags_k >> 1) & 1
    accr_i = (flags_k >> 2) & 1
    win_i = (flags_k >> 3) & 1

    mask_a = mask_k.astype(f32)                            # [A, BT]

    tf = tf * jnp.ones((), f32) if not isinstance(tf, float) else f32(tf)
    pk = jnp.sum(packed, axis=0, keepdims=True).astype(f32)
    a0 = jnp.sum(acc0_i, axis=0, keepdims=True).astype(f32)
    ar = jnp.sum(accr_i, axis=0, keepdims=True).astype(f32)
    wn = jnp.sum(win_i, axis=0, keepdims=True).astype(f32)
    acc_mean = (a0 + ar) / f32(T) if R == 2 else a0 / f32(N)
    ones = jnp.ones((1, BT), f32)
    dsum = jnp.concatenate([
        (pk / f32(N)).astype(cdt), acc_mean.astype(cdt),
        (wn / f32(N)).astype(cdt), (ones * tf).astype(cdt),
        statm_ref[:]], axis=0)                             # [8, BT] cdt

    hm_encs, hm_saved = [], []
    for c in range(C):
        hmc = hm_k[c * W:(c + 1) * W]
        flat = (hmc[:, 0, :] if D == 1 else
                jnp.concatenate([hmc[x] for x in range(W)], axis=0))
        xc = (flat.astype(f32) * f32(1.0 / scale)).astype(cdt)
        mx = jnp.max(xc, axis=0, keepdims=True)
        mn = (jnp.sum(xc.astype(f32), axis=0, keepdims=True)
              / f32(W * D)).astype(cdt)
        feats = jnp.concatenate([xc, mx, mn], axis=0)      # [G, BT]
        e1 = jnp.maximum(mm(w1t_ref[:], feats).astype(cdt) + b1_ref[:], 0)
        hm_encs.append(mm(w2t_ref[:], e1).astype(cdt) + b2_ref[:])
        hm_saved.append((feats, e1))

    idx = jnp.clip(prev_row + 1, 0, A)                     # [1, BT]
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (A + 1, BT), 0)
    oh_prev = (iota_e == idx).astype(cdt)                  # [A+1, BT]
    prev_emb = mm(et_ref[:], oh_prev).astype(cdt)

    ctx = ctx_ref[:]
    qs, qins = [], []
    for c in range(C):
        qin = jnp.concatenate([hm_encs[c], ctx, prev_emb, dsum], axis=0)
        qs.append(mm(wqt_ref[:], qin).astype(cdt) + bq_ref[:])
        qins.append(qin)

    statp = statp_ref[:]
    tf_row = (ones * tf).astype(cdt)
    vvec = v_ref[:].astype(f32)                            # [h, 1]
    pk_c = packed.astype(cdt)
    ac_c = [acc0_i.astype(cdt), accr_i.astype(cdt)]
    wn_c = win_i.astype(cdt)
    score_rows, tok_saved = [], []
    for i in range(N):
        for r in range(R):
            t = i * R + r
            x_t = jnp.concatenate([
                pk_c[i:i + 1], ac_c[r][i:i + 1], wn_c[i:i + 1],
                tf_row, statp[:, t]], axis=0)              # [8, BT]
            h1 = jnp.maximum(
                mm(w8t_ref[:], x_t).astype(cdt) + b8_ref[:], 0)
            dyn_t = mm(wpt_ref[:], h1).astype(cdt)
            se_t = se_ref[t]
            acts_c = []
            for c in range(C):
                act = jnp.tanh(se_t + dyn_t + qs[c])
                s_tc = jnp.sum(act.astype(f32) * vvec, axis=0,
                               keepdims=True).astype(cdt).astype(f32)
                score_rows.append(s_tc)
                acts_c.append(act if want_saved else None)
            tok_saved.append((x_t, h1, acts_c) if want_saved else None)
    scores = jnp.concatenate(score_rows, axis=0)           # [A, BT] f32
    masked = jnp.where(mask_a == 1, scores / f32(temperature), f32(NEG))
    saved = {"hm": hm_saved, "oh_prev": oh_prev, "qins": qins,
             "tok": tok_saved, "vvec": vvec} if want_saved else None
    return masked, mask_a, saved


def _logp_row(masked, acts_k, A):
    """(lp [1, BT] f32, p [A, BT] f32, onehot, valid) for one decode step."""
    f32 = jnp.float32
    valid = (acts_k >= 0).astype(f32)                      # [1, BT]
    a_idx = jnp.maximum(acts_k, 0)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, masked.shape[1]), 0)
    onehot = (iota_a == a_idx).astype(f32)                 # [A, BT]
    m = jnp.max(masked, axis=0, keepdims=True)
    e = jnp.exp(masked - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    lsm = masked - m - jnp.log(s)
    lp = jnp.sum(onehot * lsm, axis=0, keepdims=True) * valid
    return lp, e / s, onehot, valid


def _fwd_kernel(cfg: TAPConfig, h: int, scale, temperature, dtype):
    S, A = cfg.num_blocks, cfg.num_actions

    def kernel(flags_ref, hms_ref, masks_ref, acts_ref,
               se_ref, ctx_ref, statp_ref, statm_ref,
               w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
               et_ref, wqt_ref, bq_ref, v_ref, logp_out):
        BT = acts_ref.shape[1]
        refs = (se_ref, ctx_ref, statp_ref, statm_ref,
                w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                et_ref, wqt_ref, bq_ref, v_ref)
        lp_sum = jnp.zeros((1, BT), jnp.float32)
        for k in range(S):
            prev_row = (acts_ref[k - 1:k] if k > 0
                        else jnp.full((1, BT), -1, jnp.int32))
            masked, _, _ = _head_fwd(cfg, h, scale, temperature, dtype,
                                     refs, k / S, flags_ref[k], prev_row,
                                     hms_ref[k], masks_ref[k])
            lp, _, _, _ = _logp_row(masked, acts_ref[k:k + 1], A)
            lp_sum = lp_sum + lp
        logp_out[:] = lp_sum

    return kernel


def _bwd_step(cfg: TAPConfig, h, scale, temperature, dtype, refs, wmats,
              tf, flags_k, prev_row, hm_k, mask_k, acts_k, dlp, scr):
    """Backward of ONE replayed decode step (the body both schedules
    share). Mutates the param-gradient VMEM scratches in `scr` — updated
    through memory: a loop-carried `acc = acc + dot(...)` value makes
    Mosaic fuse the add into the dot's accumulator operand, which it only
    supports for constants ("only constant accumulators supported"); a
    load-add-store round-trip does not. Returns the per-step
    (dse deltas list[T] of [h, BT] f32, dctx delta [h, BT] f32), which the
    caller accumulates (in values for the monolithic kernel, in scratch
    for the step-grid one)."""
    N, R, C = cfg.num_blocks, cfg.num_rot, cfg.num_containers
    T, A = N * R, cfg.num_actions
    f32 = jnp.float32
    (dw8t_s, db8_s, dwpt_s, dw1t_s, db1_s,
     dw2t_s, db2_s, det_s, dwqt_s, dbq_s, dv_s) = scr
    wpt, w2t, wqt, vv = wmats
    BT = dlp.shape[1]

    def ct(a, b):  # contract over lanes: [M, BT] x [K, BT] -> [M, K]
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def cth(w, g):  # contract over rows: [h, K] x [h, BT] -> [K, BT]
        return jax.lax.dot_general(w, g, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    masked, mask_f, sv = _head_fwd(cfg, h, scale, temperature, dtype, refs,
                                   tf, flags_k, prev_row, hm_k, mask_k,
                                   want_saved=True)
    _, p, onehot, valid = _logp_row(masked, acts_k, A)

    # d masked = dlp * valid * (onehot - p); d scores through the
    # where(mask)/temp gate
    g_scores = (dlp * valid * (onehot - p)
                * mask_f) * f32(1.0 / temperature)          # [A, BT]

    dse_t = [jnp.zeros((h, BT), f32) for _ in range(T)]
    dctx = jnp.zeros((h, BT), f32)
    dqs = [jnp.zeros((h, BT), f32) for _ in range(C)]
    for i in range(N):
        for r in range(R):
            t = i * R + r
            x_t, h1, acts_c = sv["tok"][t]
            d_dyn = jnp.zeros((h, BT), f32)
            for c in range(C):
                act = acts_c[c].astype(f32)
                ds = g_scores[(t * C + c):(t * C + c + 1)]  # [1, BT]
                dv_s[:] = dv_s[:] + jnp.sum(act * ds, axis=1,
                                            keepdims=True)
                dpre = (vv * ds) * (1.0 - act * act)        # [h, BT]
                dse_t[t] = dse_t[t] + dpre
                d_dyn = d_dyn + dpre
                dqs[c] = dqs[c] + dpre
            h1f = h1.astype(f32)
            dwpt_s[:] = dwpt_s[:] + ct(d_dyn, h1f)
            dh1 = cth(wpt, d_dyn) * (h1f > 0)               # [32, BT]
            dw8t_s[:] = dw8t_s[:] + ct(dh1, x_t.astype(f32))
            db8_s[:] = db8_s[:] + jnp.sum(dh1, axis=1, keepdims=True)

    d_prev = jnp.zeros((h, BT), f32)
    for c in range(C):
        qin = sv["qins"][c].astype(f32)                     # [3h+8, BT]
        dwqt_s[:] = dwqt_s[:] + ct(dqs[c], qin)
        dbq_s[:] = dbq_s[:] + jnp.sum(dqs[c], axis=1, keepdims=True)
        dqin = cth(wqt, dqs[c])                             # [3h+8, BT]
        d_hm = dqin[0:h]
        dctx = dctx + dqin[h:2 * h]
        d_prev = d_prev + dqin[2 * h:3 * h]
        feats, e1 = sv["hm"][c]
        e1f = e1.astype(f32)
        dw2t_s[:] = dw2t_s[:] + ct(d_hm, e1f)
        db2_s[:] = db2_s[:] + jnp.sum(d_hm, axis=1, keepdims=True)
        de1 = cth(w2t, d_hm) * (e1f > 0)
        dw1t_s[:] = dw1t_s[:] + ct(de1, feats.astype(f32))
        db1_s[:] = db1_s[:] + jnp.sum(de1, axis=1, keepdims=True)
    det_s[:] = det_s[:] + ct(d_prev, sv["oh_prev"].astype(f32))
    return dse_t, dctx


def _bwd_kernel(cfg: TAPConfig, h: int, scale, temperature, dtype):
    N, R = cfg.num_blocks, cfg.num_rot
    S, T = N, N * R
    f32 = jnp.float32

    def kernel(dlp_ref, flags_ref, hms_ref, masks_ref, acts_ref,
               se_ref, ctx_ref, statp_ref, statm_ref,
               w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
               et_ref, wqt_ref, bq_ref, v_ref,
               dse_out, dctx_out,
               dw8t_out, db8_out, dwpt_out, dw1t_out, db1_out,
               dw2t_out, db2_out, det_out, dwqt_out, dbq_out, dv_out,
               dw8t_s, db8_s, dwpt_s, dw1t_s, db1_s,
               dw2t_s, db2_s, det_s, dwqt_s, dbq_s, dv_s):
        BT = acts_ref.shape[1]
        refs = (se_ref, ctx_ref, statp_ref, statm_ref,
                w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                et_ref, wqt_ref, bq_ref, v_ref)

        dlp = dlp_ref[:].astype(f32)                       # [1, BT]
        scratches = (dw8t_s, db8_s, dwpt_s, dw1t_s, db1_s,
                     dw2t_s, db2_s, det_s, dwqt_s, dbq_s, dv_s)
        for s in scratches:
            s[:] = jnp.zeros(s.shape, f32)
        dse_t = [jnp.zeros((h, BT), f32) for _ in range(T)]
        dctx = jnp.zeros((h, BT), f32)

        wmats = (wpt_ref[:].astype(f32), w2t_ref[:].astype(f32),
                 wqt_ref[:].astype(f32), v_ref[:].astype(f32))

        for k in range(S):
            prev_row = (acts_ref[k - 1:k] if k > 0
                        else jnp.full((1, BT), -1, jnp.int32))
            dse_d, dctx_d = _bwd_step(
                cfg, h, scale, temperature, dtype, refs, wmats, k / S,
                flags_ref[k], prev_row, hms_ref[k], masks_ref[k],
                acts_ref[k:k + 1], dlp, scratches)
            for t in range(T):
                dse_t[t] = dse_t[t] + dse_d[t]
            dctx = dctx + dctx_d

        for t in range(T):
            dse_out[t] = dse_t[t]
        dctx_out[:] = dctx

        first = pl.program_id(0) == 0
        outs = (dw8t_out, db8_out, dwpt_out, dw1t_out, db1_out,
                dw2t_out, db2_out, det_out, dwqt_out, dbq_out, dv_out)
        for out, s in zip(outs, scratches):
            @pl.when(first)
            def _(out=out, s=s):
                out[:] = s[:]

            @pl.when(jnp.logical_not(first))
            def _(out=out, s=s):
                out[:] = out[:] + s[:]

    return kernel


def batch_tile_steps(B: int, T: int, h: int) -> int:
    """Step-grid batch tile: the recorded [S, ...] slabs STREAM one decode
    step per grid cell, so only the per-cell working set binds — the d_se
    accumulator scratch, the per-step saved token activations and the
    (double-buffered) se / d_se blocks, ~5 f32 tensors of [T, h, BT].
    Default 512 (TAPNET_REPLAY_STEPS_BT overrides), shrunk while the
    estimated backward working set — d_se scratch (f32) + d_se output
    block (f32) + se block (cdt) + saved tanh activations (cdt), ~12 bytes
    per (token, hidden, lane) — exceeds ~60 MB. The rolling driver config
    (T=100, h=128) lands on BT=256; 128 was measured 1.5x slower (2x the
    grid cells, same math)."""
    import os

    bt = int(os.environ.get("TAPNET_REPLAY_STEPS_BT", "512"))
    while bt > 128 and B % bt:
        bt //= 2
    while bt > 128 and T * h * bt * 12 > 60e6:
        bt //= 2
    return bt


def _fwd_kernel_steps(cfg: TAPConfig, h: int, scale, temperature, dtype):
    S, A = cfg.num_blocks, cfg.num_actions
    f32 = jnp.float32

    def kernel(flags_ref, hms_ref, masks_ref, acts_ref, prev_ref,
               se_ref, ctx_ref, statp_ref, statm_ref,
               w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
               et_ref, wqt_ref, bq_ref, v_ref, logp_out, lp_s):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            lp_s[:] = jnp.zeros(lp_s.shape, f32)

        refs = (se_ref, ctx_ref, statp_ref, statm_ref,
                w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                et_ref, wqt_ref, bq_ref, v_ref)
        tf = k.astype(f32) / f32(S)
        # acts/prev ride as [S, 1, B] so their (1, BT) step blocks satisfy
        # Mosaic's last-two-dims rule (1 == the array's own middle dim)
        masked, _, _ = _head_fwd(cfg, h, scale, temperature, dtype, refs,
                                 tf, flags_ref[0], prev_ref[0], hms_ref[0],
                                 masks_ref[0])
        lp, _, _, _ = _logp_row(masked, acts_ref[0], A)
        lp_s[:] = lp_s[:] + lp

        @pl.when(k == S - 1)
        def _():
            logp_out[:] = lp_s[:]

    return kernel


def _bwd_kernel_steps(cfg: TAPConfig, h: int, scale, temperature, dtype,
                      nb: int):
    """Step-grid backward: one decode step per grid cell. d_se / d_ctx
    accumulate in VMEM scratch across the (sequential, innermost) step
    axis and flush to their batch-tile output blocks at the last step;
    param gradients accumulate across the WHOLE grid and flush once at
    the final cell (nb = number of batch tiles)."""
    N, R = cfg.num_blocks, cfg.num_rot
    S, T = N, N * R
    f32 = jnp.float32

    def kernel(dlp_ref, flags_ref, hms_ref, masks_ref, acts_ref, prev_ref,
               se_ref, ctx_ref, statp_ref, statm_ref,
               w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
               et_ref, wqt_ref, bq_ref, v_ref,
               dse_out, dctx_out,
               dw8t_out, db8_out, dwpt_out, dw1t_out, db1_out,
               dw2t_out, db2_out, det_out, dwqt_out, dbq_out, dv_out,
               dw8t_s, db8_s, dwpt_s, dw1t_s, db1_s,
               dw2t_s, db2_s, det_s, dwqt_s, dbq_s, dv_s,
               dse_s, dctx_s):
        b = pl.program_id(0)
        k = pl.program_id(1)
        refs = (se_ref, ctx_ref, statp_ref, statm_ref,
                w8t_ref, b8_ref, wpt_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                et_ref, wqt_ref, bq_ref, v_ref)
        scratches = (dw8t_s, db8_s, dwpt_s, dw1t_s, db1_s,
                     dw2t_s, db2_s, det_s, dwqt_s, dbq_s, dv_s)

        @pl.when((b == 0) & (k == 0))
        def _():
            for s in scratches:
                s[:] = jnp.zeros(s.shape, f32)

        @pl.when(k == 0)
        def _():
            dse_s[:] = jnp.zeros(dse_s.shape, f32)
            dctx_s[:] = jnp.zeros(dctx_s.shape, f32)

        wmats = (wpt_ref[:].astype(f32), w2t_ref[:].astype(f32),
                 wqt_ref[:].astype(f32), v_ref[:].astype(f32))
        dlp = dlp_ref[:].astype(f32)
        tf = k.astype(f32) / f32(S)
        dse_d, dctx_d = _bwd_step(cfg, h, scale, temperature, dtype, refs,
                                  wmats, tf, flags_ref[0], prev_ref[0],
                                  hms_ref[0], masks_ref[0], acts_ref[0],
                                  dlp, scratches)
        for t in range(T):
            dse_s[t] = dse_s[t] + dse_d[t]
        dctx_s[:] = dctx_s[:] + dctx_d

        @pl.when(k == S - 1)
        def _():
            dse_out[:] = dse_s[:]
            dctx_out[:] = dctx_s[:]

        outs = (dw8t_out, db8_out, dwpt_out, dw1t_out, db1_out,
                dw2t_out, db2_out, det_out, dwqt_out, dbq_out, dv_out)

        @pl.when((b == nb - 1) & (k == S - 1))
        def _():
            for out, s in zip(outs, scratches):
                out[:] = s[:]

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def replay_logp_fused(statics, diff, data):
    """sum_t log pi(a_t|s_t) via the Pallas replay kernels.

    statics: hashable (cfg, temperature, dtype_name, interpret, use_primal)
    diff:    (params_tuple, se [T,h,B] cdt, ctx [h,B] cdt) — differentiable
    data:    (flags i32[S,N,B], hms i32[S,C*W,D,B],
              masks i32[S,A,B] (the RECORDED feasibility mask — valid for
              every config incl. finite-height, whose mask cannot be
              rebuilt from flags),
              acts i32[S,B], prev i32[S,B] (acts shifted; row 0 = -1),
              statp cdt[4,T,B], statm cdt[4,B],
              logp0 f32[B] — precomputed primal, zeros when unused)
    Returns logp f32[B]. Schedule (monolithic vs step-grid) is picked per
    config by _steps_grid; `prev` is only read by the step-grid kernels
    (the monolithic ones shift acts in-register).

    use_primal skips the FORWARD kernel entirely and returns logp0 — the
    per-step logp the fused actor rollout kernel emits ~for free
    (identical shifted-softmax formula). The REINFORCE gradient never
    needs the primal recomputed: the hand-derived BACKWARD kernel is
    self-contained (it re-runs the head per decode step itself), so the
    custom-VJP's value/gradient pair stays exactly the REINFORCE
    estimator — value from the rollout head, gradient from the replay
    head, the two equal to SPEC.md §12 tier-2 accumulation tolerance
    (gradients bit-identical with/without the primal —
    tests/test_pallas_replay.py). The skipped forward was 10.9 ms/step of
    pure recomputation on the rolling config.
    """
    out, _ = _fwd_impl(statics, diff, data)
    return out


def _specs(cfg, T, h, B, BT, params, steps):
    """(grid, in-spec builders, full/rep spec) for one schedule.

    bspec: batch-tiled operand (revisited across the step axis when the
    grid has one); sspec: per-decode-step streamed operand (step-grid
    only); full/rep: whole-array operand / revisited whole-array output."""
    if steps:
        grid = (B // BT, cfg.num_blocks)
        bspec = lambda *shape: pl.BlockSpec(
            (*shape, BT), lambda b, k: tuple([0] * len(shape)) + (b,),
            memory_space=pltpu.VMEM)
        sspec = lambda *shape: pl.BlockSpec(
            (1, *shape, BT), lambda b, k: (k,) + tuple([0] * len(shape))
            + (b,), memory_space=pltpu.VMEM)
        full = lambda x: pl.BlockSpec(
            x.shape, lambda b, k: tuple([0] * x.ndim),
            memory_space=pltpu.VMEM)
    else:
        grid = (B // BT,)
        bspec = lambda *shape: pl.BlockSpec(
            (*shape, BT), lambda i: tuple([0] * len(shape)) + (i,),
            memory_space=pltpu.VMEM)
        sspec = None
        full = lambda x: pl.BlockSpec(
            x.shape, lambda i: tuple([0] * x.ndim), memory_space=pltpu.VMEM)
    return grid, bspec, sspec, full


def _fwd_impl(statics, diff, data):
    cfg, temperature, dtype_name, interpret, use_primal = statics
    dtype = jnp.dtype(dtype_name)
    params, se, ctx = diff
    flags, hms, masks, acts, prev, statp, statm, logp0 = data
    if use_primal:
        return logp0, (diff, data)
    from tapnet_tpu.models.features import _scale

    T, h, B = se.shape
    steps = _steps_grid(cfg)
    BT = batch_tile_steps(B, T, h) if steps else batch_tile(B, T, h)
    S = cfg.num_blocks
    N, W, D = cfg.num_blocks, cfg.target_width, cfg.target_depth
    R, C = cfg.num_rot, cfg.num_containers
    grid, bspec, sspec, full = _specs(cfg, T, h, B, BT, params, steps)
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
               if not interpret else None)

    if steps:
        logp = pl.pallas_call(
            _fwd_kernel_steps(cfg, h, _scale(cfg), temperature, dtype),
            grid=grid,
            in_specs=[sspec(N), sspec(C * W, D), sspec(R * N * C),
                      sspec(1), sspec(1),
                      bspec(T, h), bspec(h), bspec(4, T), bspec(4)]
            + [full(p) for p in params],
            out_specs=bspec(1),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, BT), jnp.float32)],
            compiler_params=cparams, interpret=interpret,
        )(flags, hms, masks, acts[:, None], prev[:, None], se, ctx, statp,
          statm, *params)
    else:
        logp = pl.pallas_call(
            _fwd_kernel(cfg, h, _scale(cfg), temperature, dtype),
            grid=grid,
            in_specs=[bspec(S, N), bspec(S, C * W, D),
                      bspec(S, R * N * C), bspec(S),
                      bspec(T, h), bspec(h), bspec(4, T), bspec(4)]
            + [full(p) for p in params],
            out_specs=bspec(1),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            compiler_params=cparams, interpret=interpret,
        )(flags, hms, masks, acts, se, ctx, statp, statm, *params)
    return logp[0], (diff, data)


def _bwd_impl(statics, res, g):
    cfg, temperature, dtype_name, interpret, _use_primal = statics
    dtype = jnp.dtype(dtype_name)
    diff, data = res
    params, se, ctx = diff
    flags, hms, masks, acts, prev, statp, statm, _logp0 = data
    from tapnet_tpu.models.features import _scale

    T, h, B = se.shape
    steps = _steps_grid(cfg)
    BT = batch_tile_steps(B, T, h) if steps else batch_tile(B, T, h)
    S = cfg.num_blocks
    N, W, D = cfg.num_blocks, cfg.target_width, cfg.target_depth
    R, C = cfg.num_rot, cfg.num_containers
    grid, bspec, sspec, full = _specs(cfg, T, h, B, BT, params, steps)
    rep = full  # revisited whole-array output block, accumulated over grid
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
               if not interpret else None)
    out_specs = tuple([bspec(T, h), bspec(h)] + [rep(p) for p in params])
    out_shape = tuple(
        [jax.ShapeDtypeStruct((T, h, B), jnp.float32),
         jax.ShapeDtypeStruct((h, B), jnp.float32)]
        + [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params])

    if steps:
        outs = pl.pallas_call(
            _bwd_kernel_steps(cfg, h, _scale(cfg), temperature, dtype,
                              B // BT),
            grid=grid,
            in_specs=[bspec(1), sspec(N), sspec(C * W, D),
                      sspec(R * N * C), sspec(1), sspec(1),
                      bspec(T, h), bspec(h), bspec(4, T), bspec(4)]
            + [full(p) for p in params],
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM(p.shape, jnp.float32)
                            for p in params]
            + [pltpu.VMEM((T, h, BT), jnp.float32),
               pltpu.VMEM((h, BT), jnp.float32)],
            compiler_params=cparams, interpret=interpret,
        )(g[None], flags, hms, masks, acts[:, None], prev[:, None], se,
          ctx, statp, statm, *params)
    else:
        outs = pl.pallas_call(
            _bwd_kernel(cfg, h, _scale(cfg), temperature, dtype),
            grid=grid,
            in_specs=[bspec(1), bspec(S, N), bspec(S, C * W, D),
                      bspec(S, R * N * C), bspec(S),
                      bspec(T, h), bspec(h), bspec(4, T), bspec(4)]
            + [full(p) for p in params],
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM(p.shape, jnp.float32)
                            for p in params],
            compiler_params=cparams, interpret=interpret,
        )(g[None], flags, hms, masks, acts, se, ctx, statp, statm,
          *params)
    dse, dctx = outs[0], outs[1]
    dparams = tuple(d.astype(p.dtype) for d, p in zip(outs[2:], params))
    d_diff = (dparams, dse.astype(se.dtype), dctx.astype(ctx.dtype))
    d_data = tuple(
        (jnp.zeros_like(x) if jnp.issubdtype(x.dtype, jnp.floating)
         else np.zeros(x.shape, jax.dtypes.float0)) for x in data)
    return (d_diff, d_data)


replay_logp_fused.defvjp(_fwd_impl, _bwd_impl)
