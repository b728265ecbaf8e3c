"""Fused per-decode-step select+place Pallas kernel (learned-policy rollouts).

The monolithic whole-rollout kernels in `pallas_env.py` cover FIXED policies
(first/random) — the policy never needs data from outside the kernel. A
LEARNED policy must alternate actor GEMMs (XLA/MXU territory) with env
transitions, so the rollout cannot be one launch; instead this kernel fuses
everything between two actor calls — f32 argmax selection with the general
path's exact first-index tie-break, the O(W·D) candidate scan, lb placement
(soft/hard, finite or unbounded height cap), heightmap / packed / placement
updates — into ONE kernel per decode step, batch on the 128-lane axis.

Bit-exactness contract: given `score` = the same f32 masked-logits(+gumbel)
tensor the general path feeds jnp.argmax, the kernel reproduces
`env.core.step(state, argmax(score), ...)` exactly (integer env math; f32
max + lowest-index tie-break identical to argmax). Parity-tested per-field
against the general path in tests/test_policy_step.py.

Coverage: BOTH placement rules — `lb` (soft/hard) and `mcs` (the exact
integer-fraction scored placement, SPEC.md §6.4, via the same u32-limb
u64/u128 arithmetic as env.core run on the VPU) — any target_height, any
num_containers, 2D and 3D, rotation. The action mask is computed OUTSIDE
(XLA) where finite-height candidate scans already exist, so `eligible` is
unconditional: no config falls back to the general path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.env.core import (_mcs_score_fraction, _u128_gt_eq,
                                 _u64_mul_u64)

TB = 128     # batch tile = lane count
BIG = 2**30  # python int (jnp constants would become captured kernel consts)


def eligible(cfg: TAPConfig) -> bool:
    """Every config: lb and mcs, soft/hard, capped/unbounded, 2D/3D."""
    return True


def select_place(cfg: TAPConfig, score, mask, packed, hm_all, plc,
                 dims_w, dims_d, dims_h):
    """The fused select+place body as a pure jnp function over batch-last
    VMEM-resident values (all [..., TB]); shared by this per-step kernel and
    the fused actor-step kernel (ops/pallas_actor_step.py), so the exact
    argmax/tie-break/candidate-scan/update semantics exist ONCE.

    score [A, TB] f32, mask [A, TB] i32, packed [N, TB], hm_all [C*W, D, TB],
    plc [N*6, TB], dims_* [N, TB]. Returns (packed', hm', plc', act [1, TB]).
    """
    N = cfg.num_blocks
    W = cfg.target_width
    D = cfg.target_depth
    R = cfg.num_rot
    C = cfg.num_containers
    A = N * R * C
    hard = cfg.placement_variant == "hard"
    mcs = cfg.placement_rule == "mcs"
    cap = cfg.height_cap
    two_d = cfg.dim == 2  # D == 1; rotation swaps (w, h), not (w, d)
    TB = score.shape[1]

    if True:  # keep the original kernel-body indentation for diff clarity
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, TB), 0)
        x_i = jax.lax.broadcasted_iota(jnp.int32, (W, D, TB), 0)
        y_i = jax.lax.broadcasted_iota(jnp.int32, (W, D, TB), 1)
        ox4 = jax.lax.broadcasted_iota(jnp.int32, (W, W, D, TB), 0)
        xb4 = jax.lax.broadcasted_iota(jnp.int32, (W, W, D, TB), 1)

        # --- selection: jnp.argmax(score) == lowest index attaining the max
        mx = jnp.max(score, axis=0)                              # [TB]
        a_sel = jnp.min(jnp.where(score == mx[None], iota_a, A), axis=0)
        valid = jnp.max(mask, axis=0) > 0                        # [TB]
        onehot = (iota_a == a_sel[None]).astype(jnp.int32)       # [A, TB]

        # --- decompose (b, r, c): flat order matches cfg.compose_action
        oh = onehot.reshape(N, R, C, TB)
        ohb = jnp.sum(oh, axis=(1, 2))                           # [N, TB]
        r_sel = (jnp.sum(oh[:, 1], axis=(0, 1)) if R == 2
                 else jnp.zeros((TB,), jnp.int32))               # [TB]
        ocs = [jnp.sum(oh[:, :, c], axis=(0, 1)) for c in range(C)]

        w_blk = jnp.sum(ohb * dims_w, axis=0)
        d_blk = jnp.sum(ohb * dims_d, axis=0)
        h_blk = jnp.sum(ohb * dims_h, axis=0)
        if two_d:
            w_eff = jnp.where(r_sel == 1, h_blk, w_blk)          # rot_axes (0,2)
            d_eff = d_blk
            h_eff = jnp.where(r_sel == 1, w_blk, h_blk)
        else:
            w_eff = jnp.where(r_sel == 1, d_blk, w_blk)          # rot_axes (0,1)
            d_eff = jnp.where(r_sel == 1, w_blk, d_blk)
            h_eff = h_blk

        # --- selected container's heightmap
        hms = [hm_all[c * W:(c + 1) * W] for c in range(C)]      # [W, D, TB]
        hm = ocs[0][None, None, :] * hms[0]
        for c in range(1, C):
            hm = hm + ocs[c][None, None, :] * hms[c]

        we = w_eff[None, None, None, :]

        def stack_x(a, fill):
            pad = jnp.concatenate([a, jnp.full_like(a, fill)], axis=0)
            return jnp.stack([pad[o:o + W] for o in range(W)], axis=0)

        # --- candidate scan (separable footprint max; cf. env.core)
        if D == 1:
            rowmax = hm
            sup_y_ok = jnp.ones((W, D, TB), bool)
            in_range_y = jnp.ones((W, D, TB), bool)
        else:
            oy4 = jax.lax.broadcasted_iota(jnp.int32, (D, W, D, TB), 0)
            yb4 = jax.lax.broadcasted_iota(jnp.int32, (D, W, D, TB), 2)
            de = d_eff[None, None, None, :]

            def stack_y(a, fill):
                pad = jnp.concatenate([a, jnp.full_like(a, fill)], axis=1)
                return jnp.stack([pad[:, o:o + D] for o in range(D)], axis=0)

            Sy = stack_y(hm, 0)
            rowmax = jnp.max(jnp.where(oy4 < de, Sy, 0), axis=0)
            in_range_y = y_i <= D - d_eff[None, None, :]

        Sx = stack_x(rowmax, -1)
        in_x = ox4 < we
        landing = jnp.max(jnp.where(in_x, Sx, 0), axis=0)        # [W, D, TB]

        # support extent along x
        sup_x = in_x & (Sx == landing[None])
        idx2 = 2 * (xb4 + ox4)
        minx = jnp.min(jnp.where(sup_x, idx2, BIG), axis=0)
        maxx = jnp.max(jnp.where(sup_x, idx2, -BIG), axis=0)
        cx2 = 2 * x_i + w_eff[None, None, :] - 1
        sup_x_ok = (minx <= cx2) & (cx2 <= maxx)

        if D > 1:
            SxH = stack_x(hm, 0)
            colmax = jnp.max(jnp.where(in_x, SxH, 0), axis=0)
            Sc = stack_y(colmax, -1)
            sup_y = (oy4 < de) & (Sc == landing[None])
            idy2 = 2 * (yb4 + oy4)
            miny = jnp.min(jnp.where(sup_y, idy2, BIG), axis=0)
            maxy = jnp.max(jnp.where(sup_y, idy2, -BIG), axis=0)
            cy2 = 2 * y_i + d_eff[None, None, :] - 1
            sup_y_ok = (miny <= cy2) & (cy2 <= maxy)

        stable = (landing == 0) | (sup_x_ok & sup_y_ok)

        validx = (x_i <= W - w_eff[None, None, :]) & in_range_y & \
                 (landing + h_eff[None, None, :] <= cap)
        keyv = (landing * W + x_i) * D + y_i
        if mcs:
            # --- exact-score placement (env.core choose_placement, mcs):
            # global reward aggregates of the pre-step state, per-candidate
            # deltas, u64 fraction per candidate, u128 cross-multiply
            # tournament by (class, score, -lb key). All u32-limb VPU ops.
            area = W * D
            plc3 = plc.reshape(N, 6, TB)
            placed = plc3[:, 0] >= 0                             # [N, TB]
            vol0 = jnp.sum(jnp.where(placed, dims_w * dims_d * dims_h, 0),
                           axis=0)                               # [TB]
            denc0 = area * sum(jnp.max(hms[c], axis=(0, 1)) for c in range(C))
            denp0 = sum(jnp.sum(hms[c], axis=(0, 1)) for c in range(C))
            snum0 = jnp.sum(jnp.where(placed, plc3[:, 5], 0), axis=0)
            sden0 = jnp.sum(placed.astype(jnp.int32), axis=0)

            top_c = landing + h_eff[None, None, :]               # [W, D, TB]
            cur_maxh = jnp.max(hm, axis=(0, 1))                  # [TB]
            new_maxh = jnp.maximum(cur_maxh[None, None, :], top_c)
            if D == 1:
                rowsum = hm
            else:
                Sy2 = stack_y(hm, 0)
                rowsum = jnp.sum(jnp.where(oy4 < de, Sy2, 0), axis=0)
            Sx2 = stack_x(rowsum, 0)
            fpsum = jnp.sum(jnp.where(in_x, Sx2, 0), axis=0)     # [W, D, TB]

            bc = lambda v: jnp.broadcast_to(v[None, None, :], (W, D, TB))
            dc_p = bc(denc0) + area * (new_maxh - bc(cur_maxh))
            dp_p = bc(denp0) + bc(w_eff * d_eff) * top_c - fpsum
            vol_p = bc(vol0 + w_eff * d_eff * h_eff)
            sn_p = bc(snum0) + stable.astype(jnp.int32)
            sd_p = bc(sden0) + 1
            n64, d64 = _mcs_score_fraction(cfg, vol_p, dc_p, dp_p, sn_p,
                                           sd_p)

            cls = validx.astype(jnp.int32)
            if hard:
                cls = cls + (validx & stable).astype(jnp.int32)
            n64 = tuple(jnp.where(validx, t, 0).astype(jnp.uint32)
                        for t in n64)
            d64 = tuple(jnp.where(validx, t, 0).astype(jnp.uint32)
                        for t in d64)
            M = W * D
            flatc = lambda t: t.reshape(M, TB)
            fields = [flatc(cls), flatc(keyv), flatc(n64[0]), flatc(n64[1]),
                      flatc(d64[0]), flatc(d64[1])]
            p2 = 1
            while p2 < M:
                p2 *= 2
            if p2 > M:
                pad = p2 - M
                fields = [jnp.concatenate(
                    [f, jnp.zeros((pad, TB), f.dtype)], axis=0)
                    for f in fields]
                fields[1] = jnp.concatenate(
                    [flatc(keyv), jnp.full((pad, TB), BIG, jnp.int32)],
                    axis=0)  # padded lb keys lose ties
            while p2 > 1:
                half = p2 // 2
                af = [f[:half] for f in fields]
                bf = [f[half:p2] for f in fields]
                pa = _u64_mul_u64((af[2], af[3]), (bf[4], bf[5]))
                pb = _u64_mul_u64((bf[2], bf[3]), (af[4], af[5]))
                gt, eq = _u128_gt_eq(pa, pb)
                take_a = (af[0] > bf[0]) | (
                    (af[0] == bf[0]) & (gt | (eq & (af[1] <= bf[1]))))
                fields = [jnp.where(take_a, fa, fb)
                          for fa, fb in zip(af, bf)]
                p2 = half
            win_key = fields[1][0]                               # [TB]
            y_star = win_key % D
            x_star = (win_key // D) % W
            any_valid = jnp.max(validx.astype(jnp.int32), axis=(0, 1)) > 0
            win = ((x_i == x_star[None, None, :]) &
                   (y_i == y_star[None, None, :])).astype(jnp.int32)
            l_star = jnp.sum(win * landing, axis=(0, 1))
            s_star = jnp.sum(win * stable.astype(jnp.int32), axis=(0, 1))
        else:
            key_soft = jnp.where(validx, keyv, BIG)
            if hard:
                key_hard = jnp.where(validx & stable, keyv, BIG)
                use_hard = jnp.min(key_hard, axis=(0, 1)) < BIG
                key_used = jnp.where(use_hard[None, None, :], key_hard,
                                     key_soft)
            else:
                key_used = key_soft
            kmin = jnp.min(key_used, axis=(0, 1))                # [TB]
            any_valid = kmin < BIG
            win = (key_used == kmin[None, None, :]).astype(jnp.int32)
            x_star = jnp.sum(win * x_i, axis=(0, 1))
            y_star = jnp.sum(win * y_i, axis=(0, 1))
            l_star = jnp.sum(win * landing, axis=(0, 1))
            s_star = jnp.sum(win * stable.astype(jnp.int32), axis=(0, 1))

        do = valid & any_valid                                   # [TB]

        # --- state updates
        fp = (x_i >= x_star[None, None, :]) & \
             (x_i < (x_star + w_eff)[None, None, :]) & \
             (y_i >= y_star[None, None, :]) & \
             (y_i < (y_star + d_eff)[None, None, :])
        top = (l_star + h_eff)[None, None, :]
        new_hms = []
        for c in range(C):
            sel_c = (ocs[c] == 1) & do
            new_hms.append(jnp.where(fp & sel_c[None, None, :], top, hms[c]))
        hm_new = jnp.concatenate(new_hms, axis=0)

        packed_new = packed + ohb * do[None].astype(jnp.int32)

        c_star = sum(c * ocs[c] for c in range(1, C)) if C > 1 \
            else jnp.zeros((TB,), jnp.int32)
        row = jnp.stack([c_star, r_sel, x_star, y_star, l_star, s_star],
                        axis=0)                                  # [6, TB]
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (N * 6, TB), 0)
        sel_blk = jnp.sum(ohb * jax.lax.broadcasted_iota(
            jnp.int32, (N, TB), 0), axis=0)                      # [TB]
        write = (iota_p // 6 == sel_blk[None]) & do[None]
        # row value per placement column j = iota_p % 6, broadcast over blocks
        row_full = jnp.concatenate([row] * N, axis=0)            # [N*6, TB]
        plc_new = jnp.where(write, row_full, plc)

        act = jnp.where(valid, a_sel, -1)[None]                  # [1, TB]
        return packed_new, hm_new, plc_new, act


def _kernel(cfg: TAPConfig):
    def kernel(score_ref, mask_ref, packed_ref, hm_ref, plc_ref,
               dims_w_ref, dims_d_ref, dims_h_ref,
               packed_out, hm_out, plc_out, act_out):
        packed_out[:], hm_out[:], plc_out[:], act_out[:] = select_place(
            cfg, score_ref[:], mask_ref[:], packed_ref[:], hm_ref[:],
            plc_ref[:], dims_w_ref[:], dims_d_ref[:], dims_h_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def select_step(score, mask, packed, hm, plc, dims_w, dims_d, dims_h,
                cfg: TAPConfig, interpret: bool = False):
    """One fused select+place step over a batch-last state.

    score   f32[A, B]   masked logits (+gumbel); argmax = chosen action
    mask    i32[A, B]   feasibility (valid = any)
    packed  i32[N, B];  hm i32[C*W, D, B];  plc i32[N*6, B]
    dims_*  i32[N, B]   per-instance block dims (unrotated)

    B must be a multiple of 128. Returns (packed', hm', plc', action[B]).
    """
    assert eligible(cfg)
    N, W, D, C = (cfg.num_blocks, cfg.target_width, cfg.target_depth,
                  cfg.num_containers)
    A = cfg.num_actions
    B = score.shape[1]
    assert B % TB == 0, f"batch {B} must be a multiple of {TB}"

    grid = (B // TB,)
    bspec = lambda *shape: pl.BlockSpec(
        (*shape, TB), lambda i: tuple([0] * len(shape)) + (i,),
        memory_space=pltpu.VMEM)

    packed_o, hm_o, plc_o, act = pl.pallas_call(
        _kernel(cfg),
        grid=grid,
        in_specs=[bspec(A), bspec(A), bspec(N), bspec(C * W, D), bspec(N * 6),
                  bspec(N), bspec(N), bspec(N)],
        out_specs=(bspec(N), bspec(C * W, D), bspec(N * 6), bspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((N, B), jnp.int32),
            jax.ShapeDtypeStruct((C * W, D, B), jnp.int32),
            jax.ShapeDtypeStruct((N * 6, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        interpret=interpret,
    )(score, mask, packed, hm, plc, dims_w, dims_d, dims_h)
    return packed_o, hm_o, plc_o, act[0]
