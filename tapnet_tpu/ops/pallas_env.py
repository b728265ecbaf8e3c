"""Fused whole-rollout Pallas kernel for 2D TAP (the env hot path).

The batched env in `env/core.py` is correct and general, but its decode steps
are tiny tensor ops — on TPU a rollout dissolves into hundreds of
micro-kernels and becomes launch-latency-bound. This kernel runs the ENTIRE
rollout (mask -> policy-select -> candidate scan -> placement -> heightmap
update, for all N decode steps) in ONE kernel launch per batch tile, with all
state resident in VMEM and the batch on the 128-lane axis.

Bit-exactness: the math is the same integer math as core.py/SPEC.md; the
policy's threefry draws are precomputed outside (bits(fold_in(key_b, t))), so
fused and unfused rollouts are exactly equal — tested per-field.

Eligibility (v1): dim == 2, single container, no rolling window, unbounded
target height, policies first/random. The general path covers the rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.types import EnvState, Instance

TB = 128   # batch tile = lane count
BIG = 2**30  # python int: jnp constants would be captured consts in the kernel


def eligible(cfg: TAPConfig) -> bool:
    return (cfg.dim == 2 and cfg.num_containers == 1 and cfg.window == 0
            and cfg.target_height == 0 and cfg.placement_rule == "lb")


def _inclusive_prefix_sum(x: jax.Array) -> jax.Array:
    """Hillis-Steele prefix sum along axis 0 (cumsum isn't lowered on TPU
    Pallas); log2(A) shift-adds."""
    A = x.shape[0]
    s = x
    d = 1
    while d < A:
        shifted = jnp.concatenate(
            [jnp.zeros((d,) + x.shape[1:], x.dtype), s[:A - d]], axis=0)
        s = s + shifted
        d *= 2
    return s


def _kernel(cfg: TAPConfig):
    N = cfg.num_blocks
    W = cfg.target_width
    R = cfg.num_rot
    A = N * R
    hard = cfg.placement_variant == "hard"

    def kernel(dims_w_ref, dims_h_ref, up_ref, rot_ref, ntot_ref, rbits_ref,
               hm_ref, packed_ref, act_ref, place_ref):
        dims_w = dims_w_ref[:]          # [N, TB]
        dims_h = dims_h_ref[:]
        up = up_ref[:]                  # [N, N, TB] int32 0/1
        rot = rot_ref[:]
        ntot = ntot_ref[:]              # [1, TB]
        rbits = rbits_ref[:]            # [N, TB] uint32 (policy draws)

        iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, TB), 0)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, TB), 0)
        x_col = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)
        o_x = jax.lax.broadcasted_iota(jnp.int32, (W, W, TB), 0)
        x_in = jax.lax.broadcasted_iota(jnp.int32, (W, W, TB), 1)

        real = (iota_n < ntot).astype(jnp.int32)
        packed = 1 - real               # padding pre-packed
        hm = jnp.zeros((W, TB), jnp.int32)
        actions = jnp.full((N, TB), -1, jnp.int32)
        plc = jnp.full((N, 6, TB), -1, jnp.int32)

        for t in range(N):
            unp = 1 - packed                                     # [N, TB]
            blocked0 = jnp.max(up * unp[:, None, :], axis=0)     # [N, TB]
            acc0 = unp * real * (1 - blocked0)
            if R == 2:
                blockedr = jnp.max(rot * unp[:, None, :], axis=0)
                accr = acc0 * (1 - blockedr)
                mask = jnp.stack(
                    [acc0 * (dims_w <= W), accr * (dims_h <= W)],
                    axis=1).reshape(A, TB)
            else:
                mask = acc0 * (dims_w <= W)

            count = jnp.sum(mask, axis=0)                        # [TB]
            sel = (rbits[t] % jnp.maximum(count, 1).astype(jnp.uint32)
                   ).astype(jnp.int32)
            rank = _inclusive_prefix_sum(mask) - mask
            onehot = mask * (rank == sel[None]).astype(jnp.int32)  # [A, TB]
            valid = count > 0

            if R == 2:
                oh = onehot.reshape(N, R, TB)
                ohb = oh[:, 0, :] + oh[:, 1, :]                  # [N, TB]
                r_sel = jnp.sum(oh[:, 1, :], axis=0)             # [TB]
            else:
                ohb = onehot
                r_sel = jnp.zeros((TB,), jnp.int32)
            w_blk = jnp.sum(ohb * dims_w, axis=0)
            h_blk = jnp.sum(ohb * dims_h, axis=0)
            w_eff = jnp.where(r_sel == 1, h_blk, w_blk)          # [TB]
            h_eff = jnp.where(r_sel == 1, w_blk, h_blk)

            # candidate scan: S[o, x, l] = hm[x + o, l] (0 beyond edge)
            hm_pad = jnp.concatenate([hm, jnp.zeros_like(hm)], axis=0)
            S = jnp.stack([hm_pad[o:o + W, :] for o in range(W)], axis=0)
            in_w = (o_x < w_eff[None, None, :]).astype(jnp.int32)
            landing = jnp.max(jnp.where(in_w == 1, S, 0), axis=0)  # [W, TB]

            sup = (in_w == 1) & (S == landing[None])
            idx2 = 2 * (x_in + o_x)
            minx = jnp.min(jnp.where(sup, idx2, BIG), axis=0)
            maxx = jnp.max(jnp.where(sup, idx2, -BIG), axis=0)
            cx2 = 2 * x_col + w_eff[None] - 1
            stable = (landing == 0) | ((minx <= cx2) & (cx2 <= maxx))

            validx = x_col <= (W - w_eff)[None]
            keyv = landing * W + x_col
            key_soft = jnp.where(validx, keyv, BIG)
            if hard:
                key_hard = jnp.where(validx & stable, keyv, BIG)
                use_hard = jnp.min(key_hard, axis=0) < BIG
                key_used = jnp.where(use_hard[None], key_hard, key_soft)
            else:
                key_used = key_soft
            kmin = jnp.min(key_used, axis=0)                     # [TB]
            any_valid = kmin < BIG
            win = (key_used == kmin[None]).astype(jnp.int32)     # one-hot in x
            x_star = jnp.sum(win * x_col, axis=0)
            l_star = jnp.sum(win * landing, axis=0)
            s_star = jnp.sum(win * stable.astype(jnp.int32), axis=0)

            do = valid & any_valid                               # [TB]
            fp = (x_col >= x_star[None]) & (x_col < (x_star + w_eff)[None])
            hm = jnp.where(fp & do[None], (l_star + h_eff)[None], hm)
            packed = packed + ohb * do[None].astype(jnp.int32)

            a_idx = jnp.sum(onehot * iota_a, axis=0)
            # static-row update via where (scatter isn't lowered on TPU Pallas)
            actions = jnp.where(iota_n == t, jnp.where(do, a_idx, -1)[None],
                                actions)

            row = jnp.stack([jnp.zeros((TB,), jnp.int32), r_sel, x_star,
                             jnp.zeros((TB,), jnp.int32), l_star, s_star],
                            axis=0)                              # [6, TB]
            write = (ohb[:, None, :] == 1) & do[None, None, :]
            plc = jnp.where(write, row[None], plc)

        hm_ref[:] = hm
        packed_ref[:] = packed
        act_ref[:] = actions
        place_ref[:] = plc.reshape(N * 6, TB)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "interpret"))
def fused_rollout_batch(instances: Instance, keys, cfg: TAPConfig,
                        policy: str = "first", interpret: bool = False):
    """Drop-in for env.core.rollout_batch on eligible configs (bit-equal).

    Returns (EnvState batch, actions [B, N], rewards [B]).
    """
    assert eligible(cfg), "config not supported by the fused kernel"
    N, W = cfg.num_blocks, cfg.target_width
    B = instances.dims.shape[0]
    Bp = (B + TB - 1) // TB * TB

    # policy randomness precomputed with stock threefry => bit-parity
    if policy == "random":
        def draws(key):
            return jnp.stack([
                jax.random.bits(jax.random.fold_in(key, t), dtype=jnp.uint32)
                for t in range(N)])
        rbits = jax.vmap(draws)(keys)                    # [B, N]
    elif policy == "first":
        rbits = jnp.zeros((B, N), jnp.uint32)
    else:
        raise ValueError(policy)

    def bpad(x):
        return jnp.pad(x, [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1))

    # batch-last layouts
    dims_w = bpad(instances.dims[:, :, 0]).T             # [N, Bp]
    dims_h = bpad(instances.dims[:, :, 2]).T
    up = jnp.transpose(bpad(instances.up.astype(jnp.int32)), (1, 2, 0))
    rot = jnp.transpose(bpad(instances.rot.astype(jnp.int32)), (1, 2, 0))
    ntot = bpad(jnp.broadcast_to(instances.n_total[:, None], (B, 1))).T
    rbits_t = bpad(rbits).T                              # [N, Bp]

    grid = (Bp // TB,)
    bspec = lambda *shape: pl.BlockSpec(
        (*shape, TB), lambda i: tuple([0] * len(shape)) + (i,),
        memory_space=pltpu.VMEM)
    hm, packed, actions, place = pl.pallas_call(
        _kernel(cfg),
        grid=grid,
        in_specs=[bspec(N), bspec(N), bspec(N, N), bspec(N, N), bspec(1),
                  bspec(N)],
        out_specs=(bspec(W), bspec(N), bspec(N), bspec(N * 6)),
        out_shape=(
            jax.ShapeDtypeStruct((W, Bp), jnp.int32),
            jax.ShapeDtypeStruct((N, Bp), jnp.int32),
            jax.ShapeDtypeStruct((N, Bp), jnp.int32),
            jax.ShapeDtypeStruct((N * 6, Bp), jnp.int32),
        ),
        interpret=interpret,
    )(dims_w, dims_h, up, rot, ntot, rbits_t)

    heightmap = hm.T[:B].reshape(B, 1, W, 1)
    packed_b = packed.T[:B].astype(bool)
    placements = place.reshape(N, 6, Bp).transpose(2, 0, 1)[:B]
    actions_b = actions.T[:B]
    t_final = jnp.sum((actions_b >= 0).astype(jnp.int32), axis=1)
    states = EnvState(heightmap=heightmap, packed=packed_b,
                      placements=placements, t=t_final)

    from tapnet_tpu.ops.pallas_reward import batched_reward
    rewards = batched_reward(heightmap, placements, instances.dims,
                             cfg.reward_terms, interpret=interpret)
    return states, actions_b, rewards
