"""Batched TAP environment core: pure jitted transitions (SPEC.md §3-§9).

This is the rebuild of the reference's per-instance Python env loop
(SURVEY.md §3.1/§3.4 `pack.py` candidate scan + heightmap update, unverified)
as fixed-shape int32 tensor ops:

- the O(W) candidate-position scan becomes separable unrolled window maxima
  over the whole heightmap (every candidate scored in parallel, VPU-friendly);
- tie-breaking is a single injective integer key ((l*Wt + x)*Dt + y, argmin)
  reproducing the oracle's lexicographic lowest/leftmost/frontmost scan;
- precedence masks are batched boolean adjacency reductions;
- everything vmaps over the batch axis and jits with TAPConfig static.

All functions below are per-instance; `vmap` lifts them to batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.types import EnvState, Instance

BIG = jnp.int32(2**30)


# --------------------------------------------------------------------- #
# reset

def reset(instance: Instance, cfg: TAPConfig) -> EnvState:
    N = cfg.num_blocks
    packed = jnp.arange(N, dtype=jnp.int32) >= instance.n_total
    return EnvState(
        heightmap=jnp.zeros(
            (cfg.num_containers, cfg.target_width, cfg.target_depth), jnp.int32),
        packed=packed,
        placements=jnp.full((N, 6), -1, jnp.int32),
        t=jnp.int32(0),
    )


# --------------------------------------------------------------------- #
# accessibility / action mask

def _accessibility(instance: Instance, packed: jax.Array):
    """acc0[b]: removable straight-up; accr[b]: removable with rotation."""
    unpacked = ~packed
    blocked0 = (instance.up & unpacked[:, None]).any(axis=0)
    acc0 = unpacked & ~blocked0
    blockedr = (instance.rot & unpacked[:, None]).any(axis=0)
    accr = acc0 & ~blockedr
    return acc0, accr


def rotated_dims(instance: Instance, b: jax.Array, r: jax.Array,
                 cfg: TAPConfig):
    """(w, d, h) of block b under rotation state r (SPEC.md §4)."""
    dims = instance.dims[b]
    ax0, ax1 = cfg.rot_axes
    swapped = dims.at[ax0].set(dims[ax1]).at[ax1].set(dims[ax0])
    w, d, h = jnp.where(r == 1, swapped, dims)
    return w, d, h


def action_mask(state: EnvState, instance: Instance, cfg: TAPConfig) -> jax.Array:
    """Feasibility over the flat (block, rot, container) action space."""
    acc0, accr = _accessibility(instance, state.packed)
    if cfg.window > 0:
        rank = jnp.cumsum(acc0.astype(jnp.int32)) - acc0.astype(jnp.int32)
        observable = acc0 & (rank < cfg.window)
    else:
        observable = acc0

    # per (block, rot): accessibility + target-dims fit
    masks_br = []
    for r in range(cfg.num_rot):
        ok = observable if r == 0 else (observable & accr)
        dims = instance.dims
        if r == 1:
            ax0, ax1 = cfg.rot_axes
            dims = dims[:, jnp.array([ax1 if k == ax0 else ax0 if k == ax1 else k
                                      for k in range(3)])]
        fits = (dims[:, 0] <= cfg.target_width) & (dims[:, 1] <= cfg.target_depth)
        masks_br.append(ok & fits)
    mask_br = jnp.stack(masks_br, axis=1)  # [N, R]

    if cfg.target_height > 0:
        # finite cap: require >= 1 candidate with l + h <= cap (SPEC.md §5)
        per = []
        for r in range(cfg.num_rot):
            row = []
            for c in range(cfg.num_containers):
                def placeable(b, r=r, c=c):
                    w, d, h = rotated_dims(instance, b, jnp.int32(r), cfg)
                    landing, _, valid = candidate_scan(
                        state.heightmap[c], w, d, h, cfg)
                    return valid.any()
                row.append(jax.vmap(placeable)(jnp.arange(cfg.num_blocks)))
            per.append(jnp.stack(row, axis=1))
        place_ok = jnp.stack(per, axis=1)  # [N, R, C]
    else:
        place_ok = jnp.ones(
            (cfg.num_blocks, cfg.num_rot, cfg.num_containers), bool)

    mask = mask_br[:, :, None] & place_ok
    return mask.reshape(cfg.num_actions)


# --------------------------------------------------------------------- #
# candidate scan (SPEC.md §6) — all offsets scored in parallel

def _shift_stack_x(a: jax.Array, W: int, fill) -> jax.Array:
    """S[o, x, y] = a[x + o, y] (fill beyond the edge), o in [0, W)."""
    pad = jnp.concatenate([a, jnp.full_like(a, fill)], axis=0)
    return jnp.stack([pad[o:o + W, :] for o in range(W)], axis=0)


def _shift_stack_y(a: jax.Array, D: int, fill) -> jax.Array:
    pad = jnp.concatenate([a, jnp.full_like(a, fill)], axis=1)
    return jnp.stack([pad[:, o:o + D] for o in range(D)], axis=0)


def _window_max_x(a: jax.Array, w: jax.Array, W: int) -> jax.Array:
    """out[x, :] = max(a[x : x+w, :]) with zero padding; w traced, W static.

    One stacked masked reduction (log-depth) instead of a W-long dependent
    accumulate chain — tiny grids are kernel-latency-bound on TPU, so
    shortening the sequential op chain is what buys throughput.
    """
    S = _shift_stack_x(a, W, 0)
    o = jnp.arange(W, dtype=jnp.int32)[:, None, None]
    return jnp.max(jnp.where(o < w, S, 0), axis=0)


def _window_max_y(a: jax.Array, d: jax.Array, D: int) -> jax.Array:
    if D == 1:
        return a
    S = _shift_stack_y(a, D, 0)
    o = jnp.arange(D, dtype=jnp.int32)[:, None, None]
    return jnp.max(jnp.where(o < d, S, 0), axis=0)


def candidate_scan(hm: jax.Array, w, d, h, cfg: TAPConfig):
    """Landing height, stability, validity for every offset of a (w,d,h) block.

    hm: int32[Wt, Dt]. Returns (landing[Wt,Dt], stable[Wt,Dt], valid[Wt,Dt]).
    """
    Wt, Dt = cfg.target_width, cfg.target_depth
    rowmax = _window_max_y(hm, d, Dt)          # rowmax[i, y] = max_j<d hm[i, y+j]
    colmax = _window_max_x(hm, w, Wt)          # colmax[x, j] = max_i<w hm[x+i, j]
    landing = _window_max_x(rowmax, w, Wt)     # full footprint max

    # support extent along x: rows i in [x, x+w) with rowmax[i, y] == landing
    xs = jnp.arange(Wt, dtype=jnp.int32)[:, None]           # [Wt, 1]
    Sr = _shift_stack_x(rowmax, Wt, -1)                     # [Wt, Wt, Dt]
    o = jnp.arange(Wt, dtype=jnp.int32)[:, None, None]
    sup_x = (o < w) & (Sr == landing[None])
    idx2 = 2 * (xs[None] + o)
    minx = jnp.min(jnp.where(sup_x, idx2, BIG), axis=0)
    maxx = jnp.max(jnp.where(sup_x, idx2, -BIG), axis=0)

    ys = jnp.arange(Dt, dtype=jnp.int32)[None, :]           # [1, Dt]
    if Dt == 1:
        sup_y_ok = jnp.ones((Wt, Dt), bool)
    else:
        Sc = _shift_stack_y(colmax, Dt, -1)                 # [Dt, Wt, Dt]
        oy = jnp.arange(Dt, dtype=jnp.int32)[:, None, None]
        sup_y = (oy < d) & (Sc == landing[None])
        idy2 = 2 * (ys[None] + oy)
        miny = jnp.min(jnp.where(sup_y, idy2, BIG), axis=0)
        maxy = jnp.max(jnp.where(sup_y, idy2, -BIG), axis=0)
        cy2 = 2 * ys + d - 1
        sup_y_ok = (miny <= cy2) & (cy2 <= maxy)

    cx2 = 2 * xs + w - 1
    stable = (landing == 0) | ((minx <= cx2) & (cx2 <= maxx) & sup_y_ok)

    in_x = xs <= Wt - w
    in_y = ys <= Dt - d
    valid = in_x & in_y & (landing + h <= cfg.height_cap)
    return landing, stable, valid


def choose_placement(hm: jax.Array, w, d, h, cfg: TAPConfig):
    """lb-greedy argmin with soft/hard variant. Returns (x, y, l, stable, any_valid)."""
    Wt, Dt = cfg.target_width, cfg.target_depth
    landing, stable, valid = candidate_scan(hm, w, d, h, cfg)
    xs = jnp.arange(Wt, dtype=jnp.int32)[:, None]
    ys = jnp.arange(Dt, dtype=jnp.int32)[None, :]
    key = (landing * Wt + xs) * Dt + ys
    key_soft = jnp.where(valid, key, BIG)
    if cfg.placement_variant == "hard":
        key_hard = jnp.where(valid & stable, key, BIG)
        use_hard = (key_hard < BIG).any()
        key_used = jnp.where(use_hard, key_hard, key_soft)
    else:
        key_used = key_soft
    flat = jnp.argmin(key_used.reshape(-1)).astype(jnp.int32)
    x, y = flat // Dt, flat % Dt
    return x, y, landing[x, y], stable[x, y], (key_soft < BIG).any()


# --------------------------------------------------------------------- #
# step

def step(state: EnvState, action: jax.Array, instance: Instance,
         cfg: TAPConfig) -> EnvState:
    """Place the block selected by `action` (int32; negative => no-op)."""
    do = action >= 0
    a = jnp.maximum(action, 0)
    b, r, c = cfg.decompose_action(a)
    w, d, h = rotated_dims(instance, b, r, cfg)

    hm = state.heightmap[c]
    x, y, l, stable, any_valid = choose_placement(hm, w, d, h, cfg)
    do = do & any_valid

    xs = jnp.arange(cfg.target_width, dtype=jnp.int32)[:, None]
    ys = jnp.arange(cfg.target_depth, dtype=jnp.int32)[None, :]
    fp = (xs >= x) & (xs < x + w) & (ys >= y) & (ys < y + d)
    hm_new = jnp.where(fp, l + h, hm)

    heightmap = jnp.where(do, state.heightmap.at[c].set(hm_new),
                          state.heightmap)
    packed = jnp.where(do, state.packed.at[b].set(True), state.packed)
    row = jnp.stack([c, r, x, y, l, stable.astype(jnp.int32)])
    placements = jnp.where(do, state.placements.at[b].set(row),
                           state.placements)
    return EnvState(heightmap=heightmap, packed=packed,
                    placements=placements, t=state.t + do.astype(jnp.int32))


# --------------------------------------------------------------------- #
# reward (SPEC.md §7)

def reward_terms(state: EnvState, instance: Instance, cfg: TAPConfig):
    """Integer reward numerators/denominators (exact; parity-comparable)."""
    placed = state.placements[:, 0] >= 0
    vol = jnp.sum(jnp.where(placed, jnp.prod(instance.dims, axis=1), 0))
    maxh = state.heightmap.max(axis=(1, 2))            # [C]
    under = state.heightmap.sum(axis=(1, 2))           # [C]
    used = maxh > 0
    area = cfg.target_width * cfg.target_depth
    denom_c = jnp.sum(jnp.where(used, area * maxh, 0))
    denom_p = jnp.sum(jnp.where(used, under, 0))
    s_num = jnp.sum(jnp.where(placed, state.placements[:, 5], 0))
    s_den = jnp.sum(placed.astype(jnp.int32))
    return vol, denom_c, denom_p, s_num, s_den


def reward(state: EnvState, instance: Instance, cfg: TAPConfig) -> jax.Array:
    """float32 reward = sum of configured C/P/S terms (0 if nothing packed)."""
    vol, denom_c, denom_p, s_num, s_den = reward_terms(state, instance, cfg)
    f = lambda n, d: jnp.where(d > 0, n.astype(jnp.float32) /
                               jnp.maximum(d, 1).astype(jnp.float32), 0.0)
    terms = {"C": f(vol, denom_c), "P": f(vol, denom_p), "S": f(s_num, s_den)}
    return sum(terms[t] for t in cfg.reward_terms)


# --------------------------------------------------------------------- #
# fixed-policy rollout (parity + benchmarking harness)

def _nth_true(mask: jax.Array, k: jax.Array) -> jax.Array:
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    return jnp.argmax(mask & (rank == k)).astype(jnp.int32)


def select_action(mask: jax.Array, policy: str, key, t: jax.Array) -> jax.Array:
    """Mirrors oracle.rollout.select_action; returns -1 when mask is empty."""
    n = mask.sum().astype(jnp.int32)
    if policy == "first":
        a = jnp.argmax(mask).astype(jnp.int32)
    elif policy == "random":
        r = jax.random.bits(jax.random.fold_in(key, t), dtype=jnp.uint32)
        a = _nth_true(mask, (r % jnp.maximum(n, 1).astype(jnp.uint32))
                      .astype(jnp.int32))
    else:
        raise ValueError(policy)
    return jnp.where(n > 0, a, -1)


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "unroll"))
def rollout(instance: Instance, key, cfg: TAPConfig, policy: str = "first",
            unroll: int = 0):
    """Roll one instance (or batch via vmap outside) to termination.

    Returns (final_state, actions[N], reward). The whole trajectory is one
    lax.scan — no host sync inside (SURVEY.md §7 Phase 4 design). The scan is
    unrolled for small N (decode steps are tiny; merging them cuts kernel
    launch overhead); pass `unroll` to override.
    """
    state0 = reset(instance, cfg)

    def body(state, t):
        mask = action_mask(state, instance, cfg)
        a = select_action(mask, policy, key, t)
        return step(state, a, instance, cfg), a

    # default rolled: full unroll multiplies XLA compile time by minutes for
    # marginal gain; the fused Pallas kernel (ops/pallas_env.py) is the fast
    # path for eligible configs
    state, actions = jax.lax.scan(
        body, state0, jnp.arange(cfg.num_blocks, dtype=jnp.int32),
        unroll=max(1, min(unroll, cfg.num_blocks)))
    return state, actions, reward(state, instance, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def rollout_batch(instances: Instance, keys, cfg: TAPConfig,
                  policy: str = "first"):
    return jax.vmap(lambda i, k: rollout(i, k, cfg, policy))(instances, keys)
