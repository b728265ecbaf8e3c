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


def _window_sum_x(a: jax.Array, w: jax.Array, W: int) -> jax.Array:
    """out[x, :] = sum(a[x : x+w, :]) with zero padding (cf. _window_max_x)."""
    S = _shift_stack_x(a, W, 0)
    o = jnp.arange(W, dtype=jnp.int32)[:, None, None]
    return jnp.sum(jnp.where(o < w, S, 0), axis=0)


def _window_sum_y(a: jax.Array, d: jax.Array, D: int) -> jax.Array:
    if D == 1:
        return a
    S = _shift_stack_y(a, D, 0)
    o = jnp.arange(D, dtype=jnp.int32)[:, None, None]
    return jnp.sum(jnp.where(o < d, S, 0), axis=0)


# --------------------------------------------------------------------- #
# 32-bit limb arithmetic (SPEC.md §6.4 `mcs`)
#
# `mcs` compares exact integer score fractions n/d with n, d < 2^63
# (guaranteed by TAPConfig validation). jax_enable_x64 is off framework-wide
# (int32 end-to-end is the perf contract), so u64 values are (hi, lo) uint32
# limb pairs and the n1*d2 vs n2*d1 cross-comparison runs in u128 limbs.
# All ops are plain VPU integer ops — TPU-portable, no x64 anywhere.

def _mul32(a, b):
    """uint32 x uint32 -> full 64-bit product as (hi, lo) uint32 limbs."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = b & 0xFFFF, b >> 16
    ll, lh, hl, hh = a0 * b0, a0 * b1, a1 * b0, a1 * b1
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    lo = (ll & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def _u64_add(x, y):
    lo = x[1] + y[1]
    carry = (lo < y[1]).astype(jnp.uint32)
    return x[0] + y[0] + carry, lo


def _u64_mul_u32(x, c):
    """(hi, lo) * c, assuming the result fits in 64 bits (config guard)."""
    hi, lo = _mul32(x[1], c)
    _, lo2 = _mul32(x[0], c)  # high limb of x[0]*c must be 0 per the guard
    return hi + lo2, lo


def _u64_mul_u64(x, y):
    """Full 128-bit product as 4 uint32 limbs, most significant first."""
    ahi, alo = _mul32(x[1], y[1])
    bhi, blo = _mul32(x[1], y[0])
    chi, clo = _mul32(x[0], y[1])
    dhi, dlo = _mul32(x[0], y[0])
    w0 = alo
    s1 = ahi + blo
    c1 = (s1 < blo).astype(jnp.uint32)
    w1 = s1 + clo
    c2 = (w1 < clo).astype(jnp.uint32)
    s2 = bhi + chi
    k1 = (s2 < chi).astype(jnp.uint32)
    s3 = s2 + dlo
    k2 = (s3 < dlo).astype(jnp.uint32)
    w2 = s3 + c1 + c2
    k3 = (w2 < s3).astype(jnp.uint32)
    w3 = dhi + k1 + k2 + k3
    return w3, w2, w1, w0


def _u128_gt_eq(a, b):
    """Lexicographic (a > b, a == b) over equal-length limb tuples."""
    gt = jnp.zeros(a[0].shape, bool)
    eq = jnp.ones(a[0].shape, bool)
    for ai, bi in zip(a, b):
        gt = gt | (eq & (ai > bi))
        eq = eq & (ai == bi)
    return gt, eq


def _mcs_score_fraction(cfg: TAPConfig, vol_p, dc_p, dp_p, sn_p, sd_p):
    """Combine the configured reward terms into one u64 fraction n/d.

    Terms (SPEC.md §7): C = vol'/dc', P = vol'/dp', S = sn'/sd'. All inputs
    are non-negative int32 arrays; denominators are ≥ 1 for every candidate
    (the block itself lands in the container).
    """
    fracs = []
    for t in cfg.reward_terms:
        if t == "C":
            fracs.append((vol_p, dc_p))
        elif t == "P":
            fracs.append((vol_p, dp_p))
        else:
            fracs.append((sn_p, sd_p))
    zero = jnp.zeros_like(fracs[0][0], dtype=jnp.uint32)
    if len(fracs) == 1:
        (n1, d1), = fracs
        return (zero, n1.astype(jnp.uint32)), (zero, d1.astype(jnp.uint32))
    if len(fracs) == 2:
        (n1, d1), (n2, d2) = fracs
        n = _u64_add(_mul32(n1, d2), _mul32(n2, d1))
        return n, _mul32(d1, d2)
    (n1, d1), (n2, d2), (n3, d3) = fracs
    n = _u64_add(
        _u64_add(_u64_mul_u32(_mul32(d2, d3), n1),
                 _u64_mul_u32(_mul32(d1, d3), n2)),
        _u64_mul_u32(_mul32(d1, d2), n3))
    return n, _u64_mul_u32(_mul32(d1, d2), d3)


def _mcs_choose(cfg: TAPConfig, landing, stable, valid, key, n64, d64):
    """Tournament argmax by (class, exact score, -lb key); SPEC.md §6.4.

    class: valid (+1 if also stable under the `hard` variant) — realizes the
    hard variant's prefer-stable-then-fall-back semantics in one reduction.
    """
    Wt, Dt = cfg.target_width, cfg.target_depth
    hard = cfg.placement_variant == "hard"
    cls = valid.astype(jnp.int32)
    if hard:
        cls = cls + (valid & stable).astype(jnp.int32)
    # zero the fractions of invalid candidates so limb compares see equals
    n64 = tuple(jnp.where(valid, t, 0).astype(jnp.uint32) for t in n64)
    d64 = tuple(jnp.where(valid, t, 0).astype(jnp.uint32) for t in d64)

    fields = [cls.reshape(-1), key.reshape(-1),
              n64[0].reshape(-1), n64[1].reshape(-1),
              d64[0].reshape(-1), d64[1].reshape(-1)]
    m = Wt * Dt
    p2 = 1
    while p2 < m:
        p2 *= 2
    pad = p2 - m
    if pad:
        fields = [jnp.concatenate([f, jnp.zeros((pad,), f.dtype)])
                  for f in fields]
        fields[1] = fields[1].at[m:].set(BIG)  # padded lb keys lose ties
    while p2 > 1:
        half = p2 // 2
        a = [f[:half] for f in fields]
        b = [f[half:p2] for f in fields]
        pa = _u64_mul_u64((a[2], a[3]), (b[4], b[5]))  # n_a * d_b
        pb = _u64_mul_u64((b[2], b[3]), (a[4], a[5]))  # n_b * d_a
        gt, eq = _u128_gt_eq(pa, pb)
        take_a = (a[0] > b[0]) | ((a[0] == b[0])
                                  & (gt | (eq & (a[1] <= b[1]))))
        fields = [jnp.where(take_a, fa, fb) for fa, fb in zip(a, b)]
        p2 = half
    win_key = fields[1][0]
    y = win_key % Dt
    x = (win_key // Dt) % Wt
    return x, y


def choose_placement(hm: jax.Array, w, d, h, cfg: TAPConfig, score_ctx=None):
    """Placement per SPEC.md §6.4: `lb` argmin or `mcs` exact-score argmax,
    with the soft/hard variant. Returns (x, y, l, stable, any_valid).

    For `mcs`, `score_ctx = (vol, denom_c, denom_p, s_num, s_den)` — the
    current global reward aggregates (`reward_terms` of the pre-step state).
    """
    Wt, Dt = cfg.target_width, cfg.target_depth
    landing, stable, valid = candidate_scan(hm, w, d, h, cfg)
    xs = jnp.arange(Wt, dtype=jnp.int32)[:, None]
    ys = jnp.arange(Dt, dtype=jnp.int32)[None, :]
    key = (landing * Wt + xs) * Dt + ys
    key_soft = jnp.where(valid, key, BIG)

    if cfg.placement_rule == "mcs":
        assert score_ctx is not None, "mcs placement needs score_ctx"
        vol, denom_c, denom_p, s_num, s_den = score_ctx
        area = jnp.int32(Wt * Dt)
        top = landing + h
        cur_maxh = hm.max()
        new_maxh = jnp.maximum(cur_maxh, top)
        fpsum = _window_sum_x(_window_sum_y(hm, d, Dt), w, Wt)
        dc_p = denom_c + area * (new_maxh - cur_maxh)
        dp_p = denom_p + w * d * top - fpsum
        vol_p = vol + w * d * h
        sn_p = s_num + stable.astype(jnp.int32)
        sd_p = s_den + 1
        n64, d64 = _mcs_score_fraction(
            cfg, jnp.broadcast_to(vol_p, key.shape), dc_p,
            jnp.broadcast_to(dp_p, key.shape).astype(jnp.int32),
            jnp.broadcast_to(sn_p, key.shape),
            jnp.broadcast_to(sd_p, key.shape))
        x, y = _mcs_choose(cfg, landing, stable, valid, key, n64, d64)
        return x, y, landing[x, y], stable[x, y], valid.any()

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
    ctx = (reward_terms(state, instance, cfg)
           if cfg.placement_rule == "mcs" else None)
    x, y, l, stable, any_valid = choose_placement(hm, w, d, h, cfg, ctx)
    do = do & any_valid

    xs = jnp.arange(cfg.target_width, dtype=jnp.int32)[:, None]
    ys = jnp.arange(cfg.target_depth, dtype=jnp.int32)[None, :]
    fp = (xs >= x) & (xs < x + w) & (ys >= y) & (ys < y + d)
    hm_new = jnp.where(fp, l + h, hm)

    heightmap = jnp.where(do, state.heightmap.at[c].set(hm_new),
                          state.heightmap)
    # NOTE: mask-compare update, NOT packed.at[b].set(True) — vmapped
    # traced-index scatter on *bool* arrays miscompiles on the TPU backend
    # (silently drops updates; verified on TPU v5e, jax 0.9/axon). int32
    # scatters (heightmap/placements above) are unaffected.
    sel_b = jnp.arange(state.packed.shape[0], dtype=jnp.int32) == b
    packed = jnp.where(do, state.packed | sel_b, state.packed)
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
