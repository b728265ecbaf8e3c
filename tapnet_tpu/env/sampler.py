"""On-device seeded instance sampler (SPEC.md §2), the jitted twin of
`tapnet_tpu/oracle/generator.py`.

Replaces the reference's offline `generate.py` dataset writer (SURVEY.md §3.3)
with a `lax.scan` of guillotine splits sharing the oracle's exact threefry key
schedule — same key, bit-identical instance. `vmap` over keys yields batches;
no host data loading exists at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.oracle.generator import MIX_FOLD, N_TOTAL_FOLD
from tapnet_tpu.types import Instance


def _bits(key) -> jax.Array:
    return jax.random.bits(key, dtype=jnp.uint32)


def _umod(r: jax.Array, m: jax.Array) -> jax.Array:
    """r % m with python-int semantics on uint32 draws (m >= 1, int32)."""
    return (r % m.astype(jnp.uint32)).astype(jnp.int32)


def _nth_true(mask: jax.Array, k: jax.Array) -> jax.Array:
    """Index of the k-th True in mask (k < mask.sum())."""
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    return jnp.argmax(mask & (rank == k)).astype(jnp.int32)


def sample_instance(key, cfg: TAPConfig, flat=False) -> Instance:
    """Generate one instance; jit/vmap-safe. Bit-exact vs the oracle.

    `flat` (bool, may be traced): SPEC.md §9 mixed sampling — generate a 2D
    (depth-1, split axes (x, z)) instance inside a 3D env.

    TPU layout note: the scan carries SIX per-axis [N] vectors instead of
    [N, 3] matrices, and selects rows via one-hot reductions instead of
    traced gathers/scatters. Under vmap a [B, N, 3] carry tiles its (N, 3)
    minor dims to (8, 128) — a ~68x physical inflation that made this loop
    dominate the whole train step (6 of 12 ms at batch 4096); [B, N]
    vectors pad only the lane dim. All split draws are hoisted out of the
    scan in one batched threefry sweep (bit-identical schedule:
    fold_in(key, i) -> split(3) -> bits).
    """
    N = cfg.num_blocks
    flat = jnp.asarray(flat)
    en = [ax in cfg.split_axes for ax in range(3)]       # python bools
    en1 = jnp.logical_and(en[1], ~flat)                  # y splits off if flat

    depth0 = jnp.where(flat, 1, cfg.container_depth).astype(jnp.int32)
    zero = jnp.zeros((N,), jnp.int32)
    row0 = jnp.arange(N, dtype=jnp.int32) == 0
    ones = jnp.ones((N,), jnp.int32)
    sx = jnp.where(row0, jnp.int32(cfg.container_width), ones)
    sy = jnp.where(row0, depth0, ones)
    sz = jnp.where(row0, jnp.int32(cfg.container_height), ones)
    px, py, pz = zero, zero, zero

    span = cfg.num_blocks - cfg.min_blocks + 1
    n_total = cfg.min_blocks + _umod(
        _bits(jax.random.fold_in(key, N_TOTAL_FOLD)), jnp.int32(span))

    def draws(i):
        kr, ka, kp = jax.random.split(jax.random.fold_in(key, i), 3)
        return _bits(kr), _bits(ka), _bits(kp)

    rbits = jax.vmap(draws)(jnp.arange(N - 1, dtype=jnp.int32))
    iota = jnp.arange(N, dtype=jnp.int32)

    def body(carry, x):
        i, r_rect, r_axis, r_pos = x
        px, py, pz, sx, sy, sz, n = carry
        active = i < n_total - 1

        valid = iota < n
        can0 = (sx >= 2) if en[0] else jnp.zeros((N,), bool)
        can1 = (sy >= 2) & en1
        can2 = (sz >= 2) if en[2] else jnp.zeros((N,), bool)
        splittable = valid & (can0 | can1 | can2)
        m = splittable.sum().astype(jnp.int32)
        sel = _umod(r_rect, jnp.maximum(m, 1))
        rank = jnp.cumsum(splittable.astype(jnp.int32)) - splittable
        j_oh = splittable & (rank == sel)                # one-hot row j

        pick = lambda a: jnp.sum(jnp.where(j_oh, a, 0))
        sxj, syj, szj = pick(sx), pick(sy), pick(sz)
        pxj, pyj, pzj = pick(px), pick(py), pick(pz)

        a0 = (sxj >= 2) if en[0] else jnp.bool_(False)
        a1 = (syj >= 2) & en1
        a2 = (szj >= 2) if en[2] else jnp.bool_(False)
        na = (a0.astype(jnp.int32) + a1.astype(jnp.int32)
              + a2.astype(jnp.int32))
        sela = _umod(r_axis, jnp.maximum(na, 1))
        r1 = a0.astype(jnp.int32)
        r2 = r1 + a1.astype(jnp.int32)
        is0 = a0 & (sela == 0)
        is1 = a1 & (r1 == sela)
        is2 = a2 & (r2 == sela)

        s = (jnp.where(is0, sxj, 0) + jnp.where(is1, syj, 0)
             + jnp.where(is2, szj, 0))
        cut = 1 + _umod(r_pos, jnp.maximum(s - 1, 1))

        n_oh = (iota == n) & active
        j_act = j_oh & active
        # size[j, axis] = cut
        sx = jnp.where(j_act & is0, cut, sx)
        sy = jnp.where(j_act & is1, cut, sy)
        sz = jnp.where(j_act & is2, cut, sz)
        # row n: pos = pos[j] + axis*cut; size = size[j] with axis -> s-cut
        px = jnp.where(n_oh, pxj + jnp.where(is0, cut, 0), px)
        py = jnp.where(n_oh, pyj + jnp.where(is1, cut, 0), py)
        pz = jnp.where(n_oh, pzj + jnp.where(is2, cut, 0), pz)
        sx = jnp.where(n_oh, jnp.where(is0, s - cut, sxj), sx)
        sy = jnp.where(n_oh, jnp.where(is1, s - cut, syj), sy)
        sz = jnp.where(n_oh, jnp.where(is2, s - cut, szj), sz)
        n = n + active.astype(jnp.int32)
        return (px, py, pz, sx, sy, sz, n), None

    (px, py, pz, sx, sy, sz, _), _ = jax.lax.scan(
        body, (px, py, pz, sx, sy, sz, jnp.int32(1)),
        (jnp.arange(N - 1, dtype=jnp.int32),) + tuple(rbits))

    pos = jnp.stack([px, py, pz], axis=-1)
    size = jnp.stack([sx, sy, sz], axis=-1)
    up = build_up_edges(size, pos, n_total)
    rot = build_rot_edges(size, pos, n_total, cfg)
    return Instance(dims=size, pos0=pos, n_total=n_total, up=up, rot=rot)


def _overlap1d(a0, alen, b0, blen):
    """Half-open overlap, broadcast over [a, b] index grids (SPEC.md §3)."""
    return (a0[:, None] < b0[None, :] + blen[None, :]) & (
        b0[None, :] < a0[:, None] + alen[:, None])


def build_up_edges(dims, pos, n_total) -> jax.Array:
    """Batched boolean adjacency: up[a, b] = a obstructs b (SPEC.md §3)."""
    N = dims.shape[0]
    real = jnp.arange(N, dtype=jnp.int32) < n_total
    xov = _overlap1d(pos[:, 0], dims[:, 0], pos[:, 0], dims[:, 0])
    yov = _overlap1d(pos[:, 1], dims[:, 1], pos[:, 1], dims[:, 1])
    above = pos[:, None, 2] >= (pos[None, :, 2] + dims[None, :, 2])
    neq = ~jnp.eye(N, dtype=bool)
    return xov & yov & above & neq & real[:, None] & real[None, :]


def build_rot_edges(dims, pos, n_total, cfg: TAPConfig) -> jax.Array:
    """rot[a, b] = a obstructs removal-with-rotation of b (SPEC.md §3)."""
    N = dims.shape[0]
    ax0, ax1 = cfg.rot_axes
    real = jnp.arange(N, dtype=jnp.int32) < n_total
    s = jnp.maximum(dims[:, ax0], dims[:, ax1])  # per-b swept size

    def swept(axis):
        lo = 2 * pos[:, axis] + dims[:, axis] - s
        hi = 2 * pos[:, axis] + dims[:, axis] + s
        return lo, hi

    sx_lo, sx_hi = swept(0)
    if cfg.dim == 3:
        sy_lo, sy_hi = swept(1)
    else:
        sy_lo, sy_hi = 2 * pos[:, 1], 2 * (pos[:, 1] + dims[:, 1])

    ax_lo, ax_hi = 2 * pos[:, 0], 2 * (pos[:, 0] + dims[:, 0])
    ay_lo, ay_hi = 2 * pos[:, 1], 2 * (pos[:, 1] + dims[:, 1])

    xov = (sx_lo[None, :] < ax_hi[:, None]) & (ax_lo[:, None] < sx_hi[None, :])
    yov = (sy_lo[None, :] < ay_hi[:, None]) & (ay_lo[:, None] < sy_hi[None, :])
    zok = pos[:, None, 2] >= pos[None, :, 2]
    neq = ~jnp.eye(N, dtype=bool)
    return xov & yov & zok & neq & real[:, None] & real[None, :]


def sample_batch(key, batch: int, cfg: TAPConfig) -> Instance:
    """Batch of instances: vmap over per-instance keys."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: sample_instance(k, cfg))(keys)


def sample_batch_mixed(key, batch: int, cfg: TAPConfig,
                       p2d: float = 0.5) -> Instance:
    """Mixed 2D/3D batch (SPEC.md §9): each instance is independently flat
    (depth-1 blocks) with probability ~p2d, via the frozen MIX_FOLD draw —
    bit-exact vs `oracle.generator.generate_instance(key_b, cfg, flat_b)`
    with `flat_b = mix_flat(key_b, p2d)`. 3D envs only."""
    if cfg.dim != 3:
        raise ValueError("mixed 2D/3D batches require a 3D env (dim=3)")
    if cfg.num_blocks > cfg.container_width * cfg.container_height:
        raise ValueError("num_blocks must fit a depth-1 initial container "
                         "for mixed sampling")
    thresh = min(max(int(p2d * 2**32), 0), 2**32)
    keys = jax.random.split(key, batch)

    def one(k):
        flat = _bits(jax.random.fold_in(k, MIX_FOLD)) < jnp.uint32(
            min(thresh, 2**32 - 1)) if thresh < 2**32 else jnp.bool_(True)
        return sample_instance(k, cfg, flat=flat)

    return jax.vmap(one)(keys)
