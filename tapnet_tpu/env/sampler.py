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
    """
    N = cfg.num_blocks
    flat = jnp.asarray(flat)
    axes_enabled = jnp.array([ax in cfg.split_axes for ax in range(3)])
    # where-update, not .at[1].set: bool scatters miscompile on the TPU
    # backend under vmap (see env/core.py step note)
    axes_enabled = jnp.where(jnp.arange(3) == 1,
                             axes_enabled & ~flat, axes_enabled)

    pos = jnp.zeros((N, 3), jnp.int32)
    depth0 = jnp.where(flat, 1, cfg.container_depth).astype(jnp.int32)
    size = jnp.ones((N, 3), jnp.int32).at[0].set(
        jnp.stack([jnp.int32(cfg.container_width), depth0,
                   jnp.int32(cfg.container_height)]))

    span = cfg.num_blocks - cfg.min_blocks + 1
    n_total = cfg.min_blocks + _umod(
        _bits(jax.random.fold_in(key, N_TOTAL_FOLD)), jnp.int32(span))

    # all split draws hoisted out of the scan in one batched threefry sweep
    # (bit-identical schedule: fold_in(key, i) -> split(3) -> bits); the
    # in-loop version re-derived keys per iteration and dominated the whole
    # train step on TPU (9 sequential iterations x ~6 RNG ops each)
    def draws(i):
        kr, ka, kp = jax.random.split(jax.random.fold_in(key, i), 3)
        return _bits(kr), _bits(ka), _bits(kp)

    rbits = jax.vmap(draws)(jnp.arange(N - 1, dtype=jnp.int32))

    def body(carry, x):
        i, r_rect, r_axis, r_pos = x
        pos, size, n = carry
        active = i < n_total - 1

        valid = jnp.arange(N, dtype=jnp.int32) < n
        splittable = valid & ((size >= 2) & axes_enabled).any(axis=1)
        m = splittable.sum().astype(jnp.int32)
        j = _nth_true(splittable, _umod(r_rect, jnp.maximum(m, 1)))

        axes_ok = (size[j] >= 2) & axes_enabled
        na = axes_ok.sum().astype(jnp.int32)
        axis = _nth_true(axes_ok, _umod(r_axis, jnp.maximum(na, 1)))

        s = size[j, axis]
        cut = 1 + _umod(r_pos, jnp.maximum(s - 1, 1))

        new_pos = pos[j].at[axis].add(cut)
        new_size = size[j].at[axis].set(s - cut)
        pos2 = pos.at[n].set(new_pos)
        size2 = size.at[j, axis].set(cut).at[n].set(new_size)

        pos = jnp.where(active, pos2, pos)
        size = jnp.where(active, size2, size)
        n = jnp.where(active, n + 1, n)
        return (pos, size, n), None

    (pos, size, _), _ = jax.lax.scan(
        body, (pos, size, jnp.int32(1)),
        (jnp.arange(N - 1, dtype=jnp.int32),) + tuple(rbits))

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
