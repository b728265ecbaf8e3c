"""Fused C+P+S reward reductions over batched heightmaps (Pallas TPU kernel).

BASELINE.json: "compactness+pyramidality+stability reward computed as a fused
Pallas kernel over batched heightmaps". One VMEM pass per heightmap tile
computes max (-> compactness denominator) and sum (-> pyramidality
denominator) together; int32 accumulators keep it bit-exact vs the jnp
composition (`tapnet_tpu.env.core.reward_terms`), which remains the reference
implementation and the CPU fallback.

Layout: heightmaps [B, C, W, D] -> rows [B*C, P] with P = W*D padded to a
multiple of 128 lanes (zero padding is neutral for both max and sum since
heights are >= 0); rows padded to a multiple of the 8-sublane tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _reduce_kernel(hm_ref, max_ref, sum_ref):
    x = hm_ref[:]
    max_ref[:] = jnp.max(x, axis=1, keepdims=True)
    sum_ref[:] = jnp.sum(x, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def heightmap_reductions(heightmaps: jax.Array, interpret: bool = False):
    """(maxh, under): per-container max and sum of [B, C, W, D] heightmaps.

    Returns two int32[B, C] arrays. Uses the fused Pallas kernel; set
    interpret=True off-TPU (tests run it in interpreter mode on CPU).
    """
    B, C, W, D = heightmaps.shape
    P = _round_up(W * D, LANES)
    rows = B * C
    rows_p = _round_up(rows, SUBLANES)
    x = heightmaps.reshape(rows, W * D)
    x = jnp.pad(x, ((0, rows_p - rows), (0, P - W * D)))

    tile = min(rows_p, 512)  # keep each VMEM block small; grid over the rest
    # ensure tile divides rows_p
    while rows_p % tile:
        tile //= 2
    grid = (rows_p // tile,)
    mx, sm = pl.pallas_call(
        _reduce_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows_p, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows_p, 1), jnp.int32),
        ),
        interpret=interpret,
    )(x)
    return (mx[:rows, 0].reshape(B, C), sm[:rows, 0].reshape(B, C))


def batched_reward_terms(heightmaps, placements, dims, interpret: bool = False):
    """Integer reward terms for a whole batch in one fused pass.

    heightmaps int32[B, C, W, D]; placements int32[B, N, 6]; dims int32[B, N, 3].
    Returns (vol, denom_c, denom_p, s_num, s_den), each int32[B] — bit-equal
    to vmapping `env.core.reward_terms` (SPEC.md §7).
    """
    B, C, W, D = heightmaps.shape
    maxh, under = heightmap_reductions(heightmaps, interpret=interpret)
    used = maxh > 0
    area = W * D
    denom_c = jnp.sum(jnp.where(used, area * maxh, 0), axis=1)
    denom_p = jnp.sum(jnp.where(used, under, 0), axis=1)

    placed = placements[:, :, 0] >= 0
    vol = jnp.sum(jnp.where(placed, jnp.prod(dims, axis=2), 0), axis=1)
    s_num = jnp.sum(jnp.where(placed, placements[:, :, 5], 0), axis=1)
    s_den = jnp.sum(placed.astype(jnp.int32), axis=1)
    return vol, denom_c, denom_p, s_num, s_den


def batched_reward(heightmaps, placements, dims, reward_terms_cfg,
                   interpret: bool = False):
    """float32[B] rewards; reward_terms_cfg e.g. ('C','P','S')."""
    vol, denom_c, denom_p, s_num, s_den = batched_reward_terms(
        heightmaps, placements, dims, interpret=interpret)
    f = lambda n, d: jnp.where(d > 0, n.astype(jnp.float32) /
                               jnp.maximum(d, 1).astype(jnp.float32), 0.0)
    terms = {"C": f(vol, denom_c), "P": f(vol, denom_p), "S": f(s_num, s_den)}
    return sum(terms[t] for t in reward_terms_cfg)
