"""Feature extraction: env pytrees -> fixed-shape model inputs.

The reference feeds the net static block dims per rotation plus dynamic
packed/accessible flags and the target heightmap (SURVEY.md §2.1 Actor row);
here the same information becomes three static-shape float32 tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.env.core import _accessibility
from tapnet_tpu.types import EnvState, Instance


def _scale(cfg: TAPConfig) -> float:
    return float(max(cfg.container_width, cfg.container_depth,
                     cfg.container_height, cfg.target_width, cfg.target_depth))


def static_tokens(instance: Instance, cfg: TAPConfig) -> jax.Array:
    """Per (block, rot) static features [N*R, 4]: rotated dims + volume."""
    s = _scale(cfg)
    toks = []
    for r in range(cfg.num_rot):
        dims = instance.dims
        if r == 1:
            ax0, ax1 = cfg.rot_axes
            perm = [ax1 if k == ax0 else ax0 if k == ax1 else k for k in range(3)]
            dims = dims[:, jnp.array(perm)]
        vol = jnp.prod(dims, axis=1, keepdims=True)
        toks.append(jnp.concatenate(
            [dims.astype(jnp.float32) / s,
             vol.astype(jnp.float32) / s**cfg.dim], axis=1))
    return jnp.stack(toks, axis=1).reshape(cfg.num_blocks * cfg.num_rot, 4)


def dynamic_tokens(instance: Instance, state: EnvState,
                   cfg: TAPConfig) -> jax.Array:
    """Per (block, rot) dynamic features [N*R, 4]: packed/accessible/window/t."""
    acc0, accr = _accessibility(instance, state.packed)
    if cfg.window > 0:
        rank = jnp.cumsum(acc0.astype(jnp.int32)) - acc0.astype(jnp.int32)
        win = acc0 & (rank < cfg.window)
    else:
        win = acc0
    per_rot = []
    for r in range(cfg.num_rot):
        acc = acc0 if r == 0 else accr
        per_rot.append(jnp.stack([
            state.packed.astype(jnp.float32),
            acc.astype(jnp.float32),
            win.astype(jnp.float32),
            jnp.full((cfg.num_blocks,), state.t / cfg.num_blocks,
                     jnp.float32),
        ], axis=1))
    return jnp.stack(per_rot, axis=1).reshape(cfg.num_blocks * cfg.num_rot, 4)


def heightmap_features(state: EnvState, cfg: TAPConfig) -> jax.Array:
    """Normalized per-container heightmap grid [C, Wt, Dt, 1] (CNN input)."""
    s = _scale(cfg)
    return (state.heightmap.astype(jnp.float32) / s)[..., None]


def heightmap_grid(heightmap: jax.Array, cfg: TAPConfig) -> jax.Array:
    """As heightmap_features, but from a raw heightmap array (replay path)."""
    s = _scale(cfg)
    return (heightmap.astype(jnp.float32) / s)[..., None]


def dynamic_tokens_from(instance: Instance, packed: jax.Array, t: jax.Array,
                        cfg: TAPConfig) -> jax.Array:
    """dynamic_tokens from raw (packed, t) instead of an EnvState (replay)."""
    return dynamic_tokens(instance, EnvState(heightmap=None, packed=packed,
                                             placements=None, t=t), cfg)


def build_tokens(instance: Instance, state: EnvState, cfg: TAPConfig):
    """(static [T,4], dynamic [T,4], heightmap [C,Wt,Dt,1]) for one instance."""
    return (static_tokens(instance, cfg),
            dynamic_tokens(instance, state, cfg),
            heightmap_features(state, cfg))
