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


def dynamic_flags(instance: Instance, packed: jax.Array,
                  cfg: TAPConfig) -> jax.Array:
    """Per-block dynamic state as uint8 bit flags [N].

    bit0 = packed, bit1 = accessible (no rotation), bit2 = accessible with
    rotation, bit3 = inside the rolling observation window. Recording these
    4 bits per block during the rollout lets the replay pass rebuild every
    dynamic token with elementwise bit ops — no dependency-graph reductions
    or window cumsums re-run per decode row (round-2 PROFILE.md target).
    """
    acc0, accr = _accessibility(instance, packed)
    if cfg.window > 0:
        rank = jnp.cumsum(acc0.astype(jnp.int32)) - acc0.astype(jnp.int32)
        win = acc0 & (rank < cfg.window)
    else:
        win = acc0
    return (packed.astype(jnp.uint8)
            | (acc0.astype(jnp.uint8) << 1)
            | (accr.astype(jnp.uint8) << 2)
            | (win.astype(jnp.uint8) << 3))


def tokens_from_flags(flags: jax.Array, t_frac, cfg: TAPConfig) -> jax.Array:
    """Expand dynamic_flags to model tokens: uint8[..., n] -> [..., n*R, 4].

    t_frac (decode progress, t/N) must broadcast against flags[..., n].
    Fully vectorized over any leading axes (replay feeds [K, B, N] slabs),
    and over any SUBSET of blocks on the last axis (the windowed replay
    gathers the <=window observable blocks before expanding).
    """
    f = flags.astype(jnp.int32)
    packed = (f & 1).astype(jnp.float32)
    acc0 = ((f >> 1) & 1).astype(jnp.float32)
    accr = ((f >> 2) & 1).astype(jnp.float32)
    win = ((f >> 3) & 1).astype(jnp.float32)
    tf = jnp.broadcast_to(jnp.asarray(t_frac, jnp.float32)[..., None],
                          packed.shape)
    per_rot = [jnp.stack([packed, acc0 if r == 0 else accr, win, tf], axis=-1)
               for r in range(cfg.num_rot)]
    toks = jnp.stack(per_rot, axis=-2)               # [..., n, R, 4]
    return toks.reshape(flags.shape[:-1]
                        + (flags.shape[-1] * cfg.num_rot, 4))


def dynamic_tokens(instance: Instance, state: EnvState,
                   cfg: TAPConfig) -> jax.Array:
    """Per (block, rot) dynamic features [N*R, 4]: packed/accessible/window/t."""
    return tokens_from_flags(dynamic_flags(instance, state.packed, cfg),
                             state.t / cfg.num_blocks, cfg)


def heightmap_features(state: EnvState, cfg: TAPConfig) -> jax.Array:
    """Normalized per-container heightmap grid [C, Wt, Dt, 1] (CNN input)."""
    s = _scale(cfg)
    return (state.heightmap.astype(jnp.float32) / s)[..., None]


def heightmap_grid(heightmap: jax.Array, cfg: TAPConfig) -> jax.Array:
    """As heightmap_features, but from a raw heightmap array (replay path)."""
    s = _scale(cfg)
    return (heightmap.astype(jnp.float32) / s)[..., None]


def mask_from_flags(flags: jax.Array, instance: Instance,
                    cfg: TAPConfig) -> jax.Array:
    """Rebuild the action mask from recorded dynamic flags: uint8[..., N]
    -> bool[..., A]. Valid for UNBOUNDED-height configs only (a finite cap
    makes the mask depend on per-action candidate scans of the heightmap,
    SPEC.md §5) — callers must check cfg.target_height == 0.

    Lets the replay pass drop the recorded [N, B, A] mask from its working
    set: the mask is a pure function of (flags, static dims)."""
    assert cfg.target_height == 0
    f = flags.astype(jnp.int32)
    win = ((f >> 3) & 1).astype(bool)
    accr = ((f >> 2) & 1).astype(bool)
    per_rot = []
    for r in range(cfg.num_rot):
        dims = instance.dims
        if r == 1:
            ax0, ax1 = cfg.rot_axes
            perm = [ax1 if k == ax0 else ax0 if k == ax1 else k
                    for k in range(3)]
            dims = dims[..., jnp.array(perm)]
        fits = ((dims[..., 0] <= cfg.target_width)
                & (dims[..., 1] <= cfg.target_depth))      # [..., N]
        ok = win if r == 0 else (win & accr)
        per_rot.append(ok & fits)
    mask_br = jnp.stack(per_rot, axis=-1)                  # [..., N, R]
    mask = jnp.broadcast_to(mask_br[..., None],
                            mask_br.shape + (cfg.num_containers,))
    return mask.reshape(flags.shape[:-1] + (cfg.num_actions,))


def merge_tokens(static: jax.Array, dynamic: jax.Array) -> jax.Array:
    """Append static dims features to dynamic tokens (broadcast over any
    extra leading axes of `dynamic`, e.g. the replay's decode-step axis).

    The actor's narrow per-step dyn MLP consumes the merged tokens so it
    can model static x dynamic interactions without re-running the deep
    static encoder per decode row (models/tapnet.py round-3 design)."""
    target = dynamic.shape[:-1] + static.shape[-1:]
    return jnp.concatenate([dynamic, jnp.broadcast_to(static, target)],
                           axis=-1)


def build_tokens(instance: Instance, state: EnvState, cfg: TAPConfig):
    """(static [T,4], dynamic [T,4], heightmap [C,Wt,Dt,1]) for one instance."""
    return (static_tokens(instance, cfg),
            dynamic_tokens(instance, state, cfg),
            heightmap_features(state, cfg))
