"""Visualization: render initial/target containers and packing sequences.

Covers the reference's matplotlib drawing helpers (SURVEY.md §1 L6,
`tools.py` render functions, unverified) as a host-side debug tool: 2D tasks
render block rectangles in the x-z plane; 3D tasks render per-container
heightmap images plus a top-down footprint map. Pure matplotlib, PNG output.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.types import (EnvState, Instance, PLACE_CONTAINER, PLACE_ROT,
                              PLACE_X, PLACE_Y, PLACE_Z, PLACE_STABLE)


def _colors(n: int):
    import matplotlib.cm as cm
    return [cm.tab20(i % 20) for i in range(n)]


def _rotated(dims, r, cfg):
    w, d, h = (int(v) for v in dims)
    if r == 1:
        v = [w, d, h]
        a0, a1 = cfg.rot_axes
        v[a0], v[a1] = v[a1], v[a0]
        w, d, h = v
    return w, d, h


def render_2d(instance: Instance, state: EnvState, cfg: TAPConfig,
              path: Optional[str] = None, title: str = ""):
    """Initial container + each target container, blocks colored by index."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    n = int(instance.n_total)
    cols = _colors(n)
    C = cfg.num_containers
    fig, axes = plt.subplots(1, 1 + C, figsize=(4 * (1 + C), 4))
    axes = np.atleast_1d(axes)

    ax = axes[0]
    ax.set_title("initial")
    for b in range(n):
        x, _, z = (int(v) for v in instance.pos0[b])
        w, _, h = (int(v) for v in instance.dims[b])
        ax.add_patch(Rectangle((x, z), w, h, facecolor=cols[b],
                               edgecolor="k", linewidth=0.8))
        ax.text(x + w / 2, z + h / 2, str(b), ha="center", va="center",
                fontsize=8)
    ax.set_xlim(0, cfg.container_width)
    ax.set_ylim(0, cfg.container_height)
    ax.set_aspect("equal")

    for c in range(C):
        ax = axes[1 + c]
        ax.set_title(f"target {c}")
        top = 1
        for b in range(n):
            pl = state.placements[b]
            if int(pl[PLACE_CONTAINER]) != c:
                continue
            w, _, h = _rotated(instance.dims[b], int(pl[PLACE_ROT]), cfg)
            x, z = int(pl[PLACE_X]), int(pl[PLACE_Z])
            hatch = None if int(pl[PLACE_STABLE]) else "//"
            ax.add_patch(Rectangle((x, z), w, h, facecolor=cols[b],
                                   edgecolor="k", linewidth=0.8, hatch=hatch))
            ax.text(x + w / 2, z + h / 2, str(b), ha="center", va="center",
                    fontsize=8)
            top = max(top, z + h)
        ax.set_xlim(0, cfg.target_width)
        ax.set_ylim(0, max(top, cfg.container_height))
        ax.set_aspect("equal")

    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
    return fig


def render_3d(instance: Instance, state: EnvState, cfg: TAPConfig,
              path: Optional[str] = None, title: str = ""):
    """Heightmap images per target container (top-down, annotated max h)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    C = cfg.num_containers
    hm = np.asarray(state.heightmap)
    fig, axes = plt.subplots(1, C, figsize=(4 * C, 4), squeeze=False)
    for c in range(C):
        ax = axes[0][c]
        im = ax.imshow(hm[c].T, origin="lower", cmap="viridis")
        ax.set_title(f"target {c} (max h = {hm[c].max()})")
        fig.colorbar(im, ax=ax, shrink=0.8)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
    return fig


def render(instance: Instance, state: EnvState, cfg: TAPConfig,
           path: Optional[str] = None, title: str = ""):
    fn = render_2d if cfg.dim == 2 else render_3d
    return fn(instance, state, cfg, path, title)


def render_sequence(instance: Instance, actions: Sequence[int],
                    cfg: TAPConfig, path: str):
    """Replay a trajectory, one panel per placement (2D packing sequence)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp
    from tapnet_tpu.env import core as E

    steps = [a for a in np.asarray(actions).tolist() if a >= 0]
    state = E.reset(instance, cfg)
    frames = []
    for a in steps:
        state = E.step(state, jnp.int32(a), instance, cfg)
        frames.append(state)
    k = len(frames)
    fig, axes = plt.subplots(1, max(k, 1), figsize=(3 * max(k, 1), 3.5),
                             squeeze=False)
    from matplotlib.patches import Rectangle
    cols = _colors(int(instance.n_total))
    for i, st in enumerate(frames):
        ax = axes[0][i]
        b, r, c = cfg.decompose_action(steps[i])
        ax.set_title(f"t={i}: block {int(b)}" + (" rot" if r else ""))
        for bb in range(int(instance.n_total)):
            pl = np.asarray(st.placements[bb])
            if pl[PLACE_CONTAINER] < 0:
                continue
            w, _, h = _rotated(instance.dims[bb], int(pl[PLACE_ROT]), cfg)
            ax.add_patch(Rectangle((int(pl[PLACE_X]), int(pl[PLACE_Z])), w, h,
                                   facecolor=cols[bb], edgecolor="k",
                                   linewidth=0.6))
        ax.set_xlim(0, cfg.target_width)
        ax.set_ylim(0, cfg.container_height * 1.5)
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
