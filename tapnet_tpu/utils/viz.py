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


def _draw_block_3d(ax, x, y, z, w, d, h, color):
    """One axis-aligned box as a bar3d voxel."""
    ax.bar3d(x, y, z, w, d, h, color=color, edgecolor="k", linewidth=0.4,
             alpha=0.95, shade=True)


def render_3d_blocks(instance: Instance, state: EnvState, cfg: TAPConfig,
                     path: Optional[str] = None, title: str = ""):
    """Block-level 3D view: initial container + each target container.

    Every placed block is drawn as a colored voxel box at its recorded
    (x, y, landing) position with its rotated dims — the reference-style
    3D packing render (SURVEY.md §2.1 visualization row), not a heightmap.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = int(instance.n_total)
    cols = _colors(n)
    C = cfg.num_containers
    fig = plt.figure(figsize=(4 * (1 + C), 4.2))

    ax = fig.add_subplot(1, 1 + C, 1, projection="3d")
    ax.set_title("initial")
    for b in range(n):
        x, y, z = (int(v) for v in instance.pos0[b])
        w, d, h = (int(v) for v in instance.dims[b])
        _draw_block_3d(ax, x, y, z, w, d, h, cols[b])
    ax.set_xlim(0, cfg.container_width)
    ax.set_ylim(0, max(cfg.container_depth, 1))
    ax.set_zlim(0, cfg.container_height)

    placements = np.asarray(state.placements)
    for c in range(C):
        ax = fig.add_subplot(1, 1 + C, 2 + c, projection="3d")
        ax.set_title(f"target {c}")
        top = 1
        for b in range(n):
            pl = placements[b]
            if int(pl[PLACE_CONTAINER]) != c:
                continue
            w, d, h = _rotated(instance.dims[b], int(pl[PLACE_ROT]), cfg)
            x, y, z = int(pl[PLACE_X]), int(pl[PLACE_Y]), int(pl[PLACE_Z])
            _draw_block_3d(ax, x, y, z, w, d, h, cols[b])
            top = max(top, z + h)
        ax.set_xlim(0, cfg.target_width)
        ax.set_ylim(0, max(cfg.target_depth, 1))
        ax.set_zlim(0, max(top, cfg.container_height))
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
    return fig


def render_animation(instance: Instance, actions: Sequence[int],
                     cfg: TAPConfig, path: str, fps: int = 2):
    """Animated GIF of the transport sequence (2D rectangles or 3D voxels).

    Each frame replays the trajectory prefix through the env (exact same
    transition as training) and draws the target container(s) after that
    placement; the final frame holds. Requires a .gif path (PillowWriter).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter
    from matplotlib.patches import Rectangle
    import jax.numpy as jnp
    from tapnet_tpu.env import core as E

    steps = [a for a in np.asarray(actions).tolist() if a >= 0]
    state = E.reset(instance, cfg)
    frames = [state]
    for a in steps:
        state = E.step(state, jnp.int32(a), instance, cfg)
        frames.append(state)

    n = int(instance.n_total)
    cols = _colors(n)
    C = cfg.num_containers
    three_d = cfg.dim == 3
    fig = plt.figure(figsize=(4 * C, 4))

    def draw(i):
        fig.clf()
        st = frames[i]
        placements = np.asarray(st.placements)
        label = "start" if i == 0 else (
            f"t={i - 1}: block {int(cfg.decompose_action(steps[i - 1])[0])}")
        for c in range(C):
            if three_d:
                ax = fig.add_subplot(1, C, 1 + c, projection="3d")
            else:
                ax = fig.add_subplot(1, C, 1 + c)
            ax.set_title(f"target {c} — {label}", fontsize=9)
            for b in range(n):
                pl = placements[b]
                if int(pl[PLACE_CONTAINER]) != c:
                    continue
                w, d, h = _rotated(instance.dims[b], int(pl[PLACE_ROT]), cfg)
                x, y, z = (int(pl[PLACE_X]), int(pl[PLACE_Y]),
                           int(pl[PLACE_Z]))
                if three_d:
                    _draw_block_3d(ax, x, y, z, w, d, h, cols[b])
                else:
                    ax.add_patch(Rectangle((x, z), w, h, facecolor=cols[b],
                                           edgecolor="k", linewidth=0.6))
            if three_d:
                ax.set_xlim(0, cfg.target_width)
                ax.set_ylim(0, max(cfg.target_depth, 1))
                ax.set_zlim(0, cfg.container_height * 1.5)
            else:
                ax.set_xlim(0, cfg.target_width)
                ax.set_ylim(0, cfg.container_height * 1.5)
                ax.set_aspect("equal")

    anim = FuncAnimation(fig, draw, frames=len(frames))
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return path


def render(instance: Instance, state: EnvState, cfg: TAPConfig,
           path: Optional[str] = None, title: str = "",
           blocks_3d: bool = True):
    if cfg.dim == 2:
        return render_2d(instance, state, cfg, path, title)
    if blocks_3d:
        return render_3d_blocks(instance, state, cfg, path, title)
    return render_3d(instance, state, cfg, path, title)


def render_sequence(instance: Instance, actions: Sequence[int],
                    cfg: TAPConfig, path: str):
    """Replay a trajectory, one panel per placement (2D rects / 3D voxels)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle
    import jax.numpy as jnp
    from tapnet_tpu.env import core as E

    steps = [a for a in np.asarray(actions).tolist() if a >= 0]
    state = E.reset(instance, cfg)
    frames = []
    for a in steps:
        state = E.step(state, jnp.int32(a), instance, cfg)
        frames.append(state)
    k = max(len(frames), 1)
    three_d = cfg.dim == 3
    fig = plt.figure(figsize=(3 * k, 3.5))
    cols = _colors(int(instance.n_total))
    for i, st in enumerate(frames):
        b, r, c = cfg.decompose_action(steps[i])
        ax = fig.add_subplot(1, k, 1 + i,
                             projection="3d" if three_d else None)
        ax.set_title(f"t={i}: block {int(b)}" + (" rot" if r else ""),
                     fontsize=9)
        for bb in range(int(instance.n_total)):
            pl = np.asarray(st.placements[bb])
            if pl[PLACE_CONTAINER] < 0:
                continue
            w, d, h = _rotated(instance.dims[bb], int(pl[PLACE_ROT]), cfg)
            x, y, z = int(pl[PLACE_X]), int(pl[PLACE_Y]), int(pl[PLACE_Z])
            if three_d:
                _draw_block_3d(ax, x, y, z, w, d, h, cols[bb])
            else:
                ax.add_patch(Rectangle((x, z), w, h, facecolor=cols[bb],
                                       edgecolor="k", linewidth=0.6))
        if three_d:
            ax.set_xlim(0, cfg.target_width)
            ax.set_ylim(0, max(cfg.target_depth, 1))
            ax.set_zlim(0, cfg.container_height * 1.5)
        else:
            ax.set_xlim(0, cfg.target_width)
            ax.set_ylim(0, cfg.container_height * 1.5)
            ax.set_aspect("equal")
            ax.set_xticks([])
            ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
