"""Core pytree types shared by the oracle and the JAX environment.

The reference keeps instances as ad-hoc numpy arrays written by its generator
(SURVEY.md §1 L1, `generate.py`, unverified). Here an instance is an explicit
pytree of int32 arrays in the unified 3D frame of SPEC.md §1, usable both as
numpy (oracle) and as jax.Array (batched env) leaves.
"""

from __future__ import annotations

from typing import NamedTuple, Any

Array = Any  # np.ndarray or jax.Array


class Instance(NamedTuple):
    """One TAP instance (or a batch with a leading axis).

    dims:    int32[N, 3]  block sizes (w, d, h); padding blocks are (1, 1, 1)
    pos0:    int32[N, 3]  min-corner position in the initial container
    n_total: int32[]      number of real (non-padding) blocks
    up:      bool[N, N]   up[a, b]: a obstructs straight-up removal of b
    rot:     bool[N, N]   rot[a, b]: a obstructs removal-with-rotation of b
    """

    dims: Array
    pos0: Array
    n_total: Array
    up: Array
    rot: Array


class EnvState(NamedTuple):
    """Mutable rollout state (or a batch with a leading axis).

    heightmap:  int32[C, Wt, Dt] per-target-container heightmaps
    packed:     bool[N]
    placements: int32[N, 6]  (container, rot, x, y, landing, stable) per block
    t:          int32[]      steps taken
    """

    heightmap: Array
    packed: Array
    placements: Array
    t: Array


# placements columns
PLACE_CONTAINER = 0
PLACE_ROT = 1
PLACE_X = 2
PLACE_Y = 3
PLACE_Z = 4
PLACE_STABLE = 5
