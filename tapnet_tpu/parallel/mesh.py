"""Mesh construction and sharding helpers (SURVEY.md §2.3).

Design (scaling-book recipe): a 1D ('data',) mesh over all chips; the env is
embarrassingly parallel over instances (zero-communication), so the only
collectives are the gradient psum XLA inserts for the learner and eval-time
all_gathers. A ('data','model') 2D mesh is expressible for TP but the model
is tiny (hidden ~128) — DP is the performance path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = "data") -> Mesh:
    """1D mesh over the given (default: all) devices."""
    import numpy as np
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def cpu_mesh(n_devices: int, axis: str = "data") -> Mesh:
    """Mesh over host-platform CPU devices (virtual-multichip testing).

    Requires --xla_force_host_platform_device_count=<n> in XLA_FLAGS at
    process start; works even when the default backend is a TPU, because the
    mesh names its devices explicitly.
    """
    cpus = jax.devices("cpu")
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"need {n_devices} CPU devices but found {len(cpus)}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_devices} before starting the process")
    return data_mesh(cpus[:n_devices], axis)


def shard_leading_axis(tree, mesh: Mesh, axis: str = "data"):
    """Constrain every leaf's leading axis to be sharded over `axis`."""
    def con(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))
    return jax.tree.map(con, tree)


def replicate(tree, mesh: Mesh):
    """Constrain every leaf to be fully replicated over the mesh."""
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P())), tree)


def put_sharded(tree, mesh: Mesh, axis: str = "data"):
    """Device_put a host batch with its leading axis sharded over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def put_replicated(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
