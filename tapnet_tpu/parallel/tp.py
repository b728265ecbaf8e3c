"""Tensor-parallel expressibility: ('data','model') mesh + PartitionSpec rules.

SURVEY.md §2.3: the reference has no TP (single GPU); the rebuild owes an
*expressible* TP path — a 2D mesh and parameter partition rules — while DP
stays the performance path (the pointer net is ~128-hidden; sharding its
GEMMs over chips is latency-bound, not compute-bound).

Rules (Megatron-style column sharding, collective insertion left to GSPMD):
every 2-D Dense kernel whose output dim divides the 'model' axis is sharded
P(None, 'model') with its bias P('model'); everything else (LayerNorm scales,
attention vector v, embeddings) is replicated. Activations stay replicated at
the module boundary, so a TP-sharded forward equals the replicated forward up
to float reassociation in GSPMD's gathers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_model_mesh(n_data: int, n_model: int,
                    devices: Optional[Sequence[jax.Device]] = None,
                    axes=("data", "model")) -> Mesh:
    """2D mesh: n_data x n_model over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) < n_data * n_model:
        raise RuntimeError(f"need {n_data * n_model} devices, "
                           f"found {len(devices)}")
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axes)


def tp_spec(path, leaf, n_model: int, axis: str = "model") -> P:
    """PartitionSpec for one param leaf under column-sharded TP."""
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    is_kernel = names and names[-1] == "kernel"
    is_bias = names and names[-1] == "bias"
    if is_kernel and leaf.ndim == 2 and leaf.shape[1] % n_model == 0:
        return P(None, axis)
    if is_bias and leaf.ndim == 1 and leaf.shape[0] % n_model == 0:
        return P(axis)
    return P()


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put a param tree with Dense kernels column-sharded over `axis`."""
    n_model = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, tp_spec(path, x, n_model, axis))), params)


def tp_sharding_tree(params, mesh: Mesh, axis: str = "model"):
    """The NamedSharding tree shard_params_tp applies (for pjit in_shardings)."""
    n_model = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, tp_spec(path, x, n_model, axis)),
        params)
