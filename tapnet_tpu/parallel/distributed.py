"""Multi-host runtime bring-up (SURVEY.md §2.3 / §5 comm-backend row).

The reference has no distributed runtime at all; here multi-host = one
jax.distributed.initialize() per host process, after which jax.devices()
spans the pod slice and the same jitted train step scales — XLA routes
collectives over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize the multi-host runtime if a multi-process env is configured.

    Returns True if jax.distributed was initialized. On TPU pods the three
    arguments are auto-detected from the metadata/env; explicit values (or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) override.
    Single-host runs are a no-op so the same entry point works everywhere.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    explicit = coordinator_address is not None
    auto_tpu_pod = (os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)
    if not explicit and not auto_tpu_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global(tree, mesh, spec=None):
    """Build global (possibly cross-process) arrays from per-host data.

    Each process passes the FULL logical value of every leaf; leaves become
    global jax.Arrays laid out per `spec` (default: fully replicated) on
    `mesh`. Works in single-process runs too, so callers need no branching.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = spec if spec is not None else P()

    def put(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                         jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            data = put(np.asarray(jax.random.key_data(x)))
            return jax.random.wrap_key_data(data, impl=impl)
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.tree.map(put, tree)


def local_value(x):
    """Host-local view of a (replicated) global array's first local shard."""
    return x.addressable_data(0)
