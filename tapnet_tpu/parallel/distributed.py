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


def broadcast_from_main(tree):
    """Replicate process-0's leaf values to every process.

    SURVEY.md §5 checkpoint contract: process 0 reads the checkpoint file and
    the restored TrainState is *broadcast* on restore — other processes never
    touch the filesystem (their checkpoint dir may not even exist on a real
    pod). Typed PRNG keys are carried as raw key_data and re-wrapped with
    their original impl. Single-process runs are an exact no-op, so the
    trainer calls this unconditionally."""
    import jax

    if jax.process_count() == 1:
        return tree
    import numpy as np
    from jax.experimental import multihost_utils as mh

    is_key = jax.tree.map(
        lambda x: hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key), tree)
    data = jax.tree.map(
        lambda x, k: np.asarray(jax.random.key_data(x)) if k
        else np.asarray(x), tree, is_key)
    out = mh.broadcast_one_to_all(data)
    return jax.tree.map(
        lambda x, k, orig: jax.random.wrap_key_data(
            x, impl=jax.random.key_impl(orig)) if k else x,
        out, is_key, tree)
