"""Debug modes (SURVEY.md §5 race-detection/sanitizer row).

The functional core has no races to detect; what remains meaningful on TPU:
- NaN/Inf checking around jitted computations (jax debug_nans or explicit
  pytree asserts that do not require re-jitting),
- a determinism assert: run a computation twice and require bit-identical
  results (the --deterministic flag behavior).
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def nan_checks():
    """Enable jax debug-nans within the scope (recompiles as needed)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def assert_finite(tree, where: str = "") -> None:
    """Host-side finite check over a pytree (cheap, post-hoc)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            name = jax.tree_util.keystr(path)
            raise FloatingPointError(f"non-finite values at {name} {where}")


def _raw(tree):
    """Typed PRNG-key leaves -> uint32 key data (numpy-comparable)."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x)
        if (hasattr(x, "dtype")
            and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)) else x,
        tree)


def assert_deterministic(fn: Callable, *args, runs: int = 2) -> None:
    """Run fn twice; require bit-identical outputs (--deterministic mode)."""
    outs = [jax.device_get(_raw(fn(*args))) for _ in range(runs)]
    ref = outs[0]
    for i, other in enumerate(outs[1:], 2):
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(other)):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                raise AssertionError(
                    f"non-deterministic result: run 1 vs run {i} differ")
