"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4 ("multi-host without a cluster"): tests run on
xla_force_host_platform_device_count=8 CPU devices. NOTE: this machine's JAX
build registers an `axon` TPU platform that ignores the JAX_PLATFORMS env var,
so we must also force CPU via jax.config.update before any backend use.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is jit-compile-bound (parity/fuzz
# trace many TAPConfig points); caching compiled executables across runs cuts
# repeat wall time by minutes. Safe to delete .jax_cache at any time.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
