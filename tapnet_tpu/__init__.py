"""tapnet_tpu — a TPU-native transport-and-pack (TAP) framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Juzhan/TAP-Net
(reference layout per SURVEY.md; exact semantics frozen in SPEC.md):
batched heightmap packing environments stepped in lockstep under jit/vmap,
precedence/accessibility masks as batched boolean adjacency ops, a fused
Pallas C/P/S reward kernel, pointer-network RL training, and multi-host
data-parallel scaling via jax.sharding meshes.
"""

import jax

# Threefry bits are identical across CPU/TPU backends; pinning the impl makes
# "fixed seed" mean one thing for the CPU oracle and the TPU env (SPEC.md §2).
jax.config.update("jax_default_prng_impl", "threefry2x32")

from tapnet_tpu.config import TAPConfig, CONFIGS  # noqa: E402,F401

__version__ = "0.1.0"

from tapnet_tpu.infer import pack, PackingPlan, PackingStep  # noqa: E402,F401
