"""TPU kernels (Pallas) and batched compute ops.

The reference has no custom-kernel tier (SURVEY.md §2.2 — pure Python/torch);
this package is the rebuild's native tier: the fused C+P+S reward reduction
over batched heightmaps runs as a single-VMEM-pass Pallas kernel
(BASELINE.json names this deliverable), parity-tested bit-exactly against the
jnp composition it replaces.
"""

from tapnet_tpu.ops.pallas_reward import (  # noqa: F401
    heightmap_reductions, batched_reward_terms, batched_reward,
)
