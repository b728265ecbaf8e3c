"""Parallelism: device meshes, sharded training, multi-host runtime.

The reference is single-process/single-GPU (SURVEY.md §2.3); this subsystem
is the new TPU-native capability mandated by BASELINE.json's north star: env
batches sharded over a ('data',) mesh axis feeding a sharded learner via XLA
collectives, multi-host via jax.distributed, ≥80% scaling efficiency target.
"""

from tapnet_tpu.parallel.mesh import data_mesh, shard_leading_axis, replicate  # noqa: F401
from tapnet_tpu.parallel.distributed import initialize_distributed  # noqa: F401
from tapnet_tpu.parallel.tp import (data_model_mesh, shard_params_tp,  # noqa: F401
                                    tp_sharding_tree)
