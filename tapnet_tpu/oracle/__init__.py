"""CPU oracle: the executable specification of SPEC.md.

Per-instance numpy loops — deliberately the reference's own mechanism
("per-instance Python step loop", BASELINE.json) — serving two roles:
1. the bit-exactness parity target for the batched JAX env, and
2. the measured baseline that `bench.py` reports speedups against.
"""

from tapnet_tpu.oracle.generator import generate_instance  # noqa: F401
from tapnet_tpu.oracle.env import OracleEnv  # noqa: F401
from tapnet_tpu.oracle.rollout import oracle_rollout  # noqa: F401
