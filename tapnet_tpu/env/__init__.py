"""Batched TPU-native TAP environment: pure jitted pytree transitions.

The reference steps one instance at a time in a Python loop (SURVEY.md §3.1,
the bottleneck BASELINE.json names); here reset/step/mask are pure functions
over fixed-shape int32 pytrees, vmapped over thousands of instances and
bit-exact against the CPU oracle under the shared threefry key schedule.
"""

from tapnet_tpu.env.sampler import sample_instance, sample_batch  # noqa: F401
from tapnet_tpu.env.core import (  # noqa: F401
    reset, action_mask, step, reward_terms, reward,
)
