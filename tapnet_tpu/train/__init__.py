"""Training subsystem: REINFORCE-with-baseline on batched rollouts.

Covers the reference's train/validate driver (SURVEY.md §1 L5 / §3.1
`main.py` train(): rollout -> policy-gradient loss with critic baseline ->
Adam -> periodic validation + checkpoints, unverified names) with the whole
rollout+update as one jitted computation — no host sync inside an epoch step.
"""

from tapnet_tpu.train.rollout import policy_rollout, policy_rollout_batch  # noqa: F401
from tapnet_tpu.train.reinforce import make_train_step, TrainState  # noqa: F401
from tapnet_tpu.train.trainer import train, TrainLoopConfig  # noqa: F401
