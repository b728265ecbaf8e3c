"""Neural sequencer models (flax.linen).

Covers the reference's model layer (SURVEY.md §1 L4, `model.py`: pointer-net
encoder/attention decoder + critic baseline, unverified names) re-designed
TPU-first: fixed-shape token grids over block×rotation, mask-aware attention
logits over the flat action space, and a state critic — all shapes static so
the whole rollout jits as one lax.scan.
"""

from tapnet_tpu.models.features import build_tokens, heightmap_features  # noqa: F401
from tapnet_tpu.models.tapnet import TAPNetActor, TAPNetCritic, init_params  # noqa: F401
