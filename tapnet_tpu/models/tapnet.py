"""TAP-Net actor (pointer network) and critic, flax.linen.

Reference shape (SURVEY.md §2.1, `model.py` DRL/Encoder/Attention/Pointer +
StateCritic, unverified names): conv1d embeddings of static dims + dynamic
flags, a heightmap encoder, and an attention decoder emitting a pointer
distribution over block×rotation(×container), with infeasible logits masked.

TPU-first re-design: token grid [T = N·R, h] through dense residual blocks
(MXU-friendly matmuls, no recurrence), per-container queries from the
heightmap embedding, additive (Bahdanau) attention scores as one batched
matmul — the whole per-step forward is a handful of [T, h] GEMMs that XLA
fuses; the decode loop lives in the caller's lax.scan.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig


class _TokenEncoder(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, static, dynamic):
        x = nn.Dense(self.hidden)(static) + nn.Dense(self.hidden)(dynamic)
        for _ in range(2):
            y = nn.LayerNorm()(x)
            y = nn.Dense(self.hidden)(nn.relu(nn.Dense(self.hidden)(y)))
            x = x + y
        return x  # [T, h]


class _HeightmapEncoder(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, hm_feats):  # [C, F]
        x = nn.relu(nn.Dense(self.hidden)(hm_feats))
        return nn.Dense(self.hidden)(x)  # [C, h]


class TAPNetActor(nn.Module):
    """Logits over the flat (block, rot, container) action space."""

    cfg: TAPConfig
    hidden: int = 128

    @nn.compact
    def __call__(self, static, dynamic, hm_feats):
        cfg = self.cfg
        tok = _TokenEncoder(self.hidden, name="token_enc")(static, dynamic)
        hm = _HeightmapEncoder(self.hidden, name="hm_enc")(hm_feats)  # [C, h]

        ctx = tok.mean(axis=0, keepdims=True)                      # [1, h]
        q = nn.Dense(self.hidden, name="query")(
            jnp.concatenate([hm, jnp.broadcast_to(ctx, hm.shape)], axis=1)
        )                                                          # [C, h]

        # additive attention: score[t, c] = v . tanh(W tok_t + q_c)
        wt = nn.Dense(self.hidden, use_bias=False, name="key")(tok)  # [T, h]
        act = jnp.tanh(wt[:, None, :] + q[None, :, :])               # [T, C, h]
        v = self.param("v", nn.initializers.lecun_normal(),
                       (self.hidden, 1))
        scores = (act @ v)[..., 0]                                   # [T, C]
        # [T, C] -> [N, R, C] -> flat [A]
        return scores.reshape(cfg.num_actions)

    def logits(self, params, static, dynamic, hm_feats):
        return self.apply(params, static, dynamic, hm_feats)


class TAPNetCritic(nn.Module):
    """State-value baseline over the same encoded state."""

    cfg: TAPConfig
    hidden: int = 128

    @nn.compact
    def __call__(self, static, dynamic, hm_feats):
        tok = _TokenEncoder(self.hidden, name="token_enc")(static, dynamic)
        hm = _HeightmapEncoder(self.hidden, name="hm_enc")(hm_feats)
        x = jnp.concatenate([tok.mean(axis=0), hm.mean(axis=0)])
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[0]  # scalar


def init_params(key, cfg: TAPConfig, hidden: int = 128) -> dict[str, Any]:
    """Initialize {actor, critic} param trees from dummy shapes."""
    T = cfg.num_blocks * cfg.num_rot
    static = jnp.zeros((T, 4), jnp.float32)
    dynamic = jnp.zeros((T, 4), jnp.float32)
    hm = jnp.zeros((cfg.num_containers,
                    cfg.target_width * cfg.target_depth + 2), jnp.float32)
    ka, kc = jax.random.split(key)
    actor = TAPNetActor(cfg, hidden).init(ka, static, dynamic, hm)
    critic = TAPNetCritic(cfg, hidden).init(kc, static, dynamic, hm)
    return {"actor": actor, "critic": critic}
