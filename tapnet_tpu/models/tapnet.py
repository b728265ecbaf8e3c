"""TAP-Net actor (pointer network) and critic, flax.linen.

Reference shape (SURVEY.md §2.1, `model.py` DRL/Encoder/Attention/Pointer +
StateCritic, unverified names): conv1d embeddings of static dims + dynamic
flags, a heightmap CNN encoder, and an attention decoder conditioned on the
decode history, emitting a pointer distribution over
block×rotation(×container) with infeasible logits masked.

TPU-first re-design:
- token grid [T = N·R, h] through dense residual blocks (MXU matmuls, no
  recurrence); the static-dims embedding is exposed separately
  (`embed_static`) so rollout/replay callers hoist it out of the decode loop
  — it never changes across steps;
- target-container state through a dense encoder over the flattened [W, D]
  heightmap grid (the reference's heightmap-CNN row re-shaped for the MXU:
  tiny one-channel grids never tile onto the systolic array, so the conv
  stack is replaced by GEMMs with a global receptive field) + max/mean
  summaries;
- decode history enters as an embedding of the previously selected action
  (the reference decoder's last-selected-block conditioning) — a lookup, not
  a recurrence, so replay stays embarrassingly parallel over decode steps;
- additive (Bahdanau) attention scores as one batched matmul.

The whole per-step forward is a handful of [T, h] GEMMs that XLA fuses; the
decode loop lives in the caller's lax.scan.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig


class _TokenEncoder(nn.Module):
    """Residual MLP over (block, rot) tokens; static embedding split out."""

    hidden: int
    blocks: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        self.static_proj = nn.Dense(self.hidden, dtype=self.dtype)
        self.dynamic_proj = nn.Dense(self.hidden, dtype=self.dtype)
        self.norms = [nn.LayerNorm(dtype=self.dtype)
                      for _ in range(self.blocks)]
        self.ff1 = [nn.Dense(self.hidden, dtype=self.dtype)
                    for _ in range(self.blocks)]
        self.ff2 = [nn.Dense(self.hidden, dtype=self.dtype)
                    for _ in range(self.blocks)]

    def embed_static(self, static):  # [..., T, F] -> [..., T, h]
        return self.static_proj(static)

    def finish(self, static_emb, dynamic):  # -> [..., T, h]
        x = static_emb + self.dynamic_proj(dynamic)
        for norm, f1, f2 in zip(self.norms, self.ff1, self.ff2):
            y = norm(x)
            y = f2(nn.relu(f1(y)))
            x = x + y
        return x

    def __call__(self, static, dynamic):
        return self.finish(self.embed_static(static), dynamic)


class _HeightmapEncoder(nn.Module):
    """Dense encoder over flattened per-container [W, D] heightmap grids.

    Input [..., C, W, D, 1] normalized heights; output [..., C, h].

    The reference's heightmap encoder row is a CNN; target grids here are
    tiny (W*D <= a few hundred cells), so a 3x3 conv stack with one input
    channel never engages the MXU and bounded the whole replay backward at
    ~5% MFU (round-2 PROFILE.md: replay_grad 11.7 of 25.5 ms). Two dense
    layers over the flattened grid have a global receptive field and batch
    into MXU-shaped GEMMs over (batch x decode-step x container) rows;
    global max/mean scalars are kept as explicit summaries of the conv
    version's pooling.
    """

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hm_grid):
        lead = hm_grid.shape[:-3]                         # [..., C]
        x = hm_grid.astype(self.dtype).reshape(lead + (-1,))  # [..., C, W*D]
        feats = jnp.concatenate([
            x,
            x.max(axis=-1, keepdims=True),
            x.mean(axis=-1, keepdims=True),
        ], axis=-1)
        y = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(feats))
        return nn.Dense(self.hidden, dtype=self.dtype)(y)  # [..., C, h]


class TAPNetActor(nn.Module):
    """Logits over the flat (block, rot, container) action space."""

    cfg: TAPConfig
    hidden: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.token_enc = _TokenEncoder(self.hidden, dtype=self.dtype)
        self.hm_enc = _HeightmapEncoder(self.hidden, dtype=self.dtype)
        # decode history: embedding of the previous action; index 0 = "start"
        self.prev_embed = nn.Embed(self.cfg.num_actions + 1, self.hidden,
                                   dtype=self.dtype)
        self.query = nn.Dense(self.hidden, dtype=self.dtype)
        self.key_proj = nn.Dense(self.hidden, use_bias=False,
                                 dtype=self.dtype)
        self.v = self.param("v", nn.initializers.lecun_normal(),
                            (self.hidden, 1))

    def embed_static(self, static):
        """Hoistable static-dims embedding [T, F] -> [T, h]."""
        return self.token_enc.embed_static(static)

    def head(self, static_emb, dynamic, hm_grid, prev_action=None):
        """Pointer logits from a precomputed static embedding.

        static_emb [T, h], dynamic [T, Fd], hm_grid [C, W, D, 1],
        prev_action int32 scalar in [-1, A) (-1 / None = decode start).
        """
        cfg = self.cfg
        tok = self.token_enc.finish(static_emb.astype(self.dtype),
                                    dynamic.astype(self.dtype))  # [T, h]
        hm = self.hm_enc(hm_grid)                              # [C, h]

        if prev_action is None:
            prev_action = jnp.int32(-1)
        prev = self.prev_embed(jnp.clip(prev_action + 1, 0,
                                        cfg.num_actions))      # [h]

        ctx = tok.mean(axis=0)                                 # [h]
        qin = jnp.concatenate([
            hm,
            jnp.broadcast_to(ctx[None], hm.shape),
            jnp.broadcast_to(prev[None], hm.shape),
        ], axis=-1)                                            # [C, 3h]
        q = self.query(qin)                                    # [C, h]

        # additive attention: score[t, c] = v . tanh(W tok_t + q_c)
        wt = self.key_proj(tok)                                # [T, h]
        act = jnp.tanh(wt[:, None, :] + q[None, :, :])         # [T, C, h]
        scores = (act @ self.v.astype(self.dtype))[..., 0]     # [T, C]
        # [T, C] -> [N, R, C] -> flat [A]; logits always fp32 (softmax /
        # masking / sampling run in full precision regardless of dtype)
        return scores.reshape(cfg.num_actions).astype(jnp.float32)

    def __call__(self, static, dynamic, hm_grid, prev_action=None):
        return self.head(self.embed_static(static), dynamic, hm_grid,
                         prev_action)

    def logits(self, params, static, dynamic, hm_grid, prev_action=None):
        return self.apply(params, static, dynamic, hm_grid, prev_action)


class TAPNetCritic(nn.Module):
    """State-value baseline over the same encoded state."""

    cfg: TAPConfig
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, static, dynamic, hm_grid):
        tok = _TokenEncoder(self.hidden, name="token_enc",
                            dtype=self.dtype)(static.astype(self.dtype),
                                              dynamic.astype(self.dtype))
        hm = _HeightmapEncoder(self.hidden, name="hm_enc",
                               dtype=self.dtype)(hm_grid)
        x = jnp.concatenate([tok.mean(axis=0), hm.mean(axis=0)])
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x)[0].astype(jnp.float32)


def init_params(key, cfg: TAPConfig, hidden: int = 128) -> dict[str, Any]:
    """Initialize {actor, critic} param trees from dummy shapes."""
    T = cfg.num_blocks * cfg.num_rot
    static = jnp.zeros((T, 4), jnp.float32)
    dynamic = jnp.zeros((T, 4), jnp.float32)
    hm = jnp.zeros((cfg.num_containers, cfg.target_width, cfg.target_depth, 1),
                   jnp.float32)
    ka, kc = jax.random.split(key)
    actor = TAPNetActor(cfg, hidden).init(ka, static, dynamic, hm)
    critic = TAPNetCritic(cfg, hidden).init(kc, static, dynamic, hm)
    return {"actor": actor, "critic": critic}
