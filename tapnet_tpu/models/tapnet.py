"""TAP-Net actor (pointer network) and critic, flax.linen.

Reference shape (SURVEY.md §2.1, `model.py` DRL/Encoder/Attention/Pointer +
StateCritic, unverified names): embeddings of static block dims + dynamic
packed/accessible flags, a heightmap encoder for target-container state, and
an attention decoder conditioned on the decode history, emitting a pointer
distribution over block×rotation(×container) with infeasible logits masked.

TPU-first re-design (round 3, driven by the measured roofline):
- chained [B·N·T, h] GEMMs on a v5e are HBM-bandwidth-bound at ~0.28 ms per
  GEMM+activation (bench: 409600×128 @ 128×128 bf16 chains hit ~750 GB/s),
  so the ROUND-2 design — a deep residual encoder over (static ⊕ dynamic)
  tokens re-run at every decode step and for every replayed row — was the
  whole train-step bottleneck (PROFILE.md r2: replay_grad 11.7/25.5 ms);
- the deep residual encoder therefore runs ONCE per instance, on STATIC
  tokens only (`embed_static`, hoisted out of the decode loop and shared by
  rollout and replay);
- per-step dynamic state (packed/accessible/window flags) enters ADDITIVELY
  inside the attention: score[t,c] = v·tanh(key_t + dyn_t + q_c), the
  classic pointer-decoder structure (static keys + dynamic decoder state).
  Per decode row this costs one tiny 4→h GEMM plus the fused
  add/tanh/reduce chain — bytes, not depth;
- target-container state through a dense encoder over the flattened [W, D]
  heightmap grid (the reference's heightmap-CNN row re-shaped for the MXU:
  tiny one-channel grids never tile onto the systolic array);
- decode history as an embedding of the previously selected action — a
  lookup, not a recurrence, so replay stays embarrassingly parallel.

The decode loop lives in the caller's lax.scan; everything per-step is a
handful of bandwidth-light fused ops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig


class _TokenEncoder(nn.Module):
    """Residual MLP over per-(block, rot) STATIC tokens -> [..., T, h].

    Runs once per instance; the decode loop and the replay never re-enter
    it (the round-2 version also mixed per-step dynamic features here,
    which re-ran the whole stack for every decode row — bandwidth-bound)."""

    hidden: int
    blocks: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, static):
        x = nn.Dense(self.hidden, dtype=self.dtype)(static.astype(self.dtype))
        for _ in range(self.blocks):
            y = nn.LayerNorm(dtype=self.dtype)(x)
            y = nn.Dense(self.hidden, dtype=self.dtype)(
                nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(y)))
            x = x + y
        return x


class _HeightmapEncoder(nn.Module):
    """Dense encoder over flattened per-container [W, D] heightmap grids.

    Input [..., C, W, D, 1] normalized heights; output [..., C, h].

    The reference's heightmap encoder row is a CNN; target grids here are
    tiny (W*D <= a few hundred cells), so a 3x3 conv stack with one input
    channel never engages the MXU and bounded the replay backward at ~5%
    MFU (round-2 PROFILE.md). Two dense layers over the flattened grid have
    a global receptive field and batch into MXU-shaped GEMMs over
    (batch x decode-step x container) rows; global max/mean scalars are
    kept as explicit summaries of the conv version's pooling.
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
        self.key_proj = nn.Dense(self.hidden, use_bias=False,
                                 dtype=self.dtype)
        # narrow nonlinear path for the 4 dynamic flags: interactions like
        # accessible∧in-window need a hidden layer, but a full-width stack
        # re-run per decode row is what round 2 proved bandwidth-bound —
        # 32 hidden units keep the replayed intermediate at ~1/4 the bytes
        self.dyn_hidden = nn.Dense(32, dtype=self.dtype)
        self.dyn_proj = nn.Dense(self.hidden, use_bias=False,
                                 dtype=self.dtype)
        self.hm_enc = _HeightmapEncoder(self.hidden, dtype=self.dtype)
        # decode history: embedding of the previous action; index 0 = "start"
        self.prev_embed = nn.Embed(self.cfg.num_actions + 1, self.hidden,
                                   dtype=self.dtype)
        self.query = nn.Dense(self.hidden, dtype=self.dtype)
        self.v = self.param("v", nn.initializers.lecun_normal(),
                            (self.hidden, 1))

    def embed_static(self, static):
        """Hoistable static attention keys [T, F] -> [T, h].

        The full residual encoder + key projection — everything that
        depends only on the instance, computed once and reused by every
        decode step and every replay row."""
        return self.key_proj(self.token_enc(static))

    def head(self, static_emb, dynamic, hm_grid, prev_action=None):
        """Pointer logits from precomputed static keys.

        static_emb [T, h] (embed_static), dynamic [T, Fd] — the per-step
        dynamic flags with the raw static dims features appended
        (merge_tokens), so the narrow dyn MLP sees static×dynamic
        interactions — hm_grid [C, W, D, 1], prev_action int32 scalar in
        [-1, A) (-1 / None = decode start).
        """
        ctx = static_emb.mean(axis=0)                          # [h]
        dsum = dynamic.astype(self.dtype).mean(axis=0)         # [Fd]
        return self.head_ctx(static_emb, dynamic, hm_grid, prev_action,
                             ctx, dsum)

    def head_ctx(self, static_emb, dynamic, hm_grid, prev_action, ctx, dsum):
        """head() with the full-token context summaries (ctx = mean static
        embedding [h], dsum = mean merged token [Fd]) passed in, and token
        inputs allowed to be a SUBSET of the T tokens: scores come back for
        exactly the tokens given, flattened token-major/container-minor.

        This is the windowed-replay entry point (train.rollout): for rolling
        configs only the <=window observable (block, rot) tokens can carry
        probability mass, so the replay gathers those and reproduces the
        full softmax from the masked-logit identity exp(-1e9) == 0 — the
        context summaries are the only full-set quantities, and both are
        cheap bit-count/precomputed reductions.
        """
        cfg = self.cfg
        dyn = self.dyn_proj(
            nn.relu(self.dyn_hidden(dynamic.astype(self.dtype))))  # [Tk, h]
        hm = self.hm_enc(hm_grid)                              # [C, h]

        if prev_action is None:
            prev_action = jnp.int32(-1)
        # one-hot matmul instead of Embed's gather: the backward becomes an
        # MXU GEMM rather than a scatter-add over the table (the scatter was
        # 0.3 ms of the replay backward); same params, same values
        idx = jnp.clip(prev_action + 1, 0, cfg.num_actions)
        onehot = jax.nn.one_hot(idx, cfg.num_actions + 1, dtype=self.dtype)
        prev = onehot @ self.prev_embed.embedding.astype(self.dtype)  # [h]

        qin = jnp.concatenate([
            hm,
            jnp.broadcast_to(ctx[None].astype(self.dtype), hm.shape),
            jnp.broadcast_to(prev[None], hm.shape),
            jnp.broadcast_to(dsum[None].astype(self.dtype),
                             hm.shape[:-1] + dsum.shape),
        ], axis=-1)                                            # [C, 3h+Fd]
        q = self.query(qin)                                    # [C, h]

        # additive attention: score[t, c] = v . tanh(key_t + dyn_t + q_c)
        act = jnp.tanh(static_emb[:, None, :] + dyn[:, None, :]
                       + q[None, :, :])                        # [Tk, C, h]
        scores = (act @ self.v.astype(self.dtype))[..., 0]     # [Tk, C]
        # [Tk, C] -> flat (token-major, container-minor — compose_action
        # order); logits always fp32 (softmax / masking / sampling run in
        # full precision regardless of dtype)
        return scores.reshape(-1).astype(jnp.float32)

    def __call__(self, static, dynamic, hm_grid, prev_action=None):
        merged = jnp.concatenate([dynamic, static], axis=-1)
        return self.head(self.embed_static(static), merged, hm_grid,
                         prev_action)

    def logits(self, params, static, dynamic, hm_grid, prev_action=None):
        return self.apply(params, static, dynamic, hm_grid, prev_action)


class TAPNetCritic(nn.Module):
    """State-value baseline over the same encoded state.

    One fused (static ⊕ dynamic) token projection + pooling: the critic
    reads the reset state once per train step, so a deep per-token stack
    (13% of the round-2 step) bought nothing the pooled MLP doesn't.
    """

    cfg: TAPConfig
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, static, dynamic, hm_grid):
        x = jnp.concatenate([static, dynamic], axis=-1).astype(self.dtype)
        tok = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))  # [T, h]
        hm = _HeightmapEncoder(self.hidden, name="hm_enc",
                               dtype=self.dtype)(hm_grid)          # [C, h]
        # mean AND max pooling: the value of an instance depends on dims
        # distribution extremes (e.g. flat-vs-3D streams), not just means
        z = jnp.concatenate([tok.mean(axis=-2), tok.max(axis=-2),
                             hm.mean(axis=-2), hm.max(axis=-2)], axis=-1)
        z = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(z))
        z = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(z))
        return nn.Dense(1, dtype=self.dtype)(z)[0].astype(jnp.float32)


def embed_static_T(actor_params, static_t, dtype=jnp.float32):
    """Transposed twin of `TAPNetActor.embed_static`: cdt[4, M] -> [h, M].

    Computes the SAME residual-encoder + key-projection chain with every
    GEMM transposed (W^T @ X, batch columns on lanes), so the fused actor
    kernel's [h, T, B] static-embedding operand is BORN in its layout — the
    straightforward `embed_static(...).transpose(...)` forced XLA into a
    [B, T, h] -> [h, T, B] layout copy worth ~0.9 ms/step at batch 4096
    (traced; see ops/pallas_actor_step.py). Values match embed_static to
    accumulation-order tolerance (SPEC.md §12 tier 2): per-row GEMM dots
    and LayerNorm statistics sum in a different order; the formula —
    fast-variance LayerNorm in f32 statistics, per-layer cast to the
    compute dtype — is identical.
    """
    cdt = jnp.dtype(dtype).type
    f32 = jnp.float32
    p = actor_params["params"]["token_enc"]
    kp = actor_params["params"]["key_proj"]["kernel"].astype(cdt)

    def dense(name, x):
        w = p[name]["kernel"].astype(cdt)
        b = p[name]["bias"].astype(cdt)
        return w.T @ x + b[:, None]

    x = dense("Dense_0", static_t.astype(cdt))
    for blk in range(2):
        ln = p[f"LayerNorm_{blk}"]
        xf = x.astype(f32)
        mu = xf.mean(axis=0, keepdims=True)
        var = (xf * xf).mean(axis=0, keepdims=True) - mu * mu
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(cdt)
        y = (y * ln["scale"].astype(cdt)[:, None]
             + ln["bias"].astype(cdt)[:, None])
        # flax compact naming: the OUTER Dense of `Dense(relu(Dense(y)))` is
        # constructed (and named) first — outer = Dense_{2b+1}, inner =
        # Dense_{2b+2} (verified against the param tree; both are [h, h],
        # so a swap fails silently on shapes and loudly on values)
        y = dense(f"Dense_{2 * blk + 1}",
                  jnp.maximum(dense(f"Dense_{2 * blk + 2}", y), 0))
        x = x + y
    return kp.T @ x


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
