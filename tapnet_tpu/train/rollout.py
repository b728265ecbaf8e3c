"""Differentiable policy rollouts: the env loop fused with the actor.

The reference interleaves GPU policy calls with a per-instance CPU env loop
and host<->device copies every decode step (SURVEY.md §3.1 hot loop). Here
one lax.scan carries (EnvState, log-prob sum) through N decode steps with the
actor applied inside the scan; `vmap` lifts it over the instance batch, so a
whole epoch step is a single XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.env import core as E
from tapnet_tpu.models.features import build_tokens
from tapnet_tpu.models.tapnet import TAPNetActor
from tapnet_tpu.types import Instance

NEG = jnp.float32(-1e9)


def policy_rollout(actor_params, instance: Instance, key, cfg: TAPConfig,
                   hidden: int = 128, greedy: bool = False,
                   temperature: float = 1.0, with_reward: bool = True):
    """Roll one instance with the actor; returns (state, actions, R, logp_sum).

    Sampling is Gumbel-argmax over masked logits (identical in law to
    categorical sampling); logp_sum is differentiable w.r.t. actor params.
    With with_reward=False, R is 0.0 and the caller computes rewards batched
    (e.g. via the fused Pallas kernel in tapnet_tpu.ops).
    """
    actor = TAPNetActor(cfg, hidden)
    state0 = E.reset(instance, cfg)

    def body(carry, t):
        state, logp_sum = carry
        mask = E.action_mask(state, instance, cfg)
        static, dynamic, hm = build_tokens(instance, state, cfg)
        logits = actor.apply(actor_params, static, dynamic, hm)
        masked = jnp.where(mask, logits / temperature, NEG)
        if greedy:
            a = jnp.argmax(masked).astype(jnp.int32)
        else:
            g = jax.random.gumbel(jax.random.fold_in(key, t),
                                  (cfg.num_actions,))
            a = jnp.argmax(masked + g).astype(jnp.int32)
        valid = mask.any()
        logp = jax.nn.log_softmax(masked)[a]
        logp_sum = logp_sum + jnp.where(valid, logp, 0.0)
        a = jnp.where(valid, a, -1)
        state = E.step(state, a, instance, cfg)
        return (state, logp_sum), a

    (state, logp_sum), actions = jax.lax.scan(
        body, (state0, jnp.float32(0.0)),
        jnp.arange(cfg.num_blocks, dtype=jnp.int32))
    R = E.reward(state, instance, cfg) if with_reward else jnp.float32(0.0)
    return state, actions, R, logp_sum


@functools.partial(jax.jit,
                   static_argnames=("cfg", "hidden", "greedy", "temperature"))
def policy_rollout_batch(actor_params, instances: Instance, keys,
                         cfg: TAPConfig, hidden: int = 128,
                         greedy: bool = False, temperature: float = 1.0):
    return jax.vmap(
        lambda i, k: policy_rollout(actor_params, i, k, cfg, hidden,
                                    greedy, temperature)
    )(instances, keys)
