"""Actor-critic REINFORCE: one fused, jittable train step.

Reference semantics (SURVEY.md §3.1): loss_actor = -(R - V).detach * sum log pi,
loss_critic = MSE(V, R), Adam, grad clip. TPU-first: the instance batch is
sampled on device inside the step (no data loading), the rollout is a scan,
and the whole sample->rollout->grad->update pipeline is one XLA program,
ready to be pjit-sharded over a ('data',) mesh (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_instance
from tapnet_tpu.models.features import build_tokens
from tapnet_tpu.models.tapnet import TAPNetCritic, init_params
from tapnet_tpu.train.rollout import replay_logp_sum, rollout_batch_record
from tapnet_tpu.types import Instance


class TrainState(NamedTuple):
    params: Any          # {"actor": ..., "critic": ...}
    opt_state: Any
    step: jax.Array      # int32
    key: jax.Array       # PRNG key (instance sampling + action sampling)


def make_optimizer(lr: float = 5e-4, clip: float = 2.0):
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))


def init_train_state(key, cfg: TAPConfig, hidden: int = 128,
                     lr: float = 5e-4, clip: float = 2.0) -> TrainState:
    kp, ks = jax.random.split(key)
    params = init_params(kp, cfg, hidden)
    opt = make_optimizer(lr, clip)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.int32(0), key=ks)


def _batch_losses(params, instances, keys, cfg: TAPConfig, hidden: int,
                  temperature: float, use_pallas: bool, mesh=None,
                  axis: str = "data", dtype=jnp.float32, step_kernel=None,
                  actor_kernel=None):
    critic = TAPNetCritic(cfg, hidden, dtype=jnp.dtype(dtype).type)

    # 1. Rollout WITHOUT gradients (stop_gradient on params => XLA saves no
    #    scan residuals; the decode loop is pure inference + env stepping).
    #    with_logp: the fused actor kernel emits per-step logp ~for free,
    #    which the replay below uses as its custom-VJP primal — skipping
    #    the replay FORWARD kernel (the REINFORCE gradient only needs the
    #    hand-derived backward; rollout and replay heads agree to SPEC.md
    #    §12 tier-2 tolerance).
    states, record, logp0 = rollout_batch_record(
        jax.lax.stop_gradient(params["actor"]), instances, keys, cfg, hidden,
        greedy=False, temperature=temperature, dtype=dtype,
        step_kernel=step_kernel, actor_kernel=actor_kernel, mesh=mesh,
        axis=axis, with_logp=True)
    record = jax.lax.stop_gradient(record)

    # 2. Replay: differentiable log-probs of the recorded actions, all B*N
    #    decode steps in one batched forward (MXU-shaped backward).
    logp = replay_logp_sum(params["actor"], instances, record, cfg, hidden,
                           temperature, dtype=dtype,
                           logp0=jax.lax.stop_gradient(logp0))

    def value(instance):
        s0 = E.reset(instance, cfg)
        static, dynamic, hm = build_tokens(instance, s0, cfg)
        return critic.apply(params["critic"], static, dynamic, hm)

    V = jax.vmap(value)(instances)
    if use_pallas:
        # terminal rewards for the whole batch in one fused Pallas pass;
        # under a mesh the kernel runs per-shard via shard_map (the batch
        # axis is embarrassingly parallel), so the DP production path keeps
        # the fused reward (VERDICT r1 weak #7)
        from tapnet_tpu.ops import batched_reward_terms
        f_terms = batched_reward_terms
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            f_terms = jax.shard_map(
                batched_reward_terms, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis)), out_specs=P(axis),
                check_vma=False)  # pallas_call outputs carry no vma info
        terms = f_terms(states.heightmap, states.placements, instances.dims)
    else:
        # jnp composition — bit-identical (parity-tested), partitions
        # transparently under mesh sharding
        terms = jax.vmap(lambda s, i: E.reward_terms(s, i, cfg))(
            states, instances)
    vol, denom_c, denom_p, s_num, s_den = terms
    f = lambda n, d: jnp.where(d > 0, n.astype(jnp.float32) /
                               jnp.maximum(d, 1).astype(jnp.float32), 0.0)
    tvals = {"C": f(vol, denom_c), "P": f(vol, denom_p), "S": f(s_num, s_den)}
    R = sum(tvals[t] for t in cfg.reward_terms)
    adv = R - jax.lax.stop_gradient(V)
    actor_loss = -(adv * logp).mean()
    critic_loss = ((V - R) ** 2).mean()
    return actor_loss, critic_loss, R, terms


def make_train_step(cfg: TAPConfig, batch: int, hidden: int = 128,
                    lr: float = 5e-4, clip: float = 2.0,
                    temperature: float = 1.0, critic_weight: float = 1.0,
                    mesh=None, axis: str = "data", use_pallas=None,
                    from_dataset: bool = False, compute_dtype=None,
                    mixed_p2d: float = 0.0, steps_per_call: int = 1):
    """Build the jitted train step: TrainState -> (TrainState, metrics).

    mixed_p2d > 0 (3D envs only) samples each on-device instance as flat/2D
    (depth-1 blocks) with that probability — driver config 5's mixed 2D/3D
    batch (BASELINE.json; env.sampler.sample_batch_mixed).

    steps_per_call > 1 runs that many optimizer steps per dispatch as one
    lax.scan (body traced/compiled once): per-call host dispatch is ~1.3 ms
    over the TPU tunnel while the on-device step is ~4 ms, so batching
    dispatches amortizes the host out of the measurement and the training
    loop alike. Metrics are from the LAST step of the group (same RNG
    stream as steps_per_call=1: one fold per step). Incompatible with
    from_dataset (the caller owns the batch stream there).

    With `mesh`, the on-device-sampled instance batch and per-instance action
    keys are sharded over the mesh's data axis (each device samples and rolls
    its own shard; the only cross-device traffic is the gradient psum XLA
    inserts). Pass a TrainState placed replicated on the mesh
    (parallel.mesh.put_replicated).

    With from_dataset=True the step signature becomes
    (TrainState, Instance batch) -> (TrainState, metrics): instances come
    from the caller (e.g. a utils.data.PackDataset minibatch stream, the
    reference's file-dataset training flow) instead of the on-device sampler.
    """
    opt = make_optimizer(lr, clip)
    # the execution platform is the mesh's devices when sharded, else the
    # default backend (a CPU mesh can coexist with a TPU default backend)
    on_tpu = (all(d.platform == "tpu" for d in mesh.devices.flat)
              if mesh is not None else jax.default_backend() == "tpu")
    if use_pallas is None:
        use_pallas = on_tpu
    if compute_dtype is None:
        # bf16 GEMMs are MXU-native on TPU (params and logits stay fp32);
        # CPU (tests, oracle parity work) keeps full fp32
        compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def loss_fn(params, instances, key_data):
        keys = jax.vmap(jax.random.wrap_key_data)(key_data)
        actor_loss, critic_loss, R, terms = _batch_losses(
            params, instances, keys, cfg, hidden, temperature, use_pallas,
            mesh=mesh, axis=axis, dtype=compute_dtype,
            step_kernel=None if on_tpu else False,
            actor_kernel=None if on_tpu else False)
        loss = actor_loss + critic_weight * critic_loss
        return loss, (actor_loss, critic_loss, R, terms)

    @jax.jit
    def train_step(ts: TrainState, instances: Instance = None):
        key, k_inst, k_act = jax.random.split(ts.key, 3)
        if instances is None:
            if mixed_p2d > 0:
                from tapnet_tpu.env.sampler import sample_batch_mixed
                instances = sample_batch_mixed(k_inst, batch, cfg, mixed_p2d)
            else:
                inst_keys = jax.random.split(k_inst, batch)
                instances = jax.vmap(
                    lambda k: sample_instance(k, cfg))(inst_keys)
        act_keys = jax.random.key_data(jax.random.split(k_act, batch))
        if mesh is not None:
            from tapnet_tpu.parallel.mesh import shard_leading_axis, replicate
            instances = shard_leading_axis(instances, mesh, axis)
            act_keys = shard_leading_axis(act_keys, mesh, axis)
            ts = ts._replace(params=replicate(ts.params, mesh))

        grads, (actor_loss, critic_loss, R, terms) = jax.grad(
            loss_fn, has_aux=True)(ts.params, instances, act_keys)
        updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)

        vol, denom_c, denom_p, s_num, s_den = terms
        f = lambda n, d: (n / jnp.maximum(d, 1)).astype(jnp.float32)
        metrics = {
            "loss_actor": actor_loss,
            "loss_critic": critic_loss,
            "reward": R.mean(),
            "C": f(vol, denom_c).mean(),
            "P": f(vol, denom_p).mean(),
            "S": f(s_num, s_den).mean(),
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, ts.step + 1, key), metrics

    if from_dataset:
        assert steps_per_call == 1, "steps_per_call needs on-device sampling"
        return train_step
    if steps_per_call == 1:
        return lambda ts: train_step(ts)

    @jax.jit
    def train_steps(ts: TrainState):
        def body(ts, _):
            return train_step(ts)
        return jax.lax.scan(body, ts, None, length=steps_per_call)

    def run(ts: TrainState):
        ts, ms = train_steps(ts)
        return ts, jax.tree.map(lambda x: x[-1], ms)

    return run
