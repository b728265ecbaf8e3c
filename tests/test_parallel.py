"""Multi-device sharding tests on the virtual 8-CPU-device mesh
(SURVEY.md §4 "multi-host without a cluster")."""

import numpy as np
import jax
import pytest

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.parallel.mesh import (cpu_mesh, data_mesh, put_replicated,
                                      put_sharded)
from tapnet_tpu.train.reinforce import init_train_state, make_train_step

TINY = TAPConfig(dim=2, num_blocks=6, min_blocks=6, container_width=6,
                 container_height=6, target_width=6, allow_rot=True)


def test_mesh_construction():
    mesh = cpu_mesh(8)
    assert mesh.shape == {"data": 8}


def test_sharded_train_step_runs():
    mesh = cpu_mesh(8)
    ts = init_train_state(jax.random.key(0), TINY, hidden=32)
    ts = put_replicated(ts, mesh)
    step = make_train_step(TINY, batch=16, hidden=32, mesh=mesh)
    ts, metrics = step(ts)
    jax.block_until_ready(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_sharded_matches_single_device():
    """Mesh-of-8 and mesh-of-1 produce numerically equal metrics and params
    on the same global batch (same RNG stream; env math is all int32, model
    math is deterministic f32 reductions over the same values)."""
    results = {}
    for n in (1, 8):
        mesh = cpu_mesh(n)
        ts = init_train_state(jax.random.key(0), TINY, hidden=32)
        ts = put_replicated(ts, mesh)
        step = make_train_step(TINY, batch=16, hidden=32, mesh=mesh)
        for _ in range(2):
            ts, metrics = step(ts)
        results[n] = {k: float(v) for k, v in metrics.items()}
    for k in results[1]:
        a, b = results[1][k], results[8][k]
        assert abs(a - b) < 1e-4 * max(1.0, abs(a)), (k, a, b)


def test_batch_rollout_shards_over_mesh():
    """Zero-communication env rollout sharded over the data axis."""
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env.sampler import sample_batch

    mesh = cpu_mesh(8)
    cfg = TINY
    B = 32
    key = jax.random.key(1)
    batch = sample_batch(key, B, cfg)
    keys = jax.random.key_data(jax.random.split(key, B))

    sharded = put_sharded((batch, keys), mesh)
    b_s, k_s = sharded

    def run(instances, key_data):
        ks = jax.vmap(jax.random.wrap_key_data)(key_data)
        return E.rollout_batch(instances, ks, cfg, policy="random")

    states, actions, rewards = run(b_s, k_s)
    ref_states, ref_actions, ref_rewards = run(batch, keys)
    assert np.array_equal(np.asarray(actions), np.asarray(ref_actions))
    assert np.allclose(np.asarray(rewards), np.asarray(ref_rewards))


def test_tensor_parallel_forward_matches_replicated():
    """('data','model') mesh: column-sharded params give the same logits."""
    from tapnet_tpu.models import build_tokens, init_params
    from tapnet_tpu.models.tapnet import TAPNetActor
    from tapnet_tpu.parallel.tp import data_model_mesh, shard_params_tp
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env.sampler import sample_batch

    cfg = TINY
    hidden = 32
    mesh = data_model_mesh(2, 4, jax.devices("cpu")[:8])
    assert mesh.shape == {"data": 2, "model": 4}

    key = jax.random.key(0)
    params = init_params(key, cfg, hidden)["actor"]
    B = 8
    instances = sample_batch(key, B, cfg)
    states = jax.vmap(lambda i: E.reset(i, cfg))(instances)
    static, dynamic, hm = jax.vmap(
        lambda i, s: build_tokens(i, s, cfg))(instances, states)

    actor = TAPNetActor(cfg, hidden)

    def batched(p, s, d, h):
        return jax.vmap(lambda s_, d_, h_: actor.apply(p, s_, d_, h_))(s, d, h)

    ref = jax.jit(batched)(params, static, dynamic, hm)

    params_tp = shard_params_tp(params, mesh)
    # kernels really are sharded over the model axis
    leaf = params_tp["params"]["token_enc"]["static_proj"]["kernel"]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    out = jax.jit(batched)(params_tp, static, dynamic, hm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
