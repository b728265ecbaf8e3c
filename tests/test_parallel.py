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
    leaf = params_tp["params"]["token_enc"]["Dense_0"]["kernel"]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    out = jax.jit(batched)(params_tp, static, dynamic, hm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hlo_collective_audit_train_step():
    """Strongest single-machine evidence for the >=80% scaling bar
    (BASELINE.json; VERDICT r2 item 6): compile the mesh-sharded train step
    and assert the ONLY cross-device collectives are the gradient psum and
    scalar float metric reductions — no env-state traffic of any kind.

    The discriminators are rigorous because the env pipeline is int32/bool
    end-to-end (SPEC.md perf contract): any env-state collective would be
    integer- or predicate-typed, while gradients/metrics are f32/bf16. On
    top of that, no gather/scatter/permute collective may appear at all, and
    every rank>=2 all-reduce must be exactly gradient-leaf-shaped.
    """
    import re

    mesh = cpu_mesh(8)
    ts = init_train_state(jax.random.key(0), TINY, hidden=32)
    ts = put_replicated(ts, mesh)
    step = make_train_step(TINY, batch=64, hidden=32, mesh=mesh)
    txt = jax.jit(step).lower(ts).compile().as_text()

    # 1. no collective that moves data between devices other than all-reduce
    for op in ("all-gather", "all-to-all", "collective-permute",
               "reduce-scatter", "collective-broadcast"):
        assert op + "(" not in txt and op + "-start(" not in txt, op

    # 2. every all-reduce is float-typed (gradients/metrics), never the
    #    int32/uint8/pred env state
    shapes = []
    for line in txt.splitlines():
        if re.search(r"\ball-reduce(-start)?\(", line):
            shapes += re.findall(r"(\w+)\[([\d,]*)\]", line)
    assert shapes, "sharded train step must psum gradients"
    for dtype, dims in shapes:
        assert dtype in ("f32", "bf16"), (dtype, dims)

    # 3. rank>=2 all-reduces are exactly gradient-shaped (a param leaf, up
    #    to an XLA-chosen axis transpose), i.e. nothing batch-shaped sneaks
    #    into the reduction set
    import itertools
    param_shapes = {perm
                    for p in jax.tree.leaves(ts.params)
                    for perm in itertools.permutations(tuple(p.shape))}
    for dtype, dims in shapes:
        shape = tuple(int(d) for d in dims.split(",")) if dims else ()
        if len(shape) >= 2:
            assert shape in param_shapes, shape
