"""Model + REINFORCE training tests (SURVEY.md §4 rebuild obligations)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tapnet_tpu.config import CONFIGS
from tapnet_tpu.models import build_tokens, init_params
from tapnet_tpu.models.tapnet import TAPNetActor
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_instance
from tapnet_tpu.train.reinforce import init_train_state, make_train_step
from tapnet_tpu.train.rollout import policy_rollout_batch
from tapnet_tpu.train.trainer import TrainLoopConfig, evaluate
from tapnet_tpu.train import checkpoints as ckpt


def leaves_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(fa, fb))


@pytest.mark.parametrize("name", list(CONFIGS))
def test_actor_forward_shapes(name):
    cfg = CONFIGS[name]
    params = init_params(jax.random.key(0), cfg, hidden=32)
    inst = sample_instance(jax.random.key(1), cfg)
    state = E.reset(inst, cfg)
    static, dynamic, hm = build_tokens(inst, state, cfg)
    logits = TAPNetActor(cfg, 32).apply(params["actor"], static, dynamic, hm)
    assert logits.shape == (cfg.num_actions,)
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_runs_and_is_deterministic():
    cfg = CONFIGS["2d-rot"]
    step = make_train_step(cfg, batch=16, hidden=32)
    ts1 = init_train_state(jax.random.key(0), cfg, hidden=32)
    ts2 = init_train_state(jax.random.key(0), cfg, hidden=32)
    for _ in range(2):
        ts1, m1 = step(ts1)
        ts2, m2 = step(ts2)
    for k in m1:
        assert np.isfinite(float(m1[k])), k
        assert float(m1[k]) == float(m2[k]), k
    assert float(m1["grad_norm"]) > 0
    assert leaves_equal(ts1.params, ts2.params)


def test_checkpoint_resume_continues_exact_trajectory(tmp_path):
    """Kill-and-resume mid-training == uninterrupted run (SURVEY.md §5)."""
    cfg = CONFIGS["2d-basic"]
    step = make_train_step(cfg, batch=8, hidden=32)
    ts = init_train_state(jax.random.key(0), cfg, hidden=32)
    ts, _ = step(ts)
    path = ckpt.save_checkpoint(str(tmp_path), ts)

    # uninterrupted
    ts_a, m_a = step(ts)
    # "crashed" and restored into a fresh template
    template = init_train_state(jax.random.key(123), cfg, hidden=32)
    ts_b = ckpt.restore_checkpoint(path, template)
    assert leaves_equal(ts.params, ts_b.params)
    ts_b, m_b = step(ts_b)
    for k in m_a:
        assert float(m_a[k]) == float(m_b[k]), k
    assert leaves_equal(ts_a.params, ts_b.params)


def test_greedy_eval_deterministic():
    cfg = CONFIGS["3d-basic"]
    params = init_params(jax.random.key(0), cfg, hidden=32)
    loop = TrainLoopConfig(hidden=32, valid_batch=16)
    a = float(evaluate(params, cfg, loop)["valid_reward"])
    b = float(evaluate(params, cfg, loop)["valid_reward"])
    assert a == b


def test_eval_with_heuristic_baselines():
    """Baseline scoring shares the held-out instances with the greedy eval."""
    cfg = CONFIGS["2d-basic"]
    params = init_params(jax.random.key(0), cfg, hidden=32)
    loop = TrainLoopConfig(hidden=32, valid_batch=32)
    out = evaluate(params, cfg, loop, baselines=True)
    for k in ("valid_reward", "valid_C", "valid_P", "valid_S",
              "random_reward", "first_reward"):
        assert np.isfinite(float(out[k])), k
    for k in ("valid_C", "valid_P", "valid_S"):
        assert 0.0 < float(out[k]) <= 1.0, (k, float(out[k]))


def test_rollout_actions_respect_masks():
    cfg = CONFIGS["multi-container"]
    params = init_params(jax.random.key(0), cfg, hidden=32)
    B = 8
    key = jax.random.key(5)
    from tapnet_tpu.env.sampler import sample_batch
    instances = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)
    states, actions, rewards, logp = policy_rollout_batch(
        params["actor"], instances, keys, cfg, 32)
    assert bool(states.packed.all())
    assert np.isfinite(np.asarray(logp)).all()
    # replay actions through the env, asserting each was mask-feasible
    for i in range(B):
        inst = jax.tree.map(lambda x: x[i], instances)
        s = E.reset(inst, cfg)
        for a in np.asarray(actions[i]):
            if a < 0:
                continue
            assert bool(E.action_mask(s, inst, cfg)[int(a)])
            s = E.step(s, jnp.int32(int(a)), inst, cfg)


@pytest.mark.slow
def test_learning_improves_reward():
    """30 REINFORCE steps on 2d-basic must lift the SAMPLED-policy mean
    reward on a held-out stream.

    (The greedy metric is no longer a usable learning probe here: the
    decode-history + heightmap-CNN actor's random-init greedy decode
    already scores ~2.86 on 2d-basic, above first-fit, so a +0.1 greedy
    margin in 30 steps is unreachable headroom. The sampled mean starts at
    the random baseline and moves decisively with learning.)"""
    cfg = CONFIGS["2d-basic"]
    key = jax.random.key(123)
    instances = jax.vmap(lambda k: sample_instance(k, cfg))(
        jax.random.split(key, 256))
    keys = jax.random.split(jax.random.key(7), 256)

    def sampled_mean(params):
        _, _, rewards, _ = policy_rollout_batch(
            params["actor"], instances, keys, cfg, 64, greedy=False)
        return float(rewards.mean())

    ts = init_train_state(jax.random.key(0), cfg, hidden=64, lr=1e-3)
    before = sampled_mean(ts.params)
    step = make_train_step(cfg, batch=64, hidden=64, lr=1e-3)
    for _ in range(30):
        ts, _ = step(ts)
    after = sampled_mean(ts.params)
    assert after > before + 0.05, (before, after)


def test_train_step_from_dataset_file(tmp_path):
    """Reference-style flow: train on minibatches from a saved dataset file."""
    from tapnet_tpu.utils.data import PackDataset, generate_dataset

    cfg = CONFIGS["2d-basic"]
    path = str(tmp_path / "train.npz")
    generate_dataset(path, cfg, num=32, seed=4, batch_size=16)
    ds = PackDataset(path, batch_size=8, shuffle_seed=0)
    assert len(ds) == 4

    ts = init_train_state(jax.random.key(0), cfg, hidden=32)
    step = make_train_step(cfg, batch=8, hidden=32, from_dataset=True)
    r0 = None
    for batch in ds:
        batch = jax.tree.map(jnp.asarray, batch)
        ts, metrics = step(ts, batch)
        if r0 is None:
            r0 = float(metrics["reward"])
    assert int(ts.step) == 4
    assert np.isfinite(float(metrics["reward"]))


@pytest.mark.slow
def test_fault_injection_kill_and_resume(tmp_path):
    """SURVEY.md §5: SIGKILL the training PROCESS mid-run; restart; the
    resumed run's final checkpoint must equal the uninterrupted run's."""
    import os
    import signal
    import subprocess
    import sys
    import time

    def run_cmd(ckpt_dir):
        return [sys.executable, "-m", "tapnet_tpu.cli", "--platform", "cpu",
                "train", "--config", "2d-basic", "--epochs", "2",
                "--steps-per-epoch", "3", "--batch", "8", "--hidden", "32",
                "--valid-batch", "8", "--ckpt-dir", str(ckpt_dir)]

    env = dict(os.environ, JAX_PLATFORMS="cpu")

    # uninterrupted reference run
    a = tmp_path / "a"
    subprocess.run(run_cmd(a), check=True, env=env, capture_output=True,
                   timeout=600)

    # killed-and-resumed run
    b = tmp_path / "b"
    p = subprocess.Popen(run_cmd(b), env=env, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    deadline = time.time() + 600
    first = b / "ckpt_00000003.msgpack"
    while not first.exists():
        assert time.time() < deadline, "first epoch never checkpointed"
        assert p.poll() is None, "run finished before it could be killed"
        time.sleep(0.5)
    p.send_signal(signal.SIGKILL)
    p.wait()
    subprocess.run(run_cmd(b), check=True, env=env, capture_output=True,
                   timeout=600)

    cfg = CONFIGS["2d-basic"]
    template = init_train_state(jax.random.key(9), cfg, hidden=32)
    fin_a = ckpt.restore_checkpoint(str(a / "ckpt_00000006.msgpack"), template)
    fin_b = ckpt.restore_checkpoint(str(b / "ckpt_00000006.msgpack"), template)
    assert leaves_equal(fin_a.params, fin_b.params)
    assert np.array_equal(np.asarray(jax.random.key_data(fin_a.key)),
                          np.asarray(jax.random.key_data(fin_b.key)))


@pytest.mark.slow
@pytest.mark.parametrize("name,steps,margin", [
    ("3d-basic", 60, 0.05),
    ("2d-rolling", 80, 0.03),
])
def test_learning_improves_reward_other_configs(name, steps, margin):
    """REINFORCE lifts greedy validation reward on the 3D and rolling tasks
    too (VERDICT r1 missing #2 / next #3)."""
    cfg = CONFIGS[name]
    loop = TrainLoopConfig(hidden=64, valid_batch=64)
    ts = init_train_state(jax.random.key(0), cfg, hidden=64, lr=1e-3)
    before = float(evaluate(ts.params, cfg, loop)["valid_reward"])
    step = make_train_step(cfg, batch=48, hidden=64, lr=1e-3)
    for _ in range(steps):
        ts, _ = step(ts)
    after = float(evaluate(ts.params, cfg, loop)["valid_reward"])
    assert after > before + margin, (before, after)


@pytest.mark.slow
def test_chunked_replay_matches_unchunked():
    """Rematerialized chunked replay (memory fix for large-N configs) must
    give identical logp and gradients to the single-pass replay."""
    from tapnet_tpu.train.rollout import (replay_logp_sum,
                                          rollout_batch_record)

    # rolling-like geometry at N=20: same chunking semantics as the 50-block
    # driver config at a fraction of the CPU compile time (VERDICT r2 item 9)
    cfg = dataclasses.replace(CONFIGS["2d-rolling"], num_blocks=20,
                              min_blocks=12)
    B = 8
    key = jax.random.key(11)
    params = init_params(key, cfg, hidden=32)["actor"]
    instances = jax.vmap(lambda k: sample_instance(k, cfg))(
        jax.random.split(key, B))
    keys = jax.random.split(key, B)
    _, record, _ = rollout_batch_record(params, instances, keys, cfg, 32,
                                        step_kernel=False)

    def loss(p, chunk):
        return replay_logp_sum(p, instances, record, cfg, 32,
                               chunk=chunk).mean()

    l1, g1 = jax.value_and_grad(loss)(params, cfg.num_blocks)
    l5, g5 = jax.value_and_grad(loss)(params, 5)
    np.testing.assert_allclose(float(l1), float(l5), rtol=1e-6)
    for (k1, a), (k5, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g1),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g5),
                   key=lambda kv: str(kv[0]))):
        assert str(k1) == str(k5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5, err_msg=str(k1))


def test_mixed_stream_train_step_and_eval():
    """Driver config 5's mixed 2D/3D stream (VERDICT r2 missing #2): the
    train step samples mixed batches on device; eval reports per-container
    occupancy and the 2D fraction, and its instance stream genuinely
    differs from the pure-3D stream."""
    cfg = CONFIGS["multi-container"]
    ts = init_train_state(jax.random.key(0), cfg, hidden=32)
    step = make_train_step(cfg, batch=16, hidden=32, mixed_p2d=0.5)
    ts, metrics = step(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    loop = TrainLoopConfig(hidden=32, valid_batch=32, mixed_p2d=0.5)
    out = evaluate(ts.params, cfg, loop, baselines=True)
    assert 0.1 < float(out["valid_2d_frac"]) < 0.9
    fr = [float(out[f"valid_container{c}_frac"]) for c in range(2)]
    assert abs(sum(fr) - 1.0) < 1e-6
    out3d = evaluate(ts.params, cfg,
                     TrainLoopConfig(hidden=32, valid_batch=32),
                     baselines=True)
    assert float(out3d["first_reward"]) != float(out["first_reward"])


@pytest.mark.slow
def test_learning_improves_reward_mixed_stream():
    """REINFORCE lifts greedy validation reward on the mixed 2D/3D
    multi-container stream (the full driver config 5)."""
    cfg = CONFIGS["multi-container"]
    loop = TrainLoopConfig(hidden=64, valid_batch=64, mixed_p2d=0.5)
    ts = init_train_state(jax.random.key(0), cfg, hidden=64, lr=1e-3)
    before = float(evaluate(ts.params, cfg, loop)["valid_reward"])
    step = make_train_step(cfg, batch=48, hidden=64, lr=1e-3, mixed_p2d=0.5)
    for _ in range(60):
        ts, _ = step(ts)
    after = float(evaluate(ts.params, cfg, loop)["valid_reward"])
    assert after > before + 0.03, (before, after)


def test_mask_from_flags_matches_recorded_mask():
    """The replay's rebuilt mask must equal the rollout's recorded mask for
    every unbounded-height driver config (models.features.mask_from_flags)."""
    from tapnet_tpu.models.features import mask_from_flags
    from tapnet_tpu.train.rollout import rollout_batch_record

    for name, cfg in CONFIGS.items():
        if cfg.target_height > 0:
            continue  # capped masks need candidate scans, not flags
        key = jax.random.key(5)
        params = init_params(key, cfg, hidden=32)["actor"]
        instances = jax.vmap(lambda k: sample_instance(k, cfg))(
            jax.random.split(key, 8))
        _, record, _ = rollout_batch_record(
            params, instances, jax.random.split(key, 8), cfg, 32,
            step_kernel=False)
        rebuilt = mask_from_flags(record.flags, instances, cfg)
        np.testing.assert_array_equal(np.asarray(rebuilt),
                                      np.asarray(record.mask), err_msg=name)


def test_windowed_replay_matches_general():
    """Windowed replay (rolling configs gather only the <=window observable
    tokens per decode row — VERDICT r3 item 3) must reproduce the full-token
    replay's logp and gradients: outside-window actions are masked to -1e9
    and exp(-1e9) == 0 exactly, so the softmax is unchanged."""
    from tapnet_tpu.train.rollout import (replay_logp_sum,
                                          rollout_batch_record)

    cfg = dataclasses.replace(CONFIGS["2d-rolling"], num_blocks=20,
                              min_blocks=12, window=5)
    B = 8
    key = jax.random.key(11)
    params = init_params(key, cfg, hidden=32)["actor"]
    instances = jax.vmap(lambda k: sample_instance(k, cfg))(
        jax.random.split(key, B))
    keys = jax.random.split(key, B)
    _, record, _ = rollout_batch_record(params, instances, keys, cfg, 32,
                                        step_kernel=False)

    def loss(p, windowed, chunk=0):
        return replay_logp_sum(p, instances, record, cfg, 32,
                               windowed=windowed, chunk=chunk).mean()

    l_gen, g_gen = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_win, g_win = jax.value_and_grad(lambda p: loss(p, True))(params)
    l_ck, _ = jax.value_and_grad(lambda p: loss(p, True, chunk=5))(params)
    np.testing.assert_allclose(float(l_gen), float(l_win), rtol=1e-6)
    np.testing.assert_allclose(float(l_gen), float(l_ck), rtol=1e-6)
    for (k1, a), (k2, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_gen),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g_win),
                   key=lambda kv: str(kv[0]))):
        assert str(k1) == str(k2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5, err_msg=str(k1))
