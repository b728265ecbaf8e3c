"""Multi-PROCESS distributed runtime tests (SURVEY.md §2.3 / §4).

Spawns 2 OS processes (4 virtual CPU devices each), joins them with
jax.distributed.initialize via tapnet_tpu.parallel.distributed, runs the
sharded REINFORCE train step on the 8-device cross-process mesh, and asserts
the metrics match the single-process 8-virtual-device run — i.e. the
multi-host path computes the same training trajectory as the local one.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.parallel import distributed as D

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_history():
    import jax
    from tapnet_tpu.parallel.mesh import cpu_mesh, put_replicated
    from tapnet_tpu.train.reinforce import init_train_state, make_train_step

    cfg = TAPConfig(dim=2, num_blocks=6, min_blocks=6, container_width=6,
                    container_height=6, target_width=6, allow_rot=True)
    mesh = cpu_mesh(8)
    ts = init_train_state(jax.random.key(0), cfg, hidden=32)
    ts = put_replicated(ts, mesh)
    step = make_train_step(cfg, batch=16, hidden=32, mesh=mesh)
    history = []
    for _ in range(3):
        ts, metrics = step(ts)
        history.append({k: float(v) for k, v in metrics.items()})
    return history


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    line = next(l for l in outs[0].splitlines() if l.startswith("METRICS "))
    dist_history = json.loads(line[len("METRICS "):])
    ref_history = _single_process_history()

    assert len(dist_history) == len(ref_history) == 3
    for got, want in zip(dist_history, ref_history):
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k)


def _spawn_workers(args, n=2, timeout=300):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(n), str(port)] + args,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO)
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    return outs


@pytest.mark.slow
def test_two_process_trainer_end_to_end_with_resume(tmp_path):
    """trainer.train() across 2 OS processes with a mid-run restart
    (VERDICT r4 item 3): generation 1 trains 1 epoch and exits ("kill"),
    generation 2 resumes — process 0 reads the checkpoint, broadcast
    distributes it — and trains to completion. Asserts:

    - process-0-only filesystem discipline (one metrics file, written once);
    - the resumed run logs the `resumed` event;
    - the final checkpoint params match an UNINTERRUPTED single-process
      8-virtual-device run of the same loop config.
    """
    import jax
    from tapnet_tpu.parallel.mesh import cpu_mesh
    from tapnet_tpu.train import checkpoints as ckpt
    from tapnet_tpu.train.reinforce import init_train_state
    from tapnet_tpu.train.trainer import TrainLoopConfig, train

    work = tmp_path / "dist"
    work.mkdir()
    # generation 1: 1 epoch (4 steps), then the processes exit
    _spawn_workers(["trainer", "1", str(work)])
    assert (work / "ckpt" / "ckpt_00000004.msgpack").exists()
    lines1 = (work / "metrics.jsonl").read_text().splitlines()

    # generation 2: resumes from step 4, trains to step 8
    outs = _spawn_workers(["trainer", "2", str(work)])
    assert any(line.strip() == "TRAINED step=8"
               for line in outs[0].splitlines()), outs[0]
    lines2 = (work / "metrics.jsonl").read_text().splitlines()
    assert len(lines2) > len(lines1)
    assert any(json.loads(l).get("event") == "resumed" for l in lines2)

    # uninterrupted single-process reference (same seed, same 8-device mesh)
    cfg = TAPConfig(dim=2, num_blocks=6, min_blocks=6, container_width=6,
                    container_height=6, target_width=6, allow_rot=True)
    loop = TrainLoopConfig(epochs=2, steps_per_epoch=4, batch=16,
                           valid_batch=16, hidden=32, seed=0,
                           ckpt_dir=str(tmp_path / "ref_ckpt"))
    ts_ref = train(cfg, loop, resume=False, mesh=cpu_mesh(8))

    template = init_train_state(jax.random.key(0), cfg, hidden=32)
    ts_dist = ckpt.restore_checkpoint(
        str(work / "ckpt" / "ckpt_00000008.msgpack"), template)
    ref_leaves = jax.tree.leaves(ts_ref.params)
    got_leaves = jax.tree.leaves(ts_dist.params)
    assert len(ref_leaves) == len(got_leaves)
    for r, g in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=1e-6)


def test_initialize_distributed_noop_without_config(monkeypatch):
    """Single-host: no env vars, no explicit coordinator -> no-op False."""
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert D.initialize_distributed() is False


def test_initialize_distributed_autodetect_branch(monkeypatch):
    """TPU_WORKER_HOSTNAMES with >1 host triggers the auto-detect branch;
    we assert it *attempts* jax.distributed.initialize with auto args."""
    calls = {}

    class FakeDistributed:
        @staticmethod
        def initialize(coordinator_address=None, num_processes=None,
                       process_id=None):
            calls["args"] = (coordinator_address, num_processes, process_id)

    import jax
    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert D.initialize_distributed() is True
    assert calls["args"] == (None, None, None)


def test_initialize_distributed_env_override(monkeypatch):
    calls = {}

    class FakeDistributed:
        @staticmethod
        def initialize(coordinator_address=None, num_processes=None,
                       process_id=None):
            calls["args"] = (coordinator_address, num_processes, process_id)

    import jax
    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert D.initialize_distributed() is True
    assert calls["args"] == ("10.0.0.1:1234", 4, 2)


def test_make_global_and_local_value_roundtrip():
    import jax
    from tapnet_tpu.parallel.mesh import cpu_mesh

    mesh = cpu_mesh(8)
    tree = {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
            "key": jax.random.key(7)}
    g = D.make_global(tree, mesh)
    np.testing.assert_array_equal(np.asarray(D.local_value(g["w"])),
                                  tree["w"])
    assert jax.dtypes.issubdtype(g["key"].dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(g["key"])),
        np.asarray(jax.random.key_data(tree["key"])))
