"""Multi-process distributed worker (run via tests/test_distributed.py).

Each OS process owns 4 virtual CPU devices; jax.distributed.initialize joins
them into one 8-device runtime (SURVEY.md §2.3 comm-backend row / §4
"multi-host without a cluster").

Modes (argv[4], default "step"):

- "step":    run the sharded train step 3x and have process 0 print the
             metrics as JSON (cross-topology equality test).
- "trainer": run trainer.train() END-TO-END (epochs of steps + process-0
             checkpoint/metrics/eval discipline, SURVEY.md §5 checkpoint
             row). argv[5] = epochs, argv[6] = workdir. A second worker
             generation with more epochs exercises the kill-and-resume path:
             process 0 reads the checkpoint, everyone receives it via
             broadcast_from_main (non-main processes never open the file).

Usage: python _distributed_worker.py <process_id> <num_processes> <port>
       [mode] [epochs] [workdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cfg():
    from tapnet_tpu.config import TAPConfig
    return TAPConfig(dim=2, num_blocks=6, min_blocks=6, container_width=6,
                     container_height=6, target_width=6, allow_rot=True)


def run_step_mode():
    import jax
    from tapnet_tpu.parallel.distributed import local_value, make_global
    from tapnet_tpu.parallel.mesh import data_mesh
    from tapnet_tpu.train.reinforce import init_train_state, make_train_step

    cfg = _cfg()
    mesh = data_mesh()  # all 4*nproc devices across processes
    ts = init_train_state(jax.random.key(0), cfg, hidden=32)
    ts = make_global(ts, mesh)  # replicated global arrays
    step = make_train_step(cfg, batch=16, hidden=32, mesh=mesh)

    history = []
    for _ in range(3):
        ts, metrics = step(ts)
        history.append({k: float(local_value(v)) for k, v in metrics.items()})

    if jax.process_index() == 0:
        print("METRICS " + json.dumps(history), flush=True)


def run_trainer_mode(epochs: int, workdir: str):
    import jax
    from tapnet_tpu.parallel.mesh import data_mesh
    from tapnet_tpu.train.trainer import TrainLoopConfig, train

    cfg = _cfg()
    mesh = data_mesh()
    loop = TrainLoopConfig(
        epochs=epochs, steps_per_epoch=4, batch=16, valid_batch=16,
        hidden=32, seed=0,
        ckpt_dir=os.path.join(workdir, "ckpt"),
        metrics_path=os.path.join(workdir, "metrics.jsonl"))
    ts = train(cfg, loop, resume=True, mesh=mesh)
    if jax.process_index() == 0:
        print(f"TRAINED step={int(ts.step)}", flush=True)


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # exercise the env-var configuration branch of initialize_distributed
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)

    # this machine's JAX build registers an `axon` TPU platform that ignores
    # the JAX_PLATFORMS env var; force CPU via config (as tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tapnet_tpu.parallel.distributed import initialize_distributed
    assert initialize_distributed(), "env-var branch must trigger init"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    if mode == "step":
        run_step_mode()
    elif mode == "trainer":
        run_trainer_mode(int(sys.argv[5]), sys.argv[6])
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
