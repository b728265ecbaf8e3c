"""Multi-process distributed worker (run via tests/test_distributed.py).

Each OS process owns 4 virtual CPU devices; jax.distributed.initialize joins
them into one 8-device runtime (SURVEY.md §2.3 comm-backend row / §4
"multi-host without a cluster"). The worker runs the SAME sharded train step
as the single-process path and process 0 prints the metrics as JSON so the
test can assert cross-topology equality.

Usage: python _distributed_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
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

    from tapnet_tpu.parallel.distributed import (initialize_distributed,
                                                 local_value, make_global)
    assert initialize_distributed(), "env-var branch must trigger init"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    from tapnet_tpu.config import TAPConfig
    from tapnet_tpu.parallel.mesh import data_mesh
    from tapnet_tpu.train.reinforce import init_train_state, make_train_step

    cfg = TAPConfig(dim=2, num_blocks=6, min_blocks=6, container_width=6,
                    container_height=6, target_width=6, allow_rot=True)
    mesh = data_mesh()  # all 4*nproc devices across processes
    ts = init_train_state(jax.random.key(0), cfg, hidden=32)
    ts = make_global(ts, mesh)  # replicated global arrays
    step = make_train_step(cfg, batch=16, hidden=32, mesh=mesh)

    history = []
    for _ in range(3):
        ts, metrics = step(ts)
        history.append({k: float(local_value(v)) for k, v in metrics.items()})

    if proc_id == 0:
        print("METRICS " + json.dumps(history), flush=True)


if __name__ == "__main__":
    main()
