"""Scaling-efficiency harness (BASELINE.json: >=80% at 1 chip / 1 host /
>=2 hosts).

Measures train-step throughput on meshes of growing size over the available
devices (real chips on a pod, virtual CPU devices under
--xla_force_host_platform_device_count for tests) and reports efficiency
relative to linear scaling from the smallest mesh.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.parallel.mesh import data_mesh, put_replicated
from tapnet_tpu.train.reinforce import init_train_state, make_train_step


def measure_train_steps_per_s(cfg: TAPConfig, mesh, batch: int,
                              hidden: int = 64, iters: int = 5) -> float:
    ts = init_train_state(jax.random.key(0), cfg, hidden)
    ts = put_replicated(ts, mesh)
    step = make_train_step(cfg, batch=batch, hidden=hidden, mesh=mesh)
    ts, m = step(ts)
    jax.block_until_ready(m)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, m = step(ts)
    jax.block_until_ready(m)
    return iters / (time.perf_counter() - t0)


def scaling_report(cfg: TAPConfig, device_counts: Sequence[int],
                   per_device_batch: int = 32, hidden: int = 64,
                   devices: Optional[list] = None,
                   iters: int = 5) -> List[dict]:
    """Weak-scaling sweep: batch grows with the mesh; efficiency is measured
    against linear scaling of per-device throughput from the smallest mesh."""
    devices = devices if devices is not None else jax.devices()
    rows = []
    base_per_dev = None
    for n in device_counts:
        mesh = data_mesh(devices[:n])
        batch = per_device_batch * n
        sps = measure_train_steps_per_s(cfg, mesh, batch, hidden, iters)
        inst_per_s = sps * batch
        per_dev = inst_per_s / n
        if base_per_dev is None:
            base_per_dev = per_dev
        rows.append({
            "devices": n,
            "batch": batch,
            "train_steps_per_s": round(sps, 3),
            "instances_per_s": round(inst_per_s, 1),
            "efficiency": round(per_dev / base_per_dev, 3),
        })
    return rows
