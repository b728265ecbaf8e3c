"""Tracing / profiling (SURVEY.md §5 tracing row).

The reference has ad-hoc timing prints; here: jax.profiler traces with named
scopes around the hot phases (sample / rollout / learn), perfetto-compatible
dumps, and a device-time env-steps/s counter — the BASELINE.json metric —
measured by steps-per-second over block_until_ready'd batches.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace (view with TensorBoard/perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_time_ms(fn, name: str, iters: int = 5, warmup: int = 2,
                   trace_dir: Optional[str] = None) -> float:
    """Profiler-derived DEVICE ms per call of a jitted `fn()` (no args).

    Runs `warmup` untimed calls, then `iters` calls under jax.profiler.trace,
    and attributes the outermost `jit_<name>` module events of the device
    plane (utils.xplane.jit_device_ms). Unlike wall-clock, this excludes host
    dispatch and TPU-tunnel latency — the number of record for every
    throughput claim (VERDICT r3 item 1). `name` must be the jit-visible
    function name (f.__name__ of the jitted callable).
    """
    import tempfile

    from tapnet_tpu.utils.xplane import jit_device_ms

    out = None
    for _ in range(warmup):
        out = fn()
    if out is not None:
        jax.block_until_ready(out)
    ctx = (contextlib.nullcontext(trace_dir) if trace_dir
           else tempfile.TemporaryDirectory())
    with ctx as d:
        with trace(d):
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
        return jit_device_ms(d, name, iters)


class StepsPerSecond:
    """Running env-steps/s (and steps/s/chip) counter for training loops."""

    def __init__(self, steps_per_batch: int, n_devices: Optional[int] = None):
        self.steps_per_batch = steps_per_batch
        self.n_devices = n_devices or jax.device_count()
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._batches = 0

    def update(self, n_batches: int = 1):
        self._batches += n_batches

    @property
    def steps_per_s(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._batches * self.steps_per_batch / max(dt, 1e-9)

    @property
    def steps_per_s_per_chip(self) -> float:
        return self.steps_per_s / self.n_devices

    def metrics(self) -> dict:
        sps = self.steps_per_s  # snapshot once; both values share one dt
        return {"env_steps_per_s": round(sps, 1),
                "env_steps_per_s_per_chip": round(sps / self.n_devices, 1)}
