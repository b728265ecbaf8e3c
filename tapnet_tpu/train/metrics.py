"""Structured metrics: JSONL scalars (SURVEY.md §5 observability row).

Replaces the reference's print-based logging with machine-readable JSONL:
one object per logical step, floats materialized on host at log time only.
Pass tb_dir (or TrainLoopConfig.tb_dir) to additionally emit
TensorBoard-format scalar summaries via flax.metrics.tensorboard.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO, Mapping, Optional

import jax


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True,
                 tb_dir: Optional[str] = None):
        self.echo = echo
        self._f: Optional[IO[str]] = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self._tb = None
        if tb_dir:
            from flax.metrics import tensorboard
            self._tb = tensorboard.SummaryWriter(tb_dir)
        self._t0 = time.time()

    def log(self, step: int, metrics: Mapping[str, object], **extra):
        rec = {"step": step, "wall": round(time.time() - self._t0, 3)}
        for k, v in {**metrics, **extra}.items():
            rec[k] = float(jax.device_get(v)) if hasattr(v, "dtype") else v
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step" and isinstance(v, (int, float)):
                    self._tb.scalar(k, v, step)
        if self.echo:
            print(line, flush=True)
        return rec

    def close(self):
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.flush()
