"""Structured metrics: JSONL scalars (SURVEY.md §5 observability row).

Replaces the reference's print-based logging with machine-readable JSONL:
one object per logical step, floats materialized on host at log time only.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO, Mapping, Optional

import jax


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.echo = echo
        self._f: Optional[IO[str]] = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, metrics: Mapping[str, object], **extra):
        rec = {"step": step, "wall": round(time.time() - self._t0, 3)}
        for k, v in {**metrics, **extra}.items():
            rec[k] = float(jax.device_get(v)) if hasattr(v, "dtype") else v
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
        if self.echo:
            print(line, flush=True)
        return rec

    def close(self):
        if self._f:
            self._f.close()
