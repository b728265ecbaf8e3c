"""Checkpoint/resume: pytree serialization with deterministic resume.

Reference: per-epoch torch.save of actor+critic state dicts (SURVEY.md §5,
unverified). Here the full TrainState (params, optimizer state, step counter,
and the RNG key that drives on-device instance sampling) is serialized, so a
restore resumes the exact trajectory stream — resume is seed-deterministic,
which is the whole fault-tolerance story (SURVEY.md §5 failure row).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import flax.serialization
import jax

from tapnet_tpu.train.reinforce import TrainState


def save_checkpoint(ckpt_dir: str, ts: TrainState) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(ts.step)
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.msgpack")
    tmp = path + ".tmp"
    # typed PRNG keys are an extended dtype msgpack can't carry: store raw bits
    ts = ts._replace(key=jax.random.key_data(ts.key))
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(ts)))
    os.replace(tmp, path)  # atomic: no torn checkpoints on kill -9
    with open(os.path.join(ckpt_dir, "latest.json"), "w") as f:
        json.dump({"step": step, "path": path}, f)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    meta = os.path.join(ckpt_dir, "latest.json")
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        path = json.load(f)["path"]
    return path if os.path.exists(path) else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into a template TrainState (shapes/dtypes from init)."""
    impl = jax.random.key_impl(template.key)
    template = template._replace(key=jax.random.key_data(template.key))
    with open(path, "rb") as f:
        ts = flax.serialization.from_bytes(template, f.read())
    return ts._replace(key=jax.random.wrap_key_data(ts.key, impl=impl))
