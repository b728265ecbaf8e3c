"""Instance dataset files: save/load/iterate.

The reference generates datasets offline and loads them through a
torch Dataset (SURVEY.md §2.1 "Instance generator" + "Dataset loading",
`generate.py`/`PACKDataset`, unverified). The rebuild samples on device and
needs no files at all — but file datasets remain useful for frozen eval sets
and for interop, so the same Instance pytrees round-trip through .npz here.
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterator, Optional

import numpy as np
import jax

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.types import Instance


def generate_dataset(path: str, cfg: TAPConfig, num: int, seed: int = 0,
                     batch_size: int = 512) -> str:
    """Sample `num` instances on device and write one .npz + config sidecar."""
    from tapnet_tpu.env.sampler import sample_batch

    chunks = []
    for i in range(math.ceil(num / batch_size)):
        n = min(batch_size, num - i * batch_size)
        batch = sample_batch(jax.random.fold_in(jax.random.key(seed), i),
                             n, cfg)
        chunks.append(jax.device_get(batch))
    merged = Instance(*[np.concatenate([np.asarray(getattr(c, f))
                                        for c in chunks], axis=0)
                        for f in Instance._fields])
    save_instances(path, merged, cfg)
    return path


def save_instances(path: str, instances: Instance,
                   cfg: Optional[TAPConfig] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f: np.asarray(getattr(instances, f)) for f in Instance._fields}
    np.savez_compressed(path, **arrays)
    if cfg is not None:
        with open(path + ".json", "w") as f:
            json.dump(cfg.__dict__, f, indent=1)


def load_instances(path: str) -> Instance:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return Instance(*[z[f] for f in Instance._fields])


def load_config(path: str) -> TAPConfig:
    with open((path if path.endswith(".npz") else path + ".npz") + ".json") as f:
        return TAPConfig(**json.load(f))


class PackDataset:
    """Minibatch iterator over a saved instance file (PACKDataset analog)."""

    def __init__(self, path: str, batch_size: int, shuffle_seed: Optional[int] = None):
        self.instances = load_instances(path)
        self.n = self.instances.dims.shape[0]
        self.batch_size = batch_size
        self.shuffle_seed = shuffle_seed

    def __len__(self) -> int:
        return self.n // self.batch_size

    def __iter__(self) -> Iterator[Instance]:
        order = np.arange(self.n)
        if self.shuffle_seed is not None:
            np.random.default_rng(self.shuffle_seed).shuffle(order)
        for i in range(len(self)):
            idx = order[i * self.batch_size:(i + 1) * self.batch_size]
            yield Instance(*[np.asarray(getattr(self.instances, f))[idx]
                             for f in Instance._fields])
