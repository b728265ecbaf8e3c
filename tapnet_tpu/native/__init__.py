"""Native (C++) TAP environment: ctypes bindings and build-on-demand.

See tapenv.cc for the role of this tier. The binding keeps numpy-in /
numpy-out (no JAX dependency), so serving hosts can validate or generate
trajectories without an accelerator runtime. `rollout_batch` mirrors
`env.core.rollout_batch` / `oracle_rollout` semantics bit-for-bit
(differential-tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.types import EnvState, Instance

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tapenv.cc")
_SO = os.path.join(_HERE, "libtapenv.so")
_LIB = None


def build(force: bool = False) -> str:
    """Compile tapenv.cc -> libtapenv.so (skipped when up to date)."""
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", _SO, "-pthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def is_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    build()
    lib = ctypes.CDLL(_SO)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c_int = ctypes.c_int
    lib.tap_rollout_batch.restype = c_int
    lib.tap_rollout_batch.argtypes = [
        c_int, c_int, c_int, c_int, c_int, c_int, c_int, c_int, c_int, c_int,
        c_int, c_int,
        i32p, i32p, u8p, u8p, c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        i32p, i32p, u8p, i32p, i32p, c_int,
    ]
    _LIB = lib
    return lib


_POLICIES = {"replay": 0, "first": 1, "random": 2}


def rollout_batch(instances: Instance, cfg: TAPConfig, policy: str = "first",
                  rbits: Optional[np.ndarray] = None,
                  actions: Optional[np.ndarray] = None,
                  n_threads: int = 0) -> Tuple[EnvState, np.ndarray, np.ndarray]:
    """Roll a batch natively. Returns (EnvState, actions [B,N], terms [B,5]).

    policy "random" needs rbits [B, N] uint32 (threefry draws,
    bits(fold_in(key_b, t)) — same stream as the JAX env, SPEC.md §10);
    policy "replay" needs actions [B, N] (infeasible entries become no-ops
    and read back as -1: plan validation).
    """
    lib = _load()
    dims = np.ascontiguousarray(np.asarray(instances.dims), np.int32)
    n_total = np.ascontiguousarray(
        np.asarray(instances.n_total).reshape(-1), np.int32)
    up = np.ascontiguousarray(np.asarray(instances.up), np.uint8)
    rot = np.ascontiguousarray(np.asarray(instances.rot), np.uint8)
    B, N = dims.shape[0], cfg.num_blocks
    Wt, Dt, C = cfg.target_width, cfg.target_depth, cfg.num_containers

    pol = _POLICIES[policy]
    a_in = r_in = None
    if policy == "replay":
        if actions is None:
            raise ValueError("replay needs actions")
        a_in = np.ascontiguousarray(np.asarray(actions), np.int32)
        assert a_in.shape == (B, N)
    if policy == "random":
        if rbits is None:
            raise ValueError("random needs rbits")
        r_in = np.ascontiguousarray(np.asarray(rbits), np.uint32)
        assert r_in.shape == (B, N)

    actions_out = np.empty((B, N), np.int32)
    hm = np.empty((B, C, Wt, Dt), np.int32)
    packed = np.empty((B, N), np.uint8)
    placements = np.empty((B, N, 6), np.int32)
    terms = np.empty((B, 5), np.int32)
    if n_threads <= 0:
        n_threads = min(32, os.cpu_count() or 1)
    terms_mask = sum({"C": 1, "P": 2, "S": 4}[t] for t in set(cfg.reward_terms))
    rc = lib.tap_rollout_batch(
        B, cfg.dim, N, Wt, Dt, cfg.target_height, C, cfg.num_rot, cfg.window,
        1 if cfg.placement_variant == "hard" else 0,
        1 if cfg.placement_rule == "mcs" else 0, terms_mask,
        dims, n_total, up, rot, pol,
        a_in.ctypes.data if a_in is not None else None,
        r_in.ctypes.data if r_in is not None else None,
        actions_out, hm, packed, placements, terms, n_threads)
    if rc != 0:
        raise RuntimeError(f"tap_rollout_batch failed rc={rc}")
    t_final = (actions_out >= 0).sum(axis=1).astype(np.int32)
    state = EnvState(heightmap=hm, packed=packed.astype(bool),
                     placements=placements, t=t_final)
    return state, actions_out, terms
