"""Config-space fuzz: oracle == JAX env == native C++ on random geometries.

The named driver configs pin 5 points of the config space; this sweeps random
(dim, sizes, N, rotation, containers, window, height cap, variant) draws so
the bit-exactness contract (SPEC.md) holds across the space, not just at the
named points.
"""

import os

import numpy as np
import jax
import pytest

from tapnet_tpu.config import TAPConfig
from tapnet_tpu.env import core as E
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.oracle import oracle_rollout


def _random_cfg(rng: np.random.Generator) -> TAPConfig:
    dim = int(rng.choice([2, 3]))
    if dim == 2:
        W, D, H = int(rng.integers(4, 13)), 1, int(rng.integers(4, 13))
    else:
        W, D, H = (int(rng.integers(3, 7)), int(rng.integers(3, 7)),
                   int(rng.integers(3, 7)))
    num_blocks = int(rng.integers(4, min(13, W * D * H + 1)))
    min_blocks = int(rng.integers(max(1, num_blocks - 3), num_blocks + 1))
    terms = rng.choice(["C", "C+P", "C+P+S", "P+S", "S"])
    rule = rng.choice(["lb", "lb", "mcs"])  # SPEC.md §6.4 placement rules
    variant = rng.choice(["soft", "hard"])
    tw = int(rng.integers(max(2, W - 2), W + 3))
    td = 1 if dim == 2 else int(rng.integers(max(2, D - 1), D + 2))
    th = 0 if rng.random() < 0.6 else int(rng.integers(H, 2 * H + 1))
    return TAPConfig(
        dim=dim, num_blocks=num_blocks, min_blocks=min_blocks,
        container_width=W, container_depth=D, container_height=H,
        target_width=tw, target_depth=td, target_height=th,
        num_containers=int(rng.choice([1, 1, 2])),
        allow_rot=bool(rng.random() < 0.6),
        window=0 if rng.random() < 0.6 else int(rng.integers(2, 6)),
        reward_type=f"{terms}-{rule}-{variant}")


# The fuzz matrix rotates by round (VERDICT r2 item 9): 6 seeds in the fast
# suite keyed off TAPNET_FUZZ_ROUND (fresh geometry coverage each round,
# stable within a round so the compile cache stays warm), 6 more under slow.
ROUND = int(os.environ.get("TAPNET_FUZZ_ROUND", "5"))


@pytest.mark.parametrize("seed", range(6))
def test_fuzzed_config_parity(seed):
    rng = np.random.default_rng(1000 + 100 * ROUND + seed)
    cfg = _random_cfg(rng)
    B = 6
    key = jax.random.key(seed)
    batch = sample_batch(key, B, cfg)
    keys = jax.random.split(key, B)

    # JAX env (jit/vmap)
    s_j, a_j, r_j = E.rollout_batch(batch, keys, cfg, policy="random")

    # oracle, instance by instance
    for i in range(B):
        inst = jax.tree.map(lambda x: np.asarray(x[i]), batch)
        env, actions, _ = oracle_rollout(inst, cfg, policy="random",
                                         key=keys[i])
        assert np.array_equal(actions, np.asarray(a_j[i])), cfg
        assert np.array_equal(env.state.heightmap,
                              np.asarray(s_j.heightmap[i])), cfg
        assert np.array_equal(env.state.placements,
                              np.asarray(s_j.placements[i])), cfg

    # native C++ tier (skipped without a toolchain)
    try:
        from tapnet_tpu import native
        available = native.is_available()
    except Exception:
        available = False
    if available:
        def draws(k):
            return jax.numpy.stack([
                jax.random.bits(jax.random.fold_in(k, t),
                                dtype=jax.numpy.uint32)
                for t in range(cfg.num_blocks)])
        rbits = np.asarray(jax.vmap(draws)(keys))
        s_n, a_n, _ = native.rollout_batch(batch, cfg, policy="random",
                                           rbits=rbits)
        assert np.array_equal(np.asarray(a_j), a_n), cfg
        assert np.array_equal(np.asarray(s_j.heightmap), s_n.heightmap), cfg


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6, 12))
def test_fuzzed_config_parity_extended(seed):
    test_fuzzed_config_parity(seed)
