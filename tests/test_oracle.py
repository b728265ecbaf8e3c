"""Property tests for the CPU oracle (the executable spec of SPEC.md).

The reference ships no test suite (SURVEY.md §4); these properties define the
correctness contract the batched JAX env is then held to bit-exactly.
"""

import numpy as np
import jax
import pytest

from tapnet_tpu.config import CONFIGS
from tapnet_tpu.oracle import OracleEnv, generate_instance, oracle_rollout
from tapnet_tpu.types import (
    PLACE_CONTAINER, PLACE_ROT, PLACE_STABLE, PLACE_X, PLACE_Y, PLACE_Z,
)

SEEDS = [0, 1, 2, 7]


def rotated(dims, r, cfg):
    w, d, h = (int(v) for v in dims)
    if r == 1:
        v = [w, d, h]
        a0, a1 = cfg.rot_axes
        v[a0], v[a1] = v[a1], v[a0]
        w, d, h = v
    return w, d, h


@pytest.mark.parametrize("name", list(CONFIGS))
@pytest.mark.parametrize("seed", SEEDS)
def test_generator_properties(name, seed):
    cfg = CONFIGS[name]
    inst = generate_instance(jax.random.key(seed), cfg)
    n = int(inst.n_total)
    assert cfg.min_blocks <= n <= cfg.num_blocks
    dims, pos = inst.dims[:n], inst.pos0[:n]
    # volume conservation: guillotine partitions the initial container exactly
    assert int(np.prod(dims.astype(np.int64), axis=1).sum()) == (
        cfg.container_width * cfg.container_depth * cfg.container_height
    )
    # blocks inside the container
    assert (pos >= 0).all()
    hi = pos + dims
    assert (hi[:, 0] <= cfg.container_width).all()
    assert (hi[:, 1] <= cfg.container_depth).all()
    assert (hi[:, 2] <= cfg.container_height).all()
    # pairwise disjoint (axis-aligned boxes)
    for a in range(n):
        for b in range(a + 1, n):
            overlap = all(
                pos[a, k] < hi[b, k] and pos[b, k] < hi[a, k] for k in range(3)
            )
            assert not overlap, (a, b)
    # padding blocks are unit cubes
    assert (inst.dims[n:] == 1).all()
    # an unsupported-from-above topmost block exists => something is removable
    assert (~inst.up[:n, :n].any(axis=0)).any()


@pytest.mark.parametrize("name", list(CONFIGS))
@pytest.mark.parametrize("seed", SEEDS[:2])
@pytest.mark.parametrize("policy", ["first", "random"])
def test_rollout_invariants(name, seed, policy):
    cfg = CONFIGS[name]
    key = jax.random.key(seed)
    inst = generate_instance(key, cfg)
    env, actions, masks = oracle_rollout(inst, cfg, policy=policy, key=key)

    n = int(inst.n_total)
    pl = env.state.placements
    if cfg.target_height == 0:
        # every real block got packed (unbounded height never dead-ends)
        assert env.done()
        assert (pl[:n, PLACE_CONTAINER] >= 0).all()
    else:
        # finite cap: rollouts may strand blocks, but never break the cap
        assert env.state.heightmap.max() <= cfg.target_height

    # reconstruct occupancy per container: no overlaps, matches heightmap
    for c in range(cfg.num_containers):
        occ = np.zeros((cfg.target_width, cfg.target_depth, 4096), dtype=np.int32)
        for b in range(n):
            if pl[b, PLACE_CONTAINER] != c:
                continue
            w, d, h = rotated(inst.dims[b], int(pl[b, PLACE_ROT]), cfg)
            x, y, z = (int(pl[b, k]) for k in (PLACE_X, PLACE_Y, PLACE_Z))
            occ[x:x + w, y:y + d, z:z + h] += 1
        assert occ.max() <= 1, "blocks overlap"
        # heightmap >= top of occupancy everywhere (greater allowed: overhangs)
        top = np.zeros((cfg.target_width, cfg.target_depth), dtype=np.int32)
        nz = occ.nonzero()
        for x, y, z in zip(*nz):
            top[x, y] = max(top[x, y], z + 1)
        assert (env.state.heightmap[c] >= top).all()

    # rewards in (0, 1]
    C, P, S = env.reward_fractions()
    assert 0 < C <= 1 and 0 < P <= 1 and 0 <= S <= 1
    # masks never admitted a packed or padding block
    seen = set()
    for t, a in enumerate(actions):
        if a < 0:
            continue
        b, r, c = cfg.decompose_action(int(a))
        assert b < n and b not in seen
        assert masks[t][a]
        seen.add(b)


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_precedence_respected(seed):
    """A block is only moved after everything that obstructs it."""
    cfg = CONFIGS["2d-rot"]
    key = jax.random.key(seed)
    inst = generate_instance(key, cfg)
    env, actions, _ = oracle_rollout(inst, cfg, policy="random", key=key)
    order = {}
    for t, a in enumerate(actions):
        if a >= 0:
            b, r, c = cfg.decompose_action(int(a))
            order[b] = (t, r)
    for b, (t, r) in order.items():
        for a in range(int(inst.n_total)):
            if inst.up[a, b]:
                assert order[a][0] < t, f"block {b} moved before obstructor {a}"
            if r == 1 and inst.rot[a, b]:
                assert order[a][0] < t


def test_hard_variant_prefers_stable():
    cfg = CONFIGS["2d-basic"]
    hard = type(cfg)(**{**cfg.__dict__, "reward_type": "C+P+S-lb-hard"})
    for seed in SEEDS:
        key = jax.random.key(seed)
        inst = generate_instance(key, cfg)
        env_s, _, _ = oracle_rollout(inst, cfg, policy="first")
        env_h, _, _ = oracle_rollout(inst, hard, policy="first")
        _, _, S_soft = env_s.reward_fractions()
        _, _, S_hard = env_h.reward_fractions()
        assert S_hard >= S_soft


def test_generator_determinism():
    cfg = CONFIGS["3d-basic"]
    a = generate_instance(jax.random.key(42), cfg)
    b = generate_instance(jax.random.key(42), cfg)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_rollout_precomputed_rbits_bit_parity():
    """rollout_rbits precomputes the exact inline threefry stream: the timed
    oracle baseline (benchmarks.measure_oracle_steps_per_s) must stay
    bit-identical to the eager-draw path it replaced (VERDICT r3 weak #2)."""
    from tapnet_tpu.oracle.rollout import rollout_rbits

    for name in ("2d-rot", "3d-basic"):
        cfg = CONFIGS[name]
        key = jax.random.key(7)
        inst = generate_instance(key, cfg)
        env_a, act_a, _ = oracle_rollout(inst, cfg, policy="random", key=key)
        env_b, act_b, _ = oracle_rollout(inst, cfg, policy="random",
                                         rbits=rollout_rbits(key, cfg))
        assert np.array_equal(act_a, act_b)
        assert np.array_equal(env_a.state.heightmap, env_b.state.heightmap)
