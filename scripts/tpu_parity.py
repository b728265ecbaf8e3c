"""On-hardware kernel parity gate -> PARITY_TPU.json (VERDICT r2 item 2).

Every bit-exactness test in tests/ runs the Pallas kernels in interpreter
mode on CPU (tests/conftest.py forces jax_platforms=cpu), and round 2 found
a real TPU miscompile the interpreter can't see (bool-scatter, commit
ac2edeb). This script is the missing hardware gate: on the real chip with
interpret=False it runs

  1. the monolithic fused rollout kernel (ops.pallas_env.fused_rollout_batch)
     for every eligible driver config x {first, random} policies,
  2. the per-decode-step policy kernel (ops.pallas_policy_step.select_step)
     inside full actor rollouts for the driver configs PLUS the non-lb
     variants (mcs-soft/hard, capped-hard, 3d-mcs-hard),
  3. the fused C/P/S reward kernel (ops.pallas_reward.batched_reward_terms),

each against the general jitted path on the same chip, and records
per-field equality booleans in PARITY_TPU.json. Exit code 1 if anything
mismatches. Run: `python scripts/tpu_parity.py [--batch 256]`.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--out", default=os.path.join(REPO, "PARITY_TPU.json"))
    args = p.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tapnet_tpu.config import CONFIGS, TAPConfig
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env.sampler import sample_batch
    from tapnet_tpu.models import init_params
    from tapnet_tpu.ops import batched_reward_terms
    from tapnet_tpu.ops import pallas_env as PE
    from tapnet_tpu.ops import pallas_policy_step as PS
    from tapnet_tpu.train.rollout import rollout_batch_record

    variants = {
        "2d-mcs-soft": TAPConfig(reward_type="C+P+S-mcs-soft"),
        "2d-mcs-hard": TAPConfig(reward_type="C+P+S-mcs-hard"),
        "2d-capped-hard": TAPConfig(target_height=12,
                                    reward_type="C+P+S-lb-hard"),
        "3d-mcs-hard": TAPConfig(dim=3, container_width=8, container_depth=8,
                                 container_height=8, target_width=8,
                                 target_depth=8, allow_rot=True,
                                 reward_type="C+P+S-mcs-hard"),
    }
    B = args.batch
    backend = jax.default_backend()
    report = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "batch": B,
        "interpret": False,
        "fused_rollout": {},
        "select_step": {},
        "reward_kernel": {},
    }
    if backend != "tpu":
        print("ERROR: must run on the real TPU backend", file=sys.stderr)
        return 1

    def eq(a, b):
        return bool(np.array_equal(np.asarray(a), np.asarray(b)))

    all_ok = True

    # ---- 1. monolithic fused rollout kernel (driver configs + eligible
    #         variants, incl. fused mcs) ---------------------------------
    for name, cfg in dict(CONFIGS, **variants).items():
        if not PE.eligible(cfg):
            continue
        key = jax.random.key(11)
        batch = sample_batch(key, B, cfg)
        keys = jax.random.split(key, B)
        for policy in ("first", "random"):
            s_g, a_g, r_g = jax.jit(
                lambda b, k, policy=policy, cfg=cfg: E.rollout_batch(
                    b, k, cfg, policy=policy))(batch, keys)
            s_f, a_f, r_f = PE.fused_rollout_batch(batch, keys, cfg,
                                                   policy=policy)
            row = {
                "actions": eq(a_g, a_f),
                "heightmap": eq(s_g.heightmap, s_f.heightmap),
                "packed": eq(s_g.packed, s_f.packed),
                "placements": eq(s_g.placements, s_f.placements),
                "rewards": eq(r_g, r_f),
            }
            report["fused_rollout"][f"{name}/{policy}"] = row
            all_ok &= all(row.values())
            print(f"fused_rollout {name}/{policy}: {row}", flush=True)

    # ---- 2. per-decode-step policy kernel inside actor rollouts ----------
    step_cases = dict(CONFIGS, **variants)
    for name, cfg in step_cases.items():
        if not (PS.eligible(cfg) and B % PS.TB == 0):
            continue
        key = jax.random.key(29)
        params = init_params(key, cfg, hidden=64)["actor"]
        batch = sample_batch(key, B, cfg)
        keys = jax.random.split(key, B)
        for greedy in ((False, True) if name == "2d-basic" else (False,)):
            s_g, r_g, lp_g = jax.jit(
                lambda p, i, k, cfg=cfg, greedy=greedy: rollout_batch_record(
                    p, i, k, cfg, 64, greedy=greedy, step_kernel=False))(
                params, batch, keys)
            s_f, r_f, lp_f = jax.jit(
                lambda p, i, k, cfg=cfg, greedy=greedy: rollout_batch_record(
                    p, i, k, cfg, 64, greedy=greedy, step_kernel=True))(
                params, batch, keys)
            row = {
                "actions": eq(r_g.action, r_f.action),
                "flags": eq(r_g.flags, r_f.flags),
                "rec_heightmap": eq(r_g.heightmap, r_f.heightmap),
                "mask": eq(r_g.mask, r_f.mask),
                "state_heightmap": eq(s_g.heightmap, s_f.heightmap),
                "state_packed": eq(s_g.packed, s_f.packed),
                "state_placements": eq(s_g.placements, s_f.placements),
                "logp_close": bool(np.allclose(np.asarray(lp_g),
                                               np.asarray(lp_f),
                                               rtol=1e-5, atol=1e-5)),
            }
            tag = f"{name}/{'greedy' if greedy else 'sampled'}"
            report["select_step"][tag] = row
            all_ok &= all(row.values())
            print(f"select_step {tag}: {row}", flush=True)

    # ---- 3. fused reward kernel ------------------------------------------
    for name, cfg in CONFIGS.items():
        key = jax.random.key(43)
        batch = sample_batch(key, B, cfg)
        keys = jax.random.split(key, B)
        s, _, _ = jax.jit(lambda b, k, cfg=cfg: E.rollout_batch(
            b, k, cfg, policy="random"))(batch, keys)
        ref = jax.jit(jax.vmap(
            lambda s_, i, cfg=cfg: E.reward_terms(s_, i, cfg)))(s, batch)
        got = batched_reward_terms(s.heightmap, s.placements, batch.dims)
        row = {f: eq(a, b) for f, a, b in zip(
            ("vol", "denom_c", "denom_p", "s_num", "s_den"), ref, got)}
        report["reward_kernel"][name] = row
        all_ok &= all(row.values())
        print(f"reward_kernel {name}: {row}", flush=True)

    # ---- 4. fused actor-head decode-step kernel (SPEC.md §12 two-tier):
    #         f32 sampled trajectories must be action/state EXACT; bf16 is
    #         validated distributionally (agreement rate + reward parity) --
    from tapnet_tpu.ops import pallas_actor_step as AS
    report["actor_kernel"] = {}
    report["actor_kernel_bf16"] = {}
    for name, cfg in CONFIGS.items():
        if not AS.eligible(cfg) or B % 128:
            continue
        key = jax.random.key(57)
        params = init_params(key, cfg, hidden=64)["actor"]
        batch = sample_batch(key, B, cfg)
        keys = jax.random.split(key, B)
        # windowed configs: run the f32 tier-1 comparison with exact-f32
        # matmuls. Default "f32" dots are bf16-pass decompositions on the
        # MXU; rolling's 50 duplicate-heavy blocks make sampled near-ties
        # common enough that pass-decomposition drift (~1e-3) flips one in
        # a few thousand draws on BOTH correct paths (tests/test_actor_step
        # runs the same contract under highest precision on CPU)
        import contextlib
        prec = (jax.default_matmul_precision("highest") if cfg.window > 0
                else contextlib.nullcontext())
        with prec:
            s_g, r_g, lp_g = jax.jit(
                lambda p, i, k, cfg=cfg: rollout_batch_record(
                    p, i, k, cfg, 64, step_kernel=False,
                    actor_kernel=False))(params, batch, keys)
            s_f, r_f, lp_f = jax.jit(
                lambda p, i, k, cfg=cfg: rollout_batch_record(
                    p, i, k, cfg, 64, actor_kernel=True))(
                params, batch, keys)
            jax.block_until_ready((s_g, s_f))
        row = {
            "actions": eq(r_g.action, r_f.action),
            "flags": eq(r_g.flags, r_f.flags),
            "mask": eq(r_g.mask, r_f.mask),
            "state_heightmap": eq(s_g.heightmap, s_f.heightmap),
            "state_placements": eq(s_g.placements, s_f.placements),
            "logp_close": bool(np.allclose(np.asarray(lp_g),
                                           np.asarray(lp_f),
                                           rtol=1e-4, atol=1e-4)),
        }
        report["actor_kernel"][name] = row
        all_ok &= all(row.values())
        print(f"actor_kernel {name}: {row}", flush=True)

        # bf16 tier-2: agreement rate + end-state reward parity (the train
        # path's compute dtype; ties/rounding may flip a small fraction)
        import jax.numpy as jnp
        s_gb, r_gb, _ = jax.jit(
            lambda p, i, k, cfg=cfg: rollout_batch_record(
                p, i, k, cfg, 64, dtype=jnp.bfloat16, step_kernel=False,
                actor_kernel=False))(params, batch, keys)
        s_fb, r_fb, _ = jax.jit(
            lambda p, i, k, cfg=cfg: rollout_batch_record(
                p, i, k, cfg, 64, dtype=jnp.bfloat16, actor_kernel=True))(
            params, batch, keys)
        agree = float((np.asarray(r_gb.action)
                       == np.asarray(r_fb.action)).mean())
        R_gb = jax.jit(jax.vmap(lambda s_, i, cfg=cfg: E.reward(
            s_, i, cfg)))(s_gb, batch)
        R_fb = jax.jit(jax.vmap(lambda s_, i, cfg=cfg: E.reward(
            s_, i, cfg)))(s_fb, batch)
        drew = abs(float(np.mean(np.asarray(R_gb)))
                   - float(np.mean(np.asarray(R_fb))))
        row_b = {"action_agreement": round(agree, 4),
                 "mean_reward_absdiff": round(drew, 4),
                 "ok": bool(agree > 0.9 and drew < 0.02)}
        report["actor_kernel_bf16"][name] = row_b
        all_ok &= row_b["ok"]
        print(f"actor_kernel_bf16 {name}: {row_b}", flush=True)

    # ---- 5. custom-VJP replay kernel: value + every param grad vs
    #         jax.grad of the XLA replay, on hardware -----------------------
    from tapnet_tpu.train.rollout import replay_logp_sum
    report["replay_kernel"] = {}
    for name, cfg in CONFIGS.items():
        if B % 128:
            continue
        # round 5: the replay kernel covers EVERY config (recorded-mask
        # operand) — the record comes from whichever rollout path the
        # config auto-selects (actor kernel, or select_step for capped)
        key = jax.random.key(71)
        params = init_params(key, cfg, hidden=64)["actor"]
        batch = sample_batch(key, B, cfg)
        keys = jax.random.split(key, B)
        _, rec, _ = jax.jit(
            lambda p, i, k, cfg=cfg: rollout_batch_record(
                p, i, k, cfg, 64, with_logp=False))(params, batch, keys)
        rec = jax.lax.stop_gradient(rec)

        def lp(p, kernel, cfg=cfg, rec=rec, batch=batch):
            return replay_logp_sum(p, batch, rec, cfg, hidden=64,
                                   kernel=kernel).sum()

        vx, gx = jax.value_and_grad(lambda p: lp(p, False))(params)
        vk, gk = jax.value_and_grad(lambda p: lp(p, True))(params)
        worst = 0.0
        for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gk)):
            scale = float(np.max(np.abs(np.asarray(a)))) + 1e-9
            worst = max(worst, float(np.max(np.abs(
                np.asarray(b) - np.asarray(a)))) / scale)
        # threshold: on hardware BOTH sides are ~f32 via different MXU pass
        # decompositions (XLA bf16x3 vs the kernel's preferred_element_type
        # accumulation), so worst-leaf diffs sit at ~1e-3 relative — an
        # accumulation-order floor, not an error (CPU interpret agreement
        # vs jax.grad is ~3e-6, tests/test_pallas_replay.py)
        row = {"value_close": bool(np.isclose(float(vk), float(vx),
                                              rtol=1e-5, atol=1e-2)),
               "worst_grad_rel": round(worst, 8),
               "ok": bool(worst < 5e-3)}
        row["ok"] = bool(row["ok"] and row["value_close"])
        report["replay_kernel"][name] = row
        all_ok &= row["ok"]
        print(f"replay_kernel {name}: {row}", flush=True)

    report["all_ok"] = bool(all_ok)
    report["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}; all_ok={all_ok}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
