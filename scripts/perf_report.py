"""Device-time + roofline measurement for PERF.md (VERDICT r3 item 1).

Measures, for the headline targets, three things per target:
  - wall ms/iter (what the tunnel-attached host observes),
  - DEVICE ms/iter (profiler `jit_<fn>` outer event — the number of record),
  - XLA cost_analysis() FLOPs -> achieved TFLOP/s and % of v5e bf16 peak.

Writes PERF_DEVICE.json; PERF.md cites it. Run on the TPU host, ONE process
at a time. `--sessions 3` re-executes the measurement in fresh OS processes
(fresh runtime, fresh allocator) and reports per-session device numbers —
the cross-session stability evidence the wall-clock history never had.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Public v5e peak numbers (Google Cloud TPU docs): 197 TFLOP/s bf16,
# 819 GB/s HBM BW. The VPU int ceiling is not published; PERF.md derives an
# estimate from the SIMD geometry instead of claiming one here.
BF16_PEAK = 197e12
HBM_GBS = 819e9


def measure_all():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import time

    import jax.numpy as jnp
    import numpy as np

    from tapnet_tpu.config import CONFIGS
    from tapnet_tpu.env import sample_batch
    from tapnet_tpu.ops.pallas_env import eligible, fused_rollout_batch
    from tapnet_tpu.train.reinforce import init_train_state, make_train_step
    from tapnet_tpu.utils.profiling import device_time_ms

    out = {"backend": jax.default_backend(), "targets": {}}
    B = 4096

    def wall_ms(fn, iters=10):
        fn()
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn()
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters * 1e3

    # --- fused heuristic rollout (group of 128 per dispatch) --------------
    cfg = CONFIGS["2d-basic"]
    batch = sample_batch(jax.random.key(0), B, cfg)
    G = 128
    keys_g = jnp.stack([jax.random.split(jax.random.key(1 + g), B)
                        for g in range(G)])

    @jax.jit
    def fused_group(b, kg):
        def body(acc, k):
            _, a, r = fused_rollout_batch(b, k, cfg, policy="random")
            return (acc[0] + r.sum(), acc[1] + a.sum()), None
        return jax.lax.scan(body, (jnp.float32(0), jnp.int32(0)), kg)[0]

    jax.block_until_ready(fused_group(batch, keys_g))
    steps = int(np.asarray(batch.n_total).sum()) * G
    dev = device_time_ms(lambda: fused_group(batch, keys_g), "fused_group",
                         iters=3)
    wall = wall_ms(lambda: fused_group(batch, keys_g), iters=3)
    comp = jax.jit(fused_group).lower(batch, keys_g).compile()
    ca = comp.cost_analysis() or {}
    out["targets"]["fused_rollout_2d_basic"] = {
        "device_ms_per_rollout": round(dev / G, 4),
        "wall_ms_per_rollout": round(wall / G, 4),
        "device_env_steps_per_s": round(steps / G / (dev / G / 1e3), 1),
        "bytes_accessed_per_rollout": (round(ca.get("bytes accessed", 0) / G)
                                       if ca else None),
        "note": "VPU int32 kernel; FLOP-based MFU not meaningful — see "
                "the ops model in PERF.md",
    }

    # --- train steps for every config ------------------------------------
    for name in list(CONFIGS):
        c = CONFIGS[name]
        ts = init_train_state(jax.random.key(0), c, hidden=128)
        spc = 8
        step = make_train_step(c, batch=B, hidden=128, steps_per_call=spc)
        for _ in range(2):
            ts, m = step(ts)
            jax.block_until_ready(m)
        box = [ts]

        def call():
            box[0], m = step(box[0])
            return m

        dev = device_time_ms(call, "train_steps", iters=3) / spc
        wall = wall_ms(call, iters=3) / spc
        env_steps = B * c.num_blocks
        row = {
            "device_ms_per_step": round(dev, 3),
            "wall_ms_per_step": round(wall, 3),
            "device_env_steps_per_s": round(env_steps / (dev / 1e3), 1),
        }
        try:
            # FLOPs of one grouped call / spc — the XLA cost model's count
            comp = jax.jit(lambda t: step(t)).lower(box[0]).compile()
            ca = comp.cost_analysis() or {}
            fl = float(ca.get("flops", 0.0)) / spc
            if fl > 0:
                row["flops_per_step"] = round(fl)
                row["achieved_tflops"] = round(fl / (dev / 1e3) / 1e12, 2)
                row["mfu_pct_of_bf16_peak"] = round(
                    100 * fl / (dev / 1e3) / BF16_PEAK, 2)
            by = float(ca.get("bytes accessed", 0.0)) / spc
            if by > 0:
                row["bytes_per_step"] = round(by)
                row["hbm_bw_util_pct"] = round(
                    100 * by / (dev / 1e3) / HBM_GBS, 2)
        except Exception as e:  # cost model optional
            row["cost_analysis_error"] = str(e)[:120]
        out["targets"][f"train_{name}"] = row
        print(f"{name}: {row}", file=sys.stderr, flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sessions", type=int, default=0,
                   help="run N fresh-process sessions of the 2d-basic "
                        "device measurement for stability evidence")
    p.add_argument("--out", default=os.path.join(REPO, "PERF_DEVICE.json"))
    p.add_argument("--session-probe", action="store_true",
                   help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.session_probe:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache_tpu"))
        import jax.numpy as jnp
        import numpy as np
        from tapnet_tpu.config import CONFIGS
        from tapnet_tpu.benchmarks import measure_env_stats, \
            measure_train_stats
        cfg = CONFIGS["2d-basic"]
        env = measure_env_stats(cfg, batch=4096, iters=256, runs=1)
        tr = measure_train_stats(cfg, batch=4096, iters=10, runs=1)
        print(json.dumps({
            "env_device_ms": env.get("device_ms_per_rollout"),
            "env_wall_steps_per_s": env["value"],
            "train_device_ms": tr.get("device_ms_per_step"),
            "train_wall_steps_per_s": tr["value"]}))
        return

    rec = measure_all()
    if args.sessions > 0:
        probes = []
        for s in range(args.sessions):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--session-probe"],
                capture_output=True, text=True, timeout=1800)
            line = r.stdout.strip().splitlines()[-1] if r.stdout else "{}"
            probes.append(json.loads(line))
            print(f"session {s}: {line}", file=sys.stderr, flush=True)
        rec["fresh_sessions"] = probes

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
