"""Committed scaling-efficiency artifact (VERDICT r3 item 5; BASELINE.json
bar: >=80% efficiency at 1 chip / 1 host / >=2 hosts).

Two halves, because this machine has ONE tunnel-attached chip:

1. Virtual-mesh weak scaling (correctness only): the real sharded train
   step on 1/2/4/8 virtual CPU devices. Virtual devices share 2 host
   cores, so wall-clock efficiency here measures core contention, not the
   sharding — the table documents that the sharded program RUNS and what
   it communicates, nothing more.

2. Analytic communication budget (the actual >=80% argument): the sharded
   train step's only cross-device traffic is the gradient/metric all-reduce
   (proved structurally by tests/test_parallel.py::
   test_hlo_collective_audit_train_step and the zero-collective rollout
   audit in tests/test_aux.py). The budget is therefore
       t_comm ~= 2 * grad_bytes / link_bw        (ring all-reduce, >=2 dev)
       efficiency >= t_step / (t_step + t_comm)  (zero-overlap pessimism)
   with grad_bytes counted from the real param tree and t_step the
   profiler-measured DEVICE time of one optimizer step (PERF.md).

Usage: python scripts/scaling_report.py [--out SCALING.md]
           [--step-ms 3.32]   # measured device ms/step (bench device_ms)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _configure_cpu_mesh():
    """Force an 8-virtual-device CPU platform. Called from main() only, so
    importing this module (tests exec it for analytic_rows) mutates no
    global JAX/XLA state."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

# Interconnect assumptions (stated, not measured — no multi-chip hardware
# here). v5e: 1,600 Gbps/chip ICI (Google Cloud TPU v5e spec) -> 100 GB/s
# per direction; DCN: one 200 Gbps host NIC shared by 8 chips/host.
ICI_GBPS_PER_DIR = 100.0e9
DCN_GBPS_PER_HOST = 25.0e9


def analytic_rows(grad_bytes: int, step_ms: float):
    rows = []
    for devices, fabric, bw, chips_per_link in (
            (1, "—", None, 1),
            (8, "ICI (1 host)", ICI_GBPS_PER_DIR, 1),
            (16, "DCN (2 hosts)", DCN_GBPS_PER_HOST, 8),
            (64, "DCN (8 hosts)", DCN_GBPS_PER_HOST, 8),
            (256, "ICI (v5e-256 pod)", ICI_GBPS_PER_DIR, 1)):
        if devices == 1:
            t_comm = 0.0
        else:
            # ring all-reduce: 2*(n-1)/n * G bytes in and out of every
            # device; on DCN all chips of a host share the NIC
            t_comm = 2.0 * grad_bytes * chips_per_link / bw * 1e3  # ms
        eff = step_ms / (step_ms + t_comm)
        rows.append({"devices": devices, "fabric": fabric,
                     "t_comm_ms": round(t_comm, 4),
                     "efficiency_lower_bound": round(eff, 4)})
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md"))
    p.add_argument("--step-ms", type=float, default=None,
                   help="measured device ms per optimizer step "
                        "(default: train_device_ms_per_step from "
                        "BENCH_r*.json if present, else 3.32)")
    p.add_argument("--hidden", type=int, default=128)
    args = p.parse_args()

    _configure_cpu_mesh()
    import jax
    import numpy as np

    from tapnet_tpu.config import CONFIGS, TAPConfig
    from tapnet_tpu.models import init_params
    from tapnet_tpu.parallel.scaling import scaling_report

    # --- real gradient size -------------------------------------------------
    cfg = CONFIGS["2d-basic"]
    params = init_params(jax.random.key(0), cfg, hidden=args.hidden)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    grad_bytes = n_params * 4  # f32 gradients (params stay f32; bf16 is
    #                            compute-only — train.reinforce)

    step_ms = args.step_ms
    if step_ms is None:
        step_ms = 3.32
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        benches = sorted(f for f in os.listdir(repo)
                         if f.startswith("BENCH_r") and f.endswith(".json"))
        for f in reversed(benches):
            try:
                rec = json.load(open(os.path.join(repo, f)))
                rec = rec.get("parsed", rec)
                if "train_device_ms_per_step" in rec:
                    step_ms = rec["train_device_ms_per_step"]
                    break
            except Exception:
                continue

    # --- virtual-mesh weak scaling (correctness) ----------------------------
    tiny = TAPConfig(dim=2, num_blocks=6, min_blocks=6, container_width=6,
                     container_height=6, target_width=6)
    vrows = scaling_report(tiny, device_counts=[1, 2, 4, 8],
                           per_device_batch=16, hidden=32, iters=3)

    arows = analytic_rows(grad_bytes, step_ms)

    lines = [
        "# Scaling report",
        "",
        "Generated by `python scripts/scaling_report.py`. "
        "This machine has ONE tunnel-attached v5e chip, so the >=80% "
        "multi-chip bar (BASELINE.json) is argued from (a) a structural "
        "proof of what the sharded step communicates and (b) an analytic "
        "budget over measured device time — not from wall-clock on "
        "hardware that does not exist here.",
        "",
        "## What the sharded train step communicates (proved, not assumed)",
        "",
        "- `tests/test_parallel.py::test_hlo_collective_audit_train_step`: "
        "the compiled data-parallel train step's ONLY collectives are "
        "float32 gradient/metric all-reduces (it fails if any all-gather, "
        "permute, reduce-scatter, or non-float all-reduce appears).",
        "- `tests/test_aux.py::test_sharded_rollout_compiles_to_zero_"
        "collectives`: the env rollout phase is embarrassingly parallel — "
        "zero collectives in its HLO.",
        "- Per-step traffic is therefore exactly the gradient tree: "
        f"**{n_params:,} params = {grad_bytes / 1e6:.2f} MB** (f32 grads, "
        "hidden=128 actor+critic), independent of batch size.",
        "",
        "## Analytic efficiency lower bound",
        "",
        f"Measured device step time (PERF.md): **{step_ms:.2f} ms** "
        "(batch 4096/chip, 2d-basic). Ring all-reduce, ZERO overlap "
        "assumed (XLA overlaps collectives with backward compute in "
        "practice, so these are lower bounds). Link assumptions: v5e ICI "
        "1,600 Gbps/chip (100 GB/s per direction); DCN 200 Gbps NIC per "
        "8-chip host.",
        "",
        "| devices | fabric | t_comm (ms) | efficiency (lower bound) |",
        "|---|---|---|---|",
    ]
    for r in arows:
        lines.append(f"| {r['devices']} | {r['fabric']} | "
                     f"{r['t_comm_ms']} | {100 * r['efficiency_lower_bound']:.2f}% |")
    lines += [
        "",
        "Every row clears the >=80% bar: the model is ~1 MB while the "
        "per-chip step is milliseconds — TAP training is compute-bound "
        "data parallelism, the regime DP was built for. The binding case "
        "is cross-host DCN "
        f"({arows[2]['t_comm_ms']:.2f} ms vs the {step_ms:.2f} ms step, "
        f"{100 * arows[2]['efficiency_lower_bound']:.1f}% with zero "
        "overlap assumed); larger per-chip batches or any overlap push it "
        "toward the ICI rows.",
        "",
        "## Virtual-mesh weak scaling (correctness witness only)",
        "",
        "The REAL sharded program (shard_map rollout kernel + psum "
        "learner) on 1/2/4/8 virtual CPU devices sharing 2 physical "
        "cores. Wall-clock 'efficiency' here measures host-core "
        "contention, NOT the sharding (8 virtual devices contend for 2 "
        "cores); the column is reported for completeness, the correctness "
        "content is that every mesh size runs the identical program "
        "(mesh-of-1 == mesh-of-8 numerics is asserted separately by "
        "tests/test_parallel.py).",
        "",
        "| devices | batch | steps/s | instances/s | wall-clock 'efficiency' |",
        "|---|---|---|---|---|",
    ]
    for r in vrows:
        lines.append(f"| {r['devices']} | {r['batch']} | "
                     f"{r['train_steps_per_s']} | {r['instances_per_s']} | "
                     f"{r['efficiency']} |")
    lines += [
        "",
        "Multi-host correctness is additionally witnessed by a real "
        "2-OS-process `jax.distributed.initialize` train step "
        "(tests/test_distributed.py, run by the driver in "
        "MULTICHIP_r*.json).",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"out": args.out, "n_params": n_params,
                      "grad_mb": round(grad_bytes / 1e6, 3),
                      "step_ms": step_ms,
                      "analytic": arows, "virtual": vrows}, indent=2))


if __name__ == "__main__":
    main()
