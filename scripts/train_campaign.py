"""Train all five driver configs on the TPU and score vs heuristics.

Sequential (one TPU process at a time); per config:
  - REINFORCE training with checkpoints (ckpts/<name>) and JSONL metrics
    (runs/<name>.jsonl),
  - greedy eval on the held-out stream with the random/first heuristic
    baselines on the SAME instances -> runs/<name>_eval.json.

Usage: python scripts/train_campaign.py [name ...] (default: all five)
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Round-5 plans run at BENCH conditions (batch 4096, 8 steps/dispatch —
# VERDICT r4 item 4: the production campaign must exercise the machinery
# the bench measures); earlier checkpoints resume seamlessly, so totals
# below EXTEND the committed runs on round-5 code rather than discarding
# them. eval_best_of=16 additionally reports the best-of-K sampled decode
# (VERDICT r4 item 5) every epoch and in the final eval artifact.
PLANS = {
    "2d-basic": dict(epochs=40, steps_per_epoch=500, batch=4096),
    "2d-rot": dict(epochs=40, steps_per_epoch=500, batch=4096),
    "3d-basic": dict(epochs=40, steps_per_epoch=500, batch=4096),
    # the chunked (rematerialized) replay keeps the 50-block decode within
    # HBM at batch 4096 (VERDICT r2 item 4)
    "2d-rolling": dict(epochs=50, steps_per_epoch=500, batch=4096),
    # driver config 5 trains on the mixed 2D/3D instance stream
    # (BASELINE.json: "Multi-target-container TAP ... and mixed 2D/3D batch")
    "multi-container": dict(epochs=40, steps_per_epoch=500, batch=4096,
                            mixed_p2d=0.5),
    # config 6: capped containers — spillover mandatory, the container-
    # selection axis carries reward; doubled horizon (VERDICT r4 item 5:
    # the thinnest learned margin got the most extra steps)
    "multi-container-capped": dict(epochs=80, steps_per_epoch=500,
                                   batch=4096),
}


def main():
    names = sys.argv[1:] or list(PLANS)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tapnet_tpu.config import CONFIGS
    from tapnet_tpu.train import TrainLoopConfig, train
    from tapnet_tpu.train.trainer import evaluate

    for name in names:
        cfg = CONFIGS[name]
        plan = PLANS[name]
        loop = TrainLoopConfig(
            epochs=plan["epochs"], steps_per_epoch=plan["steps_per_epoch"],
            batch=plan["batch"], valid_batch=512, hidden=128, lr=5e-4,
            ckpt_dir=os.path.join(REPO, "ckpts", name),
            metrics_path=os.path.join(REPO, "runs", f"{name}.jsonl"),
            mixed_p2d=plan.get("mixed_p2d", 0.0),
            steps_per_call=plan.get("steps_per_call", 8),
            eval_best_of=16)
        print(f"=== {name}: {plan}", flush=True)
        ts = train(cfg, loop, resume=True)
        out = evaluate(ts.params, cfg, loop, baselines=True)
        result = {"config": name, "step": int(ts.step),
                  **{k: float(v) for k, v in out.items()}}
        with open(os.path.join(REPO, "runs", f"{name}_eval.json"), "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
        print(f"=== {name} eval: {result}", flush=True)


if __name__ == "__main__":
    main()
