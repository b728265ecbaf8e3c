"""Command-line driver: train / eval / generate / render / bench.

The reference's user surface is `python main.py` with argparse flags
(SURVEY.md §1 L5: --obj_dim, --allow_rot, --reward_type, container sizes,
train/valid sizes, lr, checkpoints — unverified names). This CLI keeps those
flag names for familiarity while mapping onto the TPU-native stack. Run as
`python -m tapnet_tpu.cli <task> ...`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def build_config(args) -> "TAPConfig":
    from tapnet_tpu.config import CONFIGS, TAPConfig

    if args.config:
        cfg = CONFIGS[args.config]
        overrides = {}
        for field in ("reward_type",):
            v = getattr(args, field, None)
            if v is not None:
                overrides[field] = v
        return dataclasses.replace(cfg, **overrides) if overrides else cfg
    dim = args.obj_dim
    depth = args.container_depth if dim == 3 else 1
    return TAPConfig(
        dim=dim,
        num_blocks=args.num_blocks,
        min_blocks=args.min_blocks or args.num_blocks,
        container_width=args.container_width,
        container_depth=depth,
        container_height=args.container_height,
        target_width=args.target_width or args.container_width,
        target_depth=args.target_depth or depth,
        target_height=args.target_height,
        num_containers=args.num_containers,
        allow_rot=args.allow_rot,
        window=args.window,
        reward_type=args.reward_type or "C+P+S-lb-soft",
    )


def add_config_flags(p: argparse.ArgumentParser):
    from tapnet_tpu.config import CONFIGS
    p.add_argument("--config", choices=list(CONFIGS),
                   help="named driver config (overrides geometry flags)")
    p.add_argument("--obj_dim", type=int, default=2, choices=(2, 3))
    p.add_argument("--num-blocks", type=int, default=10)
    p.add_argument("--min-blocks", type=int, default=0,
                   help="0 => fixed block count (= --num-blocks)")
    p.add_argument("--container-width", type=int, default=10)
    p.add_argument("--container-depth", type=int, default=8)
    p.add_argument("--container-height", type=int, default=10)
    p.add_argument("--target-width", type=int, default=0)
    p.add_argument("--target-depth", type=int, default=0)
    p.add_argument("--target-height", type=int, default=0,
                   help="0 => unbounded")
    p.add_argument("--num-containers", type=int, default=1)
    p.add_argument("--allow_rot", action="store_true")
    p.add_argument("--window", type=int, default=0)
    p.add_argument("--reward_type", default=None,
                   help="e.g. C+P+S-lb-soft / C+P-lb-hard")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="tapnet_tpu", description=__doc__)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default=None,
                        help="force a JAX platform (cpu useful off-TPU)")
    sub = parser.add_subparsers(dest="task", required=True)

    p = sub.add_parser("train", help="REINFORCE training")
    add_config_flags(p)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--steps-per-epoch", type=int, default=100)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--valid-batch", type=int, default=256)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--metrics", default=None, help="metrics JSONL path")
    p.add_argument("--tb-dir", default=None, dest="tb_dir",
                   help="also write TensorBoard scalar summaries here")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--mixed-p2d", type=float, default=0.0,
                   help="P(instance is flat/2D) for mixed 2D/3D batches "
                        "(driver config 5; 3D envs only)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   dest="steps_per_call",
                   help="optimizer steps per dispatch (lax.scan group; "
                        "8 amortizes host dispatch on TPU)")
    p.add_argument("--deterministic", action="store_true",
                   help="assert one train step repeats bit-identically "
                        "before training (SURVEY.md §5 sanitizer row)")
    p.add_argument("--nan-checks", action="store_true", dest="nan_checks",
                   help="enable jax debug-nans for the whole run")
    p.add_argument("--trace-dir", default=None, dest="trace_dir",
                   help="capture a jax.profiler trace of 3 steady-state "
                        "steps in epoch 0 (view with scripts/parse_xplane.py)")

    p = sub.add_parser("eval", help="greedy evaluation of a checkpoint")
    add_config_flags(p)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--seed", type=int, default=10_000)
    p.add_argument("--baselines", action="store_true",
                   help="also score the random/first heuristics on the "
                        "same held-out instances")
    p.add_argument("--mixed-p2d", type=float, default=0.0,
                   help="evaluate on a mixed 2D/3D instance stream")

    p = sub.add_parser("generate", help="write an instance dataset file")
    add_config_flags(p)
    p.add_argument("--num", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)

    p = sub.add_parser("render", help="render a heuristic rollout to PNG")
    add_config_flags(p)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--sequence", action="store_true",
                   help="render the step-by-step packing sequence (2D or 3D;"
                        " a .gif output path produces an animation)")

    p = sub.add_parser("bench", help="env-steps/s benchmark")
    add_config_flags(p)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--iters", type=int, default=10)

    args = parser.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = build_config(args)

    if args.task == "train":
        from tapnet_tpu.train import TrainLoopConfig, train
        loop = TrainLoopConfig(
            epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
            batch=args.batch, valid_batch=args.valid_batch,
            hidden=args.hidden, lr=args.lr, seed=args.seed,
            ckpt_dir=args.ckpt_dir, metrics_path=args.metrics,
            mixed_p2d=args.mixed_p2d, steps_per_call=args.steps_per_call,
            tb_dir=args.tb_dir, trace_dir=args.trace_dir,
            deterministic=args.deterministic, nan_checks=args.nan_checks)
        mesh = None
        if args.mesh:
            from tapnet_tpu.parallel import data_mesh
            mesh = data_mesh()
        train(cfg, loop, resume=not args.no_resume, mesh=mesh)
        return 0

    if args.task == "eval":
        from tapnet_tpu.train import TrainLoopConfig
        from tapnet_tpu.train.reinforce import init_train_state
        from tapnet_tpu.train import checkpoints as ckpt
        from tapnet_tpu.train.trainer import evaluate
        ts = init_train_state(jax.random.key(0), cfg, args.hidden)
        path = ckpt.latest_checkpoint(args.ckpt_dir)
        if not path:
            print(f"no checkpoint under {args.ckpt_dir}", file=sys.stderr)
            return 1
        ts = ckpt.restore_checkpoint(path, ts)
        loop = TrainLoopConfig(hidden=args.hidden, valid_batch=args.batch,
                               valid_seed=args.seed,
                               mixed_p2d=args.mixed_p2d)
        out = evaluate(ts.params, cfg, loop, baselines=args.baselines)
        print(json.dumps({"ckpt": path, "step": int(ts.step),
                          **{k: float(v) for k, v in out.items()}}))
        return 0

    if args.task == "generate":
        from tapnet_tpu.utils.data import generate_dataset
        path = generate_dataset(args.out, cfg, args.num, args.seed)
        print(json.dumps({"path": path, "num": args.num}))
        return 0

    if args.task == "render":
        from tapnet_tpu.env import core as E
        from tapnet_tpu.env.sampler import sample_instance
        from tapnet_tpu.utils.viz import (render, render_animation,
                                          render_sequence)
        key = jax.random.key(args.seed)
        inst = sample_instance(key, cfg)
        state, actions, reward = E.rollout(inst, key, cfg, policy="random")
        if args.sequence and args.out.endswith(".gif"):
            out = render_animation(inst, actions, cfg, args.out)
        elif args.sequence:
            out = render_sequence(inst, actions, cfg, args.out)
        else:
            out = render(inst, state, cfg, args.out,
                         title=f"reward={float(reward):.3f}")
        print(json.dumps({"path": out, "reward": float(reward)}))
        return 0

    if args.task == "bench":
        from tapnet_tpu.benchmarks import measure_env_steps_per_s
        v = measure_env_steps_per_s(cfg, args.batch, args.iters)
        print(json.dumps({"env_steps_per_s": round(v, 1),
                          "batch": args.batch}))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
