"""CLI, dataset files, and visualization (SURVEY.md §2.1 CLI / dataset /
visualization rows)."""

import json
import os

import numpy as np
import jax
import pytest

from tapnet_tpu.cli import main as cli_main
from tapnet_tpu.config import CONFIGS
from tapnet_tpu.env.sampler import sample_batch
from tapnet_tpu.utils.data import (PackDataset, generate_dataset,
                                   load_config, load_instances,
                                   save_instances)


def test_dataset_roundtrip(tmp_path):
    cfg = CONFIGS["2d-rot"]
    batch = sample_batch(jax.random.key(0), 16, cfg)
    path = str(tmp_path / "ds.npz")
    save_instances(path, batch, cfg)
    loaded = load_instances(path)
    for f in batch._fields:
        assert np.array_equal(np.asarray(getattr(batch, f)),
                              getattr(loaded, f)), f
    assert load_config(path) == cfg


def test_pack_dataset_iterates(tmp_path):
    cfg = CONFIGS["2d-basic"]
    path = generate_dataset(str(tmp_path / "ds.npz"), cfg, num=20, seed=1,
                            batch_size=8)
    ds = PackDataset(path, batch_size=8, shuffle_seed=0)
    batches = list(ds)
    assert len(ds) == 2 and len(batches) == 2
    assert batches[0].dims.shape == (8, cfg.num_blocks, 3)


@pytest.mark.parametrize("name", ["2d-rot", "3d-basic"])
def test_render_writes_png(tmp_path, name):
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env.sampler import sample_instance
    from tapnet_tpu.utils.viz import render
    cfg = CONFIGS[name]
    key = jax.random.key(0)
    inst = sample_instance(key, cfg)
    state, actions, reward = E.rollout(inst, key, cfg, policy="first")
    out = render(inst, state, cfg, str(tmp_path / "out.png"))
    assert os.path.getsize(out) > 1000


def test_cli_generate_and_eval_paths(tmp_path, capsys):
    rc = cli_main(["generate", "--config", "2d-basic", "--num", "8",
                   "--out", str(tmp_path / "d.npz")])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(rec["path"])

    rc = cli_main(["eval", "--config", "2d-basic",
                   "--ckpt-dir", str(tmp_path / "none")])
    assert rc == 1  # clean failure on missing checkpoint


def test_cli_train_debug_flags(tmp_path):
    """SURVEY.md §5 sanitizer row, wired through the CLI (VERDICT r3 item 8):
    --deterministic (bit-identical step repeat), --nan-checks, --trace-dir
    (profiler trace of epoch-0 steady-state steps)."""
    trace_dir = tmp_path / "trace"
    rc = cli_main(["train", "--config", "2d-basic", "--epochs", "1",
                   "--steps-per-epoch", "4", "--batch", "8", "--hidden",
                   "32", "--valid-batch", "8",
                   "--metrics", str(tmp_path / "m.jsonl"),
                   "--deterministic", "--trace-dir", str(trace_dir)])
    assert rc == 0
    lines = [json.loads(l) for l in
             (tmp_path / "m.jsonl").read_text().splitlines()]
    assert any(r.get("event") == "deterministic-check-passed" for r in lines)
    import glob
    assert glob.glob(str(trace_dir / "**" / "*.xplane.pb"), recursive=True)


def test_cli_train_nan_checks_flag(tmp_path):
    rc = cli_main(["train", "--config", "2d-basic", "--epochs", "1",
                   "--steps-per-epoch", "2", "--batch", "8", "--hidden",
                   "32", "--valid-batch", "8", "--nan-checks"])
    assert rc == 0
    import jax
    assert not jax.config.jax_debug_nans  # scope restored after the run


def test_cli_flag_config_construction():
    from tapnet_tpu.cli import build_config
    import argparse
    ns = argparse.Namespace(
        config=None, obj_dim=3, num_blocks=12, min_blocks=0,
        container_width=6, container_depth=6, container_height=6,
        target_width=0, target_depth=0, target_height=0, num_containers=2,
        allow_rot=True, window=0, reward_type="C+P-lb-hard")
    cfg = build_config(ns)
    assert cfg.dim == 3 and cfg.num_containers == 2
    assert cfg.reward_terms == ("C", "P")
    assert cfg.placement_variant == "hard"
    assert cfg.min_blocks == 12


def test_render_3d_blocks_and_gif(tmp_path):
    """Reference-grade 3D viz: block-level voxel render + animated GIF."""
    import jax
    from tapnet_tpu.config import CONFIGS
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env.sampler import sample_instance
    from tapnet_tpu.utils.viz import render_3d_blocks, render_animation

    cfg = CONFIGS["3d-basic"]
    key = jax.random.key(2)
    inst = sample_instance(key, cfg)
    state, actions, _ = E.rollout(inst, key, cfg, policy="first")
    png = render_3d_blocks(inst, state, cfg, str(tmp_path / "b.png"))
    assert os.path.getsize(png) > 10_000
    gif = render_animation(inst, actions, cfg, str(tmp_path / "seq.gif"))
    assert os.path.getsize(gif) > 10_000
    with open(gif, "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")


def test_render_sequence_3d(tmp_path):
    import jax
    from tapnet_tpu.config import CONFIGS
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env.sampler import sample_instance
    from tapnet_tpu.utils.viz import render_sequence

    cfg = CONFIGS["3d-basic"]
    key = jax.random.key(4)
    inst = sample_instance(key, cfg)
    _, actions, _ = E.rollout(inst, key, cfg, policy="first")
    out = render_sequence(inst, actions, cfg, str(tmp_path / "seq3d.png"))
    assert os.path.getsize(out) > 10_000
