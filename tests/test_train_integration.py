"""End-to-end integration: train CLI flow → best checkpoint → inference CLI
flow, on a synthetic something dataset, over a 4×2 (data×model) CPU mesh.

Exercises the full reference-equivalent pipeline (SURVEY.md §3.1/§3.2) plus
the TPU-native parallel path (DP gradient all-reduce + TP sharding via GSPMD).
"""

import os

import numpy as np
import pytest

from stlt_tpu.parser import build_parser
from tests.fixtures import make_something_fixture


def make_args(tmpdir, paths, **overrides):
    argv = [
        "--dataset_name", "something",
        "--dataset_type", "layout",
        "--model_name", "stlt",
        "--train_dataset_path", paths["dataset_path"],
        "--val_dataset_path", paths["dataset_path"],
        "--test_dataset_path", paths["dataset_path"],
        "--labels_path", paths["labels_path"],
        "--videoid2size_path", paths["videoid2size_path"],
        "--layout_num_frames", "8",
        "--batch_size", "4",
        "--epochs", "2",
        "--warmup_epochs", "1",
        "--hidden_size", "32",
        "--num_attention_heads", "4",
        "--num_spatial_layers", "1",
        "--num_temporal_layers", "1",
        "--save_model_path", os.path.join(tmpdir, "best.msgpack"),
        "--save_backbone_path", os.path.join(tmpdir, "backbone.msgpack"),
        "--checkpoint_path", os.path.join(tmpdir, "best.msgpack"),
        "--learning_rate", "1e-3",
        "--model_parallel", "2",
    ]
    for k, v in overrides.items():
        argv += [f"--{k}", str(v)]
    return build_parser("test").parse_args(argv)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from stlt_tpu.train import train

    tmpdir = str(tmp_path_factory.mktemp("e2e"))
    paths, videos, labels, _ = make_something_fixture(tmpdir, num_videos=8)
    args = make_args(tmpdir, paths)
    state = train(args)
    return tmpdir, paths, args, state


def test_train_produces_checkpoints(trained):
    tmpdir, paths, args, state = trained
    assert os.path.exists(args.save_model_path)
    assert os.path.exists(args.save_backbone_path)
    # 2 epochs × (8 // 4) batches
    assert int(np.asarray(state.step)) == 4


def test_train_result_epoch_records(trained):
    """train() returns machine-readable per-epoch telemetry (the surface
    bench.py consumes — no log scraping anywhere)."""
    *_, result = trained
    assert len(result.epochs) == 2
    for n, rec in enumerate(result.epochs):
        assert rec["epoch"] == n + 1
        assert rec["steps"] == 2  # 8 videos // batch 4
        assert rec["train_seconds"] > 0
        assert rec["eval_seconds"] > 0
        assert np.isfinite(rec["train_loss"])
        assert "stlt_top1_accuracy" in rec["metrics"]
        assert isinstance(rec["is_best"], bool)
    assert result.epochs[0]["is_best"]  # first epoch always beats 0.0


def test_train_loss_decreases_over_longer_run(tmp_path):
    """Overfit 4 clips for several epochs; loss must drop significantly."""
    from stlt_tpu.train import train

    tmpdir = str(tmp_path)
    paths, *_ = make_something_fixture(
        tmpdir, num_videos=8, seed=3, constant_frames=True
    )
    args = make_args(
        tmpdir, paths,
        epochs=30, learning_rate="3e-3", model_parallel=1, hidden_dropout_prob="0.0",
    )

    losses = [rec["train_loss"] for rec in train(args).epochs]
    assert len(losses) == 30
    # stochastic frame re-sampling + dropout make per-epoch loss noisy;
    # compare the mean of the first vs last five epochs
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.85, losses


def test_inference_cli_flow(trained):
    from stlt_tpu.inference import inference

    tmpdir, paths, args, _ = trained
    metrics = inference(args)
    assert set(metrics) == {"stlt_top1_accuracy", "stlt_top5_accuracy"}
    assert 0.0 <= metrics["stlt_top1_accuracy"] <= 1.0
    # 4 labels only → top5 must be 1.0 (sanity that valid-mask math is right)
    assert metrics["stlt_top5_accuracy"] == 1.0


def test_inference_loads_torch_checkpoint(trained, tmp_path):
    """The released reference checkpoints are torch .pt state_dicts — verify
    the CLI path converts them on the fly."""
    import torch

    from stlt_tpu.inference import inference
    from tests.torch_ref import TorchStlt
    from stlt_tpu.configs import StltModelConfig

    tmpdir, paths, args, _ = trained
    cfg = StltModelConfig(
        num_classes=4,
        unique_categories=4,
        hidden_size=32,
        num_attention_heads=4,
        num_spatial_layers=1,
        num_temporal_layers=1,
    )
    torch.manual_seed(1)
    pt_path = os.path.join(str(tmp_path), "ref.pt")
    torch.save(TorchStlt(cfg).state_dict(), pt_path)
    args.checkpoint_path = pt_path
    metrics = inference(args)
    assert 0.0 <= metrics["stlt_top1_accuracy"] <= 1.0


def test_predict_cli(trained, tmp_path):
    """Serving surface: per-clip top-k predictions as JSON lines."""
    import json

    from stlt_tpu.predict import predict

    tmpdir, paths, args, _ = trained
    args.top_k = 2
    args.output = str(tmp_path / "preds.jsonl")
    rows = predict(args)
    assert len(rows) == 8  # all clips, no padding rows
    lines = [json.loads(l) for l in open(args.output)]
    assert len(lines) == len(rows)
    for row in lines:
        assert len(row["top_k"]) == 2
        assert 0.0 <= row["top_k"][0]["score"] <= 1.0
        assert row["top_k"][0]["score"] >= row["top_k"][1]["score"]
    # every dataset clip appears exactly once, in order
    ids = [r["video_id"] for r in lines]
    assert len(set(ids)) == len(ids)


def test_train_with_context_parallel(tmp_path):
    """Full CLI with sequence parallelism: frames_multiple pads the frame
    axis so the context mesh axis divides it."""
    from stlt_tpu.train import train

    tmpdir = str(tmp_path)
    paths, *_ = make_something_fixture(tmpdir, num_videos=4, seed=8)
    args = make_args(
        tmpdir, paths,
        epochs=1, layout_num_frames=7, batch_size=2,
        model_parallel=2, context_parallel=2,
    )
    state = train(args)
    assert int(np.asarray(state.step)) == 2
    assert os.path.exists(args.save_model_path)
