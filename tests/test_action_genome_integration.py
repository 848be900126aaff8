"""Action Genome end-to-end: STLT with scores + BCE loss + Charades mAP
(reference BASELINE config #2), plus Orbax resume."""

import os

import numpy as np
import pytest

from stlt_tpu.parser import build_parser
from tests.fixtures import make_action_genome_fixture


def make_args(tmpdir, paths, **overrides):
    argv = [
        "--dataset_name", "action_genome",
        "--dataset_type", "layout",
        "--model_name", "stlt",
        "--train_dataset_path", paths["dataset_path"],
        "--val_dataset_path", paths["dataset_path"],
        "--test_dataset_path", paths["dataset_path"],
        "--labels_path", paths["labels_path"],
        "--videoid2size_path", paths["videoid2size_path"],
        "--layout_num_frames", "6",
        "--batch_size", "2",
        "--epochs", "2",
        "--warmup_epochs", "1",
        "--hidden_size", "32",
        "--num_attention_heads", "4",
        "--num_spatial_layers", "1",
        "--num_temporal_layers", "1",
        "--save_model_path", os.path.join(tmpdir, "ag.msgpack"),
        "--checkpoint_path", os.path.join(tmpdir, "ag.msgpack"),
    ]
    for k, v in overrides.items():
        argv += [f"--{k}", str(v)]
    return build_parser("test").parse_args(argv)


def test_action_genome_train_inference(tmp_path):
    from stlt_tpu.inference import inference
    from stlt_tpu.train import train

    tmpdir = str(tmp_path)
    paths, videos, labels, _ = make_action_genome_fixture(tmpdir)
    args = make_args(tmpdir, paths)
    state = train(args)
    # score embeddings must exist in AG params (scores kept in batches)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(state.params)
    assert any("score_embeddings" in "/".join(p) for p in flat)
    metrics = inference(args)
    assert set(metrics) == {"map"}
    assert 0.0 <= metrics["map"] <= 1.0 or np.isnan(metrics["map"])


def test_orbax_resume(tmp_path):
    from stlt_tpu.train import train

    tmpdir = str(tmp_path)
    paths, *_ = make_action_genome_fixture(tmpdir)
    resume_dir = os.path.join(tmpdir, "ckpts")
    args = make_args(tmpdir, paths, epochs=1, resume_dir=resume_dir)
    state1 = train(args)
    step1 = int(np.asarray(state1.step))
    assert step1 > 0
    # second run with more epochs resumes from the saved step
    args2 = make_args(tmpdir, paths, epochs=2, resume_dir=resume_dir)
    state2 = train(args2)
    assert int(np.asarray(state2.step)) == 2 * step1
