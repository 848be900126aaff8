"""End-to-end multimodal flow: CACNF/LCF train + inference through the CLI
functions, with a Kinetics-style R3D checkpoint init.

Toy geometry satisfying the reference's token/pos-table coupling
(appearance tokens == appearance_num_frames): 4 frames @ 64px → R3D-50 emits
1×2×2 = 4 tokens.
"""

import logging
import os

import numpy as np
import pytest
import torch

from stlt_tpu.parser import build_parser
from tests.fixtures import make_something_fixture, make_video_hdf5

FRAMES, SPATIAL = 4, 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("mm"))
    paths, videos, labels, sizes = make_something_fixture(tmpdir, num_videos=4)
    videos_path = make_video_hdf5(tmpdir, sizes, num_frames=10)
    # Kinetics-style checkpoint: {"state_dict": raw R3D names}
    from tests.torch_ref_appearance import TorchR3D10

    torch.manual_seed(3)
    r3d = TorchR3D10()
    ckpt_path = os.path.join(tmpdir, "r3d50.pth")
    torch.save({"state_dict": r3d.state_dict()}, ckpt_path)
    return tmpdir, paths, videos_path, ckpt_path


def make_args(tmpdir, paths, videos_path, ckpt_path, model_name):
    argv = [
        "--dataset_name", "something",
        "--dataset_type", "multimodal",
        "--model_name", model_name,
        "--train_dataset_path", paths["dataset_path"],
        "--val_dataset_path", paths["dataset_path"],
        "--test_dataset_path", paths["dataset_path"],
        "--labels_path", paths["labels_path"],
        "--videoid2size_path", paths["videoid2size_path"],
        "--videos_path", videos_path,
        "--resnet_model_path", ckpt_path,
        "--layout_num_frames", "4",
        "--appearance_num_frames", str(FRAMES),
        "--batch_size", "2",
        "--epochs", "1",
        "--warmup_epochs", "1",
        "--hidden_size", "32",
        "--num_attention_heads", "4",
        "--num_spatial_layers", "1",
        "--num_temporal_layers", "1",
        "--num_appearance_layers", "1",
        "--num_fusion_layers", "1",
        "--resnet_depth", "10",
        "--model_parallel", "1",
        "--hidden_dropout_prob", "0.0",
        "--save_model_path", os.path.join(tmpdir, f"{model_name}.msgpack"),
        "--checkpoint_path", os.path.join(tmpdir, f"{model_name}.msgpack"),
    ]
    args = build_parser("test").parse_args(argv)
    # toy spatial size: patch the data configs via build_data_config kwargs
    return args


def _patch_spatial(monkeypatch):
    import stlt_tpu.inference as I
    import stlt_tpu.train as T

    orig = T.build_data_config

    def patched(args, *, train, dataset_path):
        cfg = orig(args, train=train, dataset_path=dataset_path)
        cfg.spatial_size = SPATIAL
        return cfg

    # inference imports build_data_config by value — patch both bindings
    monkeypatch.setattr(T, "build_data_config", patched)
    monkeypatch.setattr(I, "build_data_config", patched)


@pytest.mark.parametrize("model_name", ["cacnf", "lcf"])
def test_multimodal_train_and_inference(setup, monkeypatch, model_name):
    from stlt_tpu.inference import inference
    from stlt_tpu.train import train

    tmpdir, paths, videos_path, ckpt_path = setup
    _patch_spatial(monkeypatch)
    args = make_args(tmpdir, paths, videos_path, ckpt_path, model_name)
    train(args)
    assert os.path.exists(args.save_model_path)
    metrics = inference(args)
    if model_name == "cacnf":
        assert {
            "stlt_top1_accuracy", "resnet3d_top1_accuracy",
            "caf_top1_accuracy", "ensemble_top1_accuracy",
        } <= set(metrics)
    else:
        assert "lcf_top1_accuracy" in metrics

