"""The paper's headline recipe end-to-end: pretrain a backbone, save it,
reload it frozen into a second training run (reference README.md:50-69,
models.py:170-176 for STLT; models.py:509-512 for CACNF — where the
reference's own CACNF path is a latent AttributeError, see README
"reference divergences").

Asserts the frozen backbone is BIT-IDENTICAL after the second training run
(the optimizer masks it to zero-updates) while the heads did train, and the
trained model runs inference.
"""

import os

import numpy as np
import pytest
from flax import serialization

from stlt_tpu.parser import build_parser
from tests.fixtures import make_something_fixture


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def _stlt_args(tmpdir, paths, tag, **overrides):
    argv = [
        "--dataset_name", "something",
        "--dataset_type", "layout",
        "--model_name", "stlt",
        "--train_dataset_path", paths["dataset_path"],
        "--val_dataset_path", paths["dataset_path"],
        "--test_dataset_path", paths["dataset_path"],
        "--labels_path", paths["labels_path"],
        "--videoid2size_path", paths["videoid2size_path"],
        "--layout_num_frames", "6",
        "--batch_size", "4",
        "--epochs", "2",
        "--warmup_epochs", "1",
        "--hidden_size", "32",
        "--num_attention_heads", "4",
        "--num_spatial_layers", "1",
        "--num_temporal_layers", "1",
        "--learning_rate", "2e-3",
        "--save_model_path", os.path.join(tmpdir, f"model_{tag}.msgpack"),
        "--checkpoint_path", os.path.join(tmpdir, f"model_{tag}.msgpack"),
    ]
    for k, v in overrides.items():
        if v is None:
            argv += [f"--{k}"]
        else:
            argv += [f"--{k}", str(v)]
    return build_parser("test").parse_args(argv)


def test_stlt_backbone_pretrain_then_frozen_finetune(tmp_path):
    from stlt_tpu.inference import inference
    from stlt_tpu.train import train

    tmpdir = str(tmp_path)
    paths, *_ = make_something_fixture(tmpdir, num_videos=8, seed=11)
    backbone_path = os.path.join(tmpdir, "stlt_backbone.msgpack")

    # Stage 1: pretrain + export the backbone (reference train.py:151-152).
    args1 = _stlt_args(tmpdir, paths, "pre", save_backbone_path=backbone_path)
    train(args1)
    assert os.path.exists(backbone_path)
    with open(backbone_path, "rb") as f:
        saved_backbone = _flat(serialization.msgpack_restore(f.read()))

    # Stage 2: reload frozen (reference StltBackbone.from_pretrained,
    # models.py:130-134 + the freeze gate at :170-176).
    args2 = _stlt_args(
        tmpdir, paths, "fine",
        load_backbone_path=backbone_path, freeze_backbone=None,
    )
    state = train(args2)
    final = _flat(state.params)

    head_changed = False
    for key, value in final.items():
        if key.startswith("backbone/"):
            np.testing.assert_array_equal(
                value, saved_backbone[key.removeprefix("backbone/")],
                err_msg=f"frozen backbone moved: {key}",
            )
        elif key.startswith("prediction_head/"):
            head_changed = True
    assert head_changed

    metrics = inference(args2)
    assert np.isfinite(metrics["stlt_top1_accuracy"])


def test_cacnf_backbone_pretrain_then_frozen_finetune(tmp_path, monkeypatch):
    """The fusion variant — the path that is BROKEN in the reference
    (models.py:509-512 calls a from_pretrained that does not exist); here it
    works: the whole CrossAttentionFusionBackbone reloads and freezes."""
    import torch

    from stlt_tpu.train import train
    from tests.fixtures import make_video_hdf5
    from tests.test_multimodal_integration import _patch_spatial, make_args
    from tests.torch_ref_appearance import TorchR3D10

    tmpdir = str(tmp_path)
    paths, videos, labels, sizes = make_something_fixture(tmpdir, num_videos=4)
    videos_path = make_video_hdf5(tmpdir, sizes, num_frames=10)
    torch.manual_seed(3)
    ckpt_path = os.path.join(tmpdir, "r3d50.pth")
    torch.save({"state_dict": TorchR3D10().state_dict()}, ckpt_path)
    _patch_spatial(monkeypatch)
    backbone_path = os.path.join(tmpdir, "cacnf_backbone.msgpack")

    args1 = make_args(tmpdir, paths, videos_path, ckpt_path, "cacnf")
    args1.save_backbone_path = backbone_path
    train(args1)
    assert os.path.exists(backbone_path)
    with open(backbone_path, "rb") as f:
        saved_backbone = _flat(serialization.msgpack_restore(f.read()))

    args2 = make_args(tmpdir, paths, videos_path, ckpt_path, "cacnf")
    args2.load_backbone_path = backbone_path
    args2.freeze_backbone = True
    args2.save_model_path = os.path.join(tmpdir, "cacnf_fine.msgpack")
    state = train(args2)
    final = _flat(state.params)

    n_backbone = 0
    for key, value in final.items():
        if key.startswith("backbone/"):
            n_backbone += 1
            np.testing.assert_array_equal(
                value, saved_backbone[key.removeprefix("backbone/")],
                err_msg=f"frozen backbone moved: {key}",
            )
    assert n_backbone > 0
    for head in ("layout_classifier", "appearance_classifier", "fusion_classifier"):
        assert any(k.startswith(f"{head}/") for k in final), final.keys()
