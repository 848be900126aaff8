"""Offline data-prep tools (tools/ = reference L0 CLIs, SURVEY.md §2.5)."""

import io
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(name, *args):
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", name), *args],
        capture_output=True, text=True, env=env, check=True,
    )


def test_create_something_datasets(tmp_path):
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    # two annotation chunks in Something-Else format
    chunk1 = {
        "v1": [
            {"labels": [
                {"category": "hand left", "box2d": {"x1": 1, "y1": 2, "x2": 30, "y2": 40}},
                {"category": "cup", "box2d": {"x1": 5, "y1": 6, "x2": 50, "y2": 60}},
            ]},
            {"labels": []},
        ]
    }
    chunk2 = {"v2": [{"labels": [
        {"category": "bowl", "box2d": {"x1": 0, "y1": 0, "x2": 9, "y2": 9}},
    ]}]}
    json.dump(chunk1, open(ann_dir / "anns_1.json", "w"))
    json.dump(chunk2, open(ann_dir / "anns_10.json", "w"))
    train = [{"id": "v1", "template": "Doing [something]"}]
    val = [{"id": "v2", "template": "Other"}, {"id": "missing", "template": "X"}]
    json.dump(train, open(tmp_path / "train.json", "w"))
    json.dump(val, open(tmp_path / "val.json", "w"))

    run_tool(
        "create_something_datasets.py",
        "--train_data_path", str(tmp_path / "train.json"),
        "--val_data_path", str(tmp_path / "val.json"),
        "--annotations_path", str(ann_dir),
        "--save_data_path", str(tmp_path),
    )
    out_train = json.load(open(tmp_path / "train_dataset.json"))
    out_val = json.load(open(tmp_path / "val_dataset.json"))
    assert len(out_train) == 1 and len(out_val) == 1  # missing id dropped
    objs = out_train[0]["frames"][0]["frame_objects"]
    assert objs[0]["category"] == "hand" and objs[1]["category"] == "object"
    assert all(o["score"] == 1.0 for o in objs)
    assert out_train[0]["frames"][1]["frame_objects"] == []


def test_create_action_genome_datasets(tmp_path):
    ag = tmp_path / "ag"
    ag.mkdir()
    object_anno = {
        "ABC123.mp4/000001.png": [
            {"visible": True, "class": "chair", "bbox": (10, 20, 30, 40)},
            {"visible": False, "class": "book", "bbox": (1, 2, 3, 4)},
        ],
        "ABC123.mp4/000002.png": [
            {"visible": False, "class": "book", "bbox": (1, 2, 3, 4)},
        ],
    }
    person_anno = {
        "ABC123.mp4/000001.png": {
            "bbox": np.array([[5.0, 6.0, 50.0, 60.0]]),
            "bbox_score": np.array([0.9]),
        },
        "ABC123.mp4/000002.png": {"bbox": np.zeros((0, 4)), "bbox_score": np.zeros(0)},
    }
    pickle.dump(object_anno, open(ag / "object_bbox_and_relationship.pkl", "wb"))
    pickle.dump(person_anno, open(ag / "person_bbox.pkl", "wb"))
    charades = tmp_path / "charades"
    charades.mkdir()
    with open(charades / "Charades_v1_train.csv", "w") as f:
        f.write("id,actions\nABC123,c092 11.9 21.2;c147 0.0 12.6\n")
    with open(charades / "Charades_v1_test.csv", "w") as f:
        f.write("id,actions\nZZZ999,c001 0 1\n")

    run_tool(
        "create_action_genome_datasets.py",
        "--action_genome_path", str(ag),
        "--charades_path", str(charades),
        "--save_datasets_path", str(tmp_path),
    )
    full = json.load(open(tmp_path / "full_dataset.json"))
    train = json.load(open(tmp_path / "train_dataset.json"))
    val = json.load(open(tmp_path / "val_dataset.json"))
    assert len(full) == 1 and len(train) == 1 and len(val) == 0
    entry = train[0]
    assert entry["actions"] == ["c092", "c147"]
    # frame 2 had no visible objects nor person → dropped
    assert len(entry["frames"]) == 1
    objs = entry["frames"][0]["frame_objects"]
    assert [o["category"] for o in objs] == ["chair", "person"]
    # xywh → xyxy
    assert (objs[0]["x2"], objs[0]["y2"]) == (40, 60)
    assert objs[1]["score"] == pytest.approx(0.9)


def test_frames2hdf5_roundtrip(tmp_path):
    from PIL import Image

    frames_dir = tmp_path / "frames" / "vidA"
    frames_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    imgs = []
    for i in range(3):
        arr = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(frames_dir / f"{i}.jpg")
        imgs.append(arr)
    json.dump({"vidA": [32, 24]}, open(tmp_path / "sizes.json", "w"))
    h5_path = tmp_path / "videos.h5"
    run_tool(
        "frames2hdf5.py",
        "--videoid2size_path", str(tmp_path / "sizes.json"),
        "--pil_images_path", str(tmp_path / "frames"),
        "--save_hdf5_path", str(h5_path),
    )
    # idempotent second run
    run_tool(
        "frames2hdf5.py",
        "--videoid2size_path", str(tmp_path / "sizes.json"),
        "--pil_images_path", str(tmp_path / "frames"),
        "--save_hdf5_path", str(h5_path),
    )
    import h5py

    with h5py.File(h5_path, "r") as f:
        assert set(f.keys()) == {"vidA"}
        assert set(f["vidA"].keys()) == {"0", "1", "2"}
        decoded = Image.open(io.BytesIO(np.asarray(f["vidA"]["1"]).tobytes()))
        assert decoded.size == (32, 24)


def test_dump_features(tmp_path):
    import h5py

    from tests.fixtures import make_something_fixture, make_video_hdf5

    paths, videos, labels, sizes = make_something_fixture(str(tmp_path), num_videos=3)
    videos_path = make_video_hdf5(str(tmp_path), sizes, num_frames=8)
    out_path = str(tmp_path / "features.h5")
    args = [
        "--dataset_path", paths["dataset_path"],
        "--labels_path", paths["labels_path"],
        "--videoid2size_path", paths["videoid2size_path"],
        "--videos_path", videos_path,
        "--save_features_path", out_path,
        "--appearance_num_frames", "4",
        "--spatial_size", "32",
        "--resnet_depth", "10",
        "--batch_size", "2",
        "--platform", "cpu",
    ]
    run_tool("dump_features.py", *args)
    run_tool("dump_features.py", *args)  # idempotent resume
    with h5py.File(out_path, "r") as f:
        assert set(f.keys()) == {v["id"] for v in videos}
        for vid in f:
            feats = np.asarray(f[vid]["features"])
            pooled = np.asarray(f[vid]["pooled"])
            assert feats.ndim == 2 and feats.shape[1] == 512  # depth-10 C_out
            np.testing.assert_allclose(pooled, feats.mean(axis=0), atol=1e-5)
            assert np.isfinite(feats).all()


def test_convert_checkpoint_cli(tmp_path):
    import torch

    from stlt_tpu.configs import StltModelConfig
    from tests.torch_ref import TorchStlt

    cfg = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
    )
    torch.manual_seed(0)
    pt = str(tmp_path / "ref.pt")
    torch.save(TorchStlt(cfg).state_dict(), pt)
    out = str(tmp_path / "out.msgpack")
    run_tool(
        "convert_checkpoint.py",
        "--model_name", "stlt", "--num_classes", "7",
        "--hidden_size", "32", "--num_attention_heads", "4",
        "--num_spatial_layers", "1", "--num_temporal_layers", "1",
        "--checkpoint_path", pt, "--output", out,
    )
    assert os.path.getsize(out) > 1000
    # round-trip: msgpack loads back into a matching template
    import jax

    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.models import models_factory
    from stlt_tpu.training.checkpoint import load_params

    model = models_factory["stlt"](cfg)
    batch = _synthetic_layout_batch(2, 17, 8, 4)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    restored = load_params(out, params)
    logits = model.apply({"params": restored}, inputs)["stlt"]
    assert np.isfinite(np.asarray(logits)).all()


def test_dump_perbox_features(tmp_path):
    import h5py

    from tests.fixtures import make_something_fixture, make_video_hdf5

    paths, videos, labels, sizes = make_something_fixture(str(tmp_path), num_videos=3)
    videos_path = make_video_hdf5(str(tmp_path), sizes, num_frames=6)
    out_path = str(tmp_path / "perbox.h5")
    args = [
        "--dataset_path", paths["dataset_path"],
        "--videos_path", videos_path,
        "--save_features_path", out_path,
        "--spatial_size", "32",
        "--resnet_depth", "10",
        "--window", "4",
        "--platform", "cpu",
    ]
    run_tool("dump_perbox_features.py", *args)
    run_tool("dump_perbox_features.py", *args)  # idempotent resume
    with h5py.File(out_path, "r") as f:
        assert set(f.keys()) == {v["id"] for v in videos}
        for el in videos:
            grp = f[el["id"]]
            num_frames = min(6, len(el["frames"]))
            # reference schema (dump_perbox_features.py:92-105): one
            # whole-frame vector + one per box, per frame.
            want_keys = set()
            for i in range(num_frames):
                want_keys.add(f"{i}-frame")
                for k in range(len(el["frames"][i]["frame_objects"])):
                    want_keys.add(f"{i}-frame-{k}-box")
            assert set(grp.keys()) == want_keys
            vec = np.asarray(grp["0-frame"])
            assert vec.shape == (9 * 512,)  # 3x3 pool x depth-10 C_out
            assert np.isfinite(vec).all()
            for key in grp:
                assert np.isfinite(np.asarray(grp[key])).all()


def test_perbox_natural_sort_matches_natsorted_semantics():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dump_perbox", os.path.join(REPO, "tools", "dump_perbox_features.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    keys = ["10", "2", "1", "frame_10", "frame_2", "00003"]
    assert mod.natural_sorted(keys) == ["1", "2", "00003", "10", "frame_2", "frame_10"]
