"""LayoutDataset invariants (reference src/modelling/datasets.py:32-136, 239-288)."""

import numpy as np
import pytest

from stlt_tpu.configs import DataConfig
from stlt_tpu.data.layout import LayoutDataset, collate_layout, scan_max_objects
from tests.fixtures import make_action_genome_fixture, make_something_fixture


@pytest.fixture(scope="module")
def something(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("something")
    paths, videos, labels, sizes = make_something_fixture(str(tmpdir))
    config = DataConfig(dataset_name="something", train=False, **paths)
    return LayoutDataset(config), videos, labels, sizes


def test_max_objects_scan(something):
    ds, videos, _, _ = something
    expected = scan_max_objects(videos, 0.5)
    assert ds.config.max_num_objects == expected
    # manual recount
    manual = max(
        sum(1 for o in f["frame_objects"] if o["score"] >= 0.5)
        for v in videos
        for f in v["frames"]
    )
    assert expected == manual


def test_static_shapes_and_cls_slots(something):
    ds, _, _, _ = something
    F = ds.config.num_total_frames
    O = ds.config.num_total_boxes
    for i in range(len(ds)):
        clip = ds[i]
        assert clip["categories"].shape == (F, O)
        assert clip["boxes"].shape == (F, O, 4)
        assert clip["scores"].shape == (F, O)
        assert clip["frame_types"].shape == (F,)
        # Every frame (real, extract, AND pad) carries the CLS token in slot 0.
        cls_id = ds.config.category2id["cls"]
        assert (clip["categories"][:, 0] == cls_id).all()
        np.testing.assert_array_equal(
            clip["boxes"][:, 0],
            np.tile(np.array([0.0, 0.0, 1.0, 1.0], np.float32), (F, 1)),
        )
        assert (clip["scores"][:, 0] == 1.0).all()


def test_frame_type_layout(something):
    ds, videos, _, _ = something
    f2t = ds.config.frame2type
    for i in range(len(ds)):
        clip = ds[i]
        n = int(clip["lengths"])  # sampled frames + extract
        types = clip["frame_types"]
        # extract frame right after the sampled frames
        assert types[n - 1] == f2t["extract"]
        assert all(t in (f2t["regular"], f2t["empty"]) for t in types[: n - 1])
        assert (types[n:] == f2t["pad"]).all()
        # eval sampler: lengths = min(16, num_video_frames) + 1
        expected_n = min(ds.config.layout_num_frames, len(videos[i]["frames"])) + 1
        assert n == expected_n


def test_boxes_normalized(something):
    ds, _, _, sizes = something
    for i in range(len(ds)):
        clip = ds[i]
        assert clip["boxes"].min() >= 0.0
        assert clip["boxes"].max() <= 1.0 + 1e-6


def test_score_threshold_respected(something):
    ds, videos, _, _ = something
    clip = ds[0]
    # all non-pad, non-cls slots must come from objects with score >= 0.5
    mask = clip["categories"] != 0
    mask[:, 0] = False
    assert (clip["scores"][mask] >= 0.5).all()


def test_labels_template_lookup(something):
    ds, videos, labels, _ = something
    import re

    for i in range(len(ds)):
        clip = ds[i]
        template = re.sub(r"[\[\]]", "", videos[i]["template"])
        assert int(clip["labels"]) == int(labels[template])


def test_collate_something_drops_scores(something):
    ds, _, _, _ = something
    batch = collate_layout([ds[0], ds[1]], "something")
    assert "scores" not in batch
    assert batch["categories"].shape[0] == 2
    assert batch["labels"].dtype == np.int32


def test_action_genome_multilabel(tmp_path):
    paths, videos, labels, _ = make_action_genome_fixture(str(tmp_path))
    config = DataConfig(dataset_name="action_genome", train=False, **paths)
    ds = LayoutDataset(config)
    clip = ds[0]
    assert clip["labels"].shape == (len(labels),)
    hot = {int(a[1:]) for a in videos[0]["actions"]}
    assert {i for i, v in enumerate(clip["labels"]) if v == 1.0} == hot
    batch = collate_layout([ds[0], ds[1]], "action_genome")
    assert "scores" in batch  # kept for AG (reference datasets.py:252-260)


def test_train_sampling_uses_rng(something):
    ds, _, _, _ = something
    ds.config.train = True
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    a = ds.__getitem__(0, rng=rng1)
    b = ds.__getitem__(0, rng=rng2)
    np.testing.assert_array_equal(a["categories"], b["categories"])
    ds.config.train = False
