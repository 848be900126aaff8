"""Appearance/multimodal dataset invariants (reference datasets.py:139-229)."""

import numpy as np
import pytest

from stlt_tpu.configs import DataConfig
from stlt_tpu.data.appearance import AppearanceDataset, collate_appearance
from stlt_tpu.data.multimodal import MultimodalDataset, make_collate_multimodal
from tests.fixtures import make_something_fixture, make_video_hdf5


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("appearance"))
    paths, videos, labels, sizes = make_something_fixture(tmpdir, num_videos=4)
    videos_path = make_video_hdf5(tmpdir, sizes, num_frames=12)
    return paths, videos, labels, sizes, videos_path


def _config(paths, videos_path, *, train, frames=4, spatial=32):
    return DataConfig(
        dataset_name="something",
        train=train,
        videos_path=videos_path,
        appearance_num_frames=frames,
        spatial_size=spatial,
        **paths,
    )


def test_eval_shapes_and_range(setup):
    paths, videos, labels, sizes, videos_path = setup
    ds = AppearanceDataset(_config(paths, videos_path, train=False))
    clip = ds[0]
    assert clip["video_frames"].shape == (4, 32, 32, 3)
    assert clip["video_frames"].dtype == np.float32
    assert -1.0 <= clip["video_frames"].min() and clip["video_frames"].max() <= 1.0
    batch = collate_appearance([ds[0], ds[1]])
    assert batch["video_frames"].shape == (2, 4, 32, 32, 3)


def test_eval_deterministic(setup):
    paths, *_, videos_path = setup
    ds = AppearanceDataset(_config(paths, videos_path, train=False))
    np.testing.assert_array_equal(ds[1]["video_frames"], ds[1]["video_frames"])


def test_train_augmentation_clip_consistent(setup):
    """Jitter params and crop must be constant across frames of one clip:
    two identical source frames must stay identical after augmentation."""
    paths, videos, labels, sizes, _ = setup
    import tempfile

    from tests.fixtures import make_video_hdf5 as mk

    # archive where all frames of a video are the same image
    tmp = tempfile.mkdtemp()
    vp = mk(tmp, {k: v for k, v in list(sizes.items())[:1]}, num_frames=6, seed=9)
    import h5py

    with h5py.File(vp, "r+") as f:
        vid = list(f.keys())[0]
        first = np.asarray(f[vid]["0"])
        for i in range(1, 6):
            del f[vid][str(i)]
            f[vid].create_dataset(str(i), data=first)
    ds = AppearanceDataset(
        _config(paths, vp, train=True, frames=3),
        json_file=[v for v in videos if v["id"] == vid],
    )
    clip = ds.__getitem__(0, rng=np.random.default_rng(3))
    for t in range(1, clip["video_frames"].shape[0]):
        np.testing.assert_array_equal(clip["video_frames"][0], clip["video_frames"][t])


def test_multimodal_pairs_and_collate(setup):
    paths, videos, labels, sizes, videos_path = setup
    cfg = _config(paths, videos_path, train=False)
    ds = MultimodalDataset(cfg)
    sample = ds[0]
    assert sample["layout"]["video_id"] == sample["appearance"]["video_id"]
    collate = make_collate_multimodal(cfg)
    batch = collate([ds[0], ds[1]])
    assert "video_frames" in batch and "categories" in batch and "boxes" in batch
    assert batch["video_frames"].shape[0] == batch["categories"].shape[0] == 2
    np.testing.assert_array_equal(
        batch["labels"], np.stack([ds[i]["layout"]["labels"] for i in range(2)])
    )


def test_resize_shorter_side_torchvision_size_formula():
    """torchvision Resize(int) truncates the long side: int(size*long/short).
    Sizes must match exactly (the released checkpoints saw those pixels)."""
    from PIL import Image

    from stlt_tpu.data.transforms import resize_shorter_side

    cases = [
        ((427, 240), 128, (227, 128)),   # int(128*427/240) = 227 (not round->228)
        ((240, 427), 128, (128, 227)),
        ((320, 240), 128, (170, 128)),   # int(128*320/240) = 170
        ((128, 128), 128, (128, 128)),   # no-op
        ((100, 150), 128, (128, 192)),   # upscale
    ]
    for (w, h), target, expected in cases:
        img = Image.new("RGB", (w, h))
        out = resize_shorter_side(img, target)
        assert out.size == expected, ((w, h), out.size, expected)
