"""Native C++ layout tokenizer vs the Python LayoutDataset — bit-identical."""

import numpy as np
import pytest

from stlt_tpu.configs import DataConfig
from stlt_tpu.data.layout import LayoutDataset
from tests.fixtures import make_action_genome_fixture, make_something_fixture

native = pytest.importorskip("stlt_tpu.data.native")

if not native.native_available():
    pytest.skip("g++ unavailable — native tokenizer not built", allow_module_level=True)


@pytest.mark.parametrize("dataset_name", ["something", "action_genome"])
def test_native_matches_python(tmp_path, dataset_name):
    if dataset_name == "something":
        paths, *_ = make_something_fixture(str(tmp_path), num_videos=6)
    else:
        paths, *_ = make_action_genome_fixture(str(tmp_path), num_videos=4)
    config_py = DataConfig(dataset_name=dataset_name, train=False, **paths)
    config_nat = DataConfig(dataset_name=dataset_name, train=False, **paths)
    ds_py = LayoutDataset(config_py)
    ds_nat = native.NativeLayoutDataset(config_nat)
    assert len(ds_py) == len(ds_nat)
    assert config_py.max_num_objects == config_nat.max_num_objects
    for i in range(len(ds_py)):
        a, b = ds_py[i], ds_nat[i]
        assert a["video_id"] == b["video_id"]
        np.testing.assert_array_equal(a["categories"], b["categories"])
        np.testing.assert_array_equal(a["frame_types"], b["frame_types"])
        np.testing.assert_array_equal(a["lengths"], b["lengths"])
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-6)
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-6)
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_native_train_sampling_matches(tmp_path):
    paths, *_ = make_something_fixture(str(tmp_path), num_videos=4, seed=5)
    cfg_py = DataConfig(dataset_name="something", train=True, **paths)
    cfg_nat = DataConfig(dataset_name="something", train=True, **paths)
    ds_py = LayoutDataset(cfg_py)
    ds_nat = native.NativeLayoutDataset(cfg_nat)
    for i in range(len(ds_py)):
        a = ds_py.__getitem__(i, rng=np.random.default_rng(11))
        b = ds_nat.__getitem__(i, rng=np.random.default_rng(11))
        np.testing.assert_array_equal(a["categories"], b["categories"])
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-6)


def test_native_unknown_category_raises(tmp_path):
    import json

    paths, videos, *_ = make_something_fixture(str(tmp_path), num_videos=2)
    videos[0]["frames"][0]["frame_objects"].append(
        {"category": "spaceship", "x1": 1, "y1": 1, "x2": 5, "y2": 5, "score": 0.9}
    )
    json.dump(videos, open(paths["dataset_path"], "w"))
    cfg = DataConfig(dataset_name="something", train=False, **paths)
    ds = native.NativeLayoutDataset(cfg)
    with pytest.raises(KeyError):
        ds[0]
