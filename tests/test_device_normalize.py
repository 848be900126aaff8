"""Device-side RGB normalization (``--device_normalize``).

The host ships uint8 crops (4× less host→device transfer than f32) and the
model applies the pipeline's mean/std-0.5 normalization on device
(``models/appearance.py``; reference semantics ``src/modelling/datasets.py:196-197``).
Must be numerically identical to the host-normalized path.
"""

import jax
import numpy as np
import pytest

from stlt_tpu.configs import AppearanceModelConfig, DataConfig
from stlt_tpu.data.appearance import AppearanceDataset
from stlt_tpu.models import models_factory


@pytest.fixture(scope="module")
def appearance_fixture(tmp_path_factory):
    from tests.fixtures import make_something_fixture, make_video_hdf5

    d = str(tmp_path_factory.mktemp("devnorm"))
    paths, _videos, _labels, sizes = make_something_fixture(d)
    h5 = make_video_hdf5(d, sizes)
    return paths, h5


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("native", [False, True])
def test_dataset_uint8_matches_normalized_float(appearance_fixture, train, native):
    paths, h5 = appearance_fixture
    if native:
        from stlt_tpu.data.native_jpeg import native_jpeg_available

        if not native_jpeg_available():
            pytest.skip("native jpeg stage unavailable")
    make = lambda dn: AppearanceDataset(
        DataConfig(dataset_name="something", train=train, videos_path=h5,
                   native_decode=native, device_normalize=dn, **paths)
    )
    f = make(False).__getitem__(0, rng=np.random.default_rng(7))
    u = make(True).__getitem__(0, rng=np.random.default_rng(7))
    assert u["video_frames"].dtype == np.uint8
    assert f["video_frames"].dtype == np.float32
    np.testing.assert_array_equal(
        f["video_frames"], u["video_frames"].astype(np.float32) / 127.5 - 1.0
    )


def test_model_normalizes_uint8_on_device():
    cfg = AppearanceModelConfig(
        num_classes=5,
        appearance_num_frames=4,
        resnet_model_path="unused",
        resnet_depth=10,
        hidden_size=32,
        num_attention_heads=4,
        num_appearance_layers=1,
    )
    rng = np.random.default_rng(0)
    # 4 frames @64px → R3D token count 1·2·2 = 4 = appearance_num_frames.
    raw = rng.integers(0, 256, (2, 4, 64, 64, 3), dtype=np.uint8)
    batch_u8 = {"video_frames": raw}
    batch_f32 = {"video_frames": raw.astype(np.float32) / 127.5 - 1.0}

    for name in ("resnet3d", "resnet3d-transformer"):
        model = models_factory[name](cfg)
        params = model.init(jax.random.PRNGKey(0), batch_f32)["params"]
        out_f = model.apply({"params": params}, batch_f32)["resnet3d"]
        out_u = model.apply({"params": params}, batch_u8)["resnet3d"]
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_u), rtol=0, atol=1e-6
        )
