"""Native JPEG decode/resize/jitter stage vs the PIL reference path.

The C++ stage (native/jpeg_pipeline.cpp) must be pixel-faithful to the PIL
pipeline the released checkpoints were trained on (reference
``src/modelling/datasets.py:147-198``): the resampler and the color jitter
reimplement Pillow's fixed-point semantics and are asserted BIT-IDENTICAL;
decode equality additionally relies on PIL's bundled libjpeg matching the
system one (true in this environment — libjpeg-turbo 6.2 ABI both sides).
"""

import io

import numpy as np
import pytest
from PIL import Image

from stlt_tpu.data import native_jpeg
from stlt_tpu.data.transforms import VideoColorJitter, resize_shorter_side

pytestmark = pytest.mark.skipif(
    not native_jpeg.native_jpeg_available(), reason="g++/libjpeg unavailable"
)


def _random_image(rng, w, h):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _encode(arr, quality=87):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


# --- resize: bit-identical to PIL BILINEAR ----------------------------------


@pytest.mark.parametrize(
    "in_wh,out_wh",
    [
        ((320, 240), (171, 128)),   # downscale
        ((100, 80), (160, 128)),    # upscale
        ((317, 211), (192, 128)),   # odd sizes
        ((64, 480), (128, 960)),    # tall
        ((128, 100), (128, 77)),    # one axis unchanged
    ],
)
def test_resize_bit_identical_to_pil(in_wh, out_wh):
    rng = np.random.default_rng(0)
    (iw, ih), (ow, oh) = in_wh, out_wh
    img = _random_image(rng, iw, ih)
    pil = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
    nat = native_jpeg.resize_rgb(img, ow, oh)
    np.testing.assert_array_equal(pil, nat)


# --- decode+resize: equals the PIL pipeline ---------------------------------


@pytest.mark.parametrize("wh,quality", [((320, 240), 85), ((640, 360), 75)])
@pytest.mark.parametrize("draft", [False, True])
def test_decode_resize_matches_pil(wh, quality, draft):
    rng = np.random.default_rng(1)
    data = _encode(_random_image(rng, *wh), quality)
    img = Image.open(io.BytesIO(data))
    if draft:
        img.draft("RGB", (128, 128))
    pil = np.asarray(resize_shorter_side(img.convert("RGB"), 128))
    nat = native_jpeg.decode_resize(data, 128, draft=draft)
    assert nat.shape == pil.shape
    np.testing.assert_array_equal(pil, nat)


def test_decode_rejects_garbage():
    assert native_jpeg.decode_resize(b"not a jpeg", 128) is None


# --- jitter: bit-identical to the PIL op chain ------------------------------


def test_jitter_bit_identical_to_pil_chain():
    rng = np.random.default_rng(3)
    for _ in range(20):
        arr = _random_image(rng, 53, 40)
        jit = VideoColorJitter(rng)
        pil = np.asarray(jit(Image.fromarray(arr)))
        nat = arr.copy()
        assert native_jpeg.jitter_rgb(nat, jit)
        np.testing.assert_array_equal(pil, nat)


def test_hue_roundtrip_matches_pil():
    # Dense color sweep through the HSV round-trip at a fixed shift — the
    # trickiest op (float/double promotion boundaries flip pixels by one).
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (256, 400, 3), dtype=np.uint8)
    shift = -21  # int(round(-0.081523 * 255)) — a drawable hue factor

    hsv = np.asarray(Image.fromarray(arr).convert("HSV"))
    shifted = (hsv[..., 0].astype(np.int16) + shift).astype(np.uint8)
    pil = np.asarray(
        Image.merge(
            "HSV",
            [Image.fromarray(shifted, "L"),
             Image.fromarray(hsv[..., 1], "L"),
             Image.fromarray(hsv[..., 2], "L")],
        ).convert("RGB")
    )

    class HueOnly:
        order = [3, 0, 1, 2]  # identity factors for the rest
        brightness = contrast = saturation = 1.0
        hue = shift / 255.0

    nat = arr.copy()
    assert native_jpeg.jitter_rgb(nat, HueOnly())
    np.testing.assert_array_equal(pil, nat)


# --- dataset integration -----------------------------------------------------


@pytest.fixture(scope="module")
def appearance_fixture(tmp_path_factory):
    from tests.fixtures import make_something_fixture, make_video_hdf5

    d = str(tmp_path_factory.mktemp("njpeg"))
    paths, _videos, _labels, sizes = make_something_fixture(d)
    h5 = make_video_hdf5(d, sizes)
    return paths, h5


@pytest.mark.parametrize("train", [False, True])
def test_dataset_native_path_bit_identical(appearance_fixture, train):
    from stlt_tpu.configs import DataConfig
    from stlt_tpu.data.appearance import AppearanceDataset

    paths, h5 = appearance_fixture
    datasets = [
        AppearanceDataset(
            DataConfig(dataset_name="something", train=train, videos_path=h5,
                       native_decode=nd, **paths)
        )
        for nd in (False, True)
    ]
    for idx in range(3):
        ref = datasets[0].__getitem__(idx, rng=np.random.default_rng(42 + idx))
        nat = datasets[1].__getitem__(idx, rng=np.random.default_rng(42 + idx))
        np.testing.assert_array_equal(ref["video_frames"], nat["video_frames"])
        assert ref["labels"] == nat["labels"]


def test_dataset_falls_back_without_library(appearance_fixture, monkeypatch):
    from stlt_tpu.configs import DataConfig
    from stlt_tpu.data.appearance import AppearanceDataset

    paths, h5 = appearance_fixture
    monkeypatch.setattr(native_jpeg, "native_jpeg_available", lambda: False)
    ds = AppearanceDataset(
        DataConfig(dataset_name="something", train=True, videos_path=h5,
                   native_decode=True, **paths)
    )
    out = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert out["video_frames"].shape == (32, 112, 112, 3)
