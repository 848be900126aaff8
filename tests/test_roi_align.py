"""ROI-Align parity against a retyped torchvision CPU-kernel oracle.

torchvision is not installed in this image, so — like ``torch_ref*.py`` for
the models — the oracle below is the ``aligned=False`` sampling math of
``torchvision/csrc/ops/cpu/roi_align_kernel.cpp`` retyped in NumPy loops,
plus torch's ``AdaptiveAvgPool2d`` bin rule and the ``LevelMapper`` formula
from ``torchvision/ops/poolers.py``. The reference consumes these through
``fasterrcnn.roi_heads.box_roi_pool`` (``src/dump_perbox_features.py:22-39``).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stlt_tpu.ops.roi_align import (  # noqa: E402
    adaptive_avg_pool2d,
    fpn_level_for_boxes,
    multiscale_roi_align,
    roi_align,
)


def _bilinear_np(feat, y, x):
    """torchvision bilinear_interpolate: feat [H, W, C], scalar y/x."""
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (hy * hx * feat[y_low, x_low] + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low] + ly * lx * feat[y_high, x_high])


def _roi_align_np(feat, boxes, out_size, scale, ratio):
    out_h, out_w = out_size
    k = boxes.shape[0]
    out = np.zeros((k, out_h, out_w, feat.shape[-1]), np.float32)
    for n in range(k):
        x1, y1, x2, y2 = boxes[n] * scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_h = roi_h / out_h
        bin_w = roi_w / out_w
        for ph in range(out_h):
            for pw in range(out_w):
                acc = np.zeros(feat.shape[-1], np.float32)
                for iy in range(ratio):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / ratio
                    for ix in range(ratio):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / ratio
                        acc += _bilinear_np(feat, yy, xx)
                out[n, ph, pw] = acc / (ratio * ratio)
    return out


def _adaptive_pool_np(x, out_size):
    out_h, out_w = out_size
    in_h, in_w = x.shape[-3], x.shape[-2]
    rows = []
    for i in range(out_h):
        lo, hi = (i * in_h) // out_h, -((-(i + 1) * in_h) // out_h)
        rows.append(x[..., lo:hi, :, :].mean(axis=-3))
    x = np.stack(rows, axis=-3)
    cols = []
    for j in range(out_w):
        lo, hi = (j * in_w) // out_w, -((-(j + 1) * in_w) // out_w)
        cols.append(x[..., lo:hi, :].mean(axis=-2))
    return np.stack(cols, axis=-2)


def test_roi_align_matches_torchvision_semantics():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(9, 13, 5)).astype(np.float32)
    # In-bounds, sub-pixel, degenerate (zero-area), out-of-bounds, and
    # whole-image boxes — the dump tool's first box is always [0,0,w,h]
    # (reference dump_perbox_features.py:84).
    boxes = np.array(
        [
            [1.3, 2.1, 10.7, 7.9],
            [0.0, 0.0, 13.0, 9.0],
            [4.0, 4.0, 4.0, 4.0],
            [-6.0, -6.0, -2.0, -2.0],
            [11.9, 7.7, 25.0, 30.0],
        ],
        np.float32,
    )
    for scale in (1.0, 0.5, 0.25):
        want = _roi_align_np(feat, boxes, (7, 7), scale, 2)
        got = np.asarray(
            roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                      output_size=(7, 7), spatial_scale=scale, sampling_ratio=2)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_roi_align_jits_and_batches():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(4, 4, 3)).astype(np.float32)
    boxes = rng.uniform(0, 4, size=(6, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2])
    fn = jax.jit(lambda f, b: roi_align(f, b, output_size=(3, 3), sampling_ratio=2))
    got = np.asarray(fn(feat, boxes))
    want = _roi_align_np(feat, boxes, (3, 3), 1.0, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_adaptive_avg_pool_7_to_3_matches_torch_rule():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 7, 7, 4)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (3, 3)))
    want = _adaptive_pool_np(x, (3, 3))
    assert got.shape == (2, 3, 3, 4)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # identity when sizes match
    np.testing.assert_allclose(
        np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (7, 7))), x, rtol=0, atol=0
    )


def test_fpn_level_mapper_formula():
    boxes = np.array(
        [
            [0, 0, 224, 224],   # canonical -> level 4
            [0, 0, 56, 56],     # area/16 -> level 2
            [0, 0, 112, 112],   # half -> level 3
            [0, 0, 1000, 1000], # huge -> clamp 5
            [5, 5, 5, 5],       # degenerate -> clamp 2
        ],
        np.float32,
    )
    lvls = np.asarray(fpn_level_for_boxes(jnp.asarray(boxes), k_min=2, k_max=5))
    np.testing.assert_array_equal(lvls, [4, 2, 3, 5, 2])


def test_multiscale_selects_per_level_and_matches_single_level():
    rng = np.random.default_rng(3)
    maps = [rng.normal(size=(16 >> i, 16 >> i, 3)).astype(np.float32) for i in range(3)]
    scales = [0.25, 0.125, 0.0625]  # levels 2..4
    boxes = np.array(
        [[0, 0, 50, 50], [0, 0, 200, 200], [0, 0, 500, 500]], np.float32
    )
    got = np.asarray(
        multiscale_roi_align(
            [jnp.asarray(m) for m in maps], jnp.asarray(boxes),
            spatial_scales=scales, output_size=(2, 2), sampling_ratio=2,
        )
    )
    lvls = np.asarray(fpn_level_for_boxes(jnp.asarray(boxes), k_min=2, k_max=4))
    for n, lvl in enumerate(lvls):
        want = _roi_align_np(maps[lvl - 2], boxes[n:n + 1], (2, 2), scales[lvl - 2], 2)
        np.testing.assert_allclose(got[n], want[0], rtol=1e-5, atol=1e-5)
