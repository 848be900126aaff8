"""ROI-Align and the multi-scale pooling chain for per-box feature dumps.

TPU-native counterpart of the pooling stack the reference's per-box dump
script builds out of torchvision (``src/dump_perbox_features.py:18-39``:
``fasterrcnn.roi_heads.box_roi_pool`` — a MultiScaleRoIAlign with
``output_size=7, sampling_ratio=2`` — followed by
``nn.AdaptiveAvgPool2d((3, 3))`` and ``flatten(1)``).

Design (TPU-first, not a translation):

- **Static shapes**: the number of boxes per call is fixed; callers pad the
  box list and mask afterwards. Everything is jit/vmap-friendly.
- **Channels-last** feature maps ``[H, W, C]`` (the repo's conv layout).
- Bilinear sampling is four flat gathers + a weighted sum, vectorized over
  (box, bin, sample) in one shot — no Python loops, no dynamic shapes.
- Sampling semantics match torchvision's ``roi_align`` with
  ``aligned=False`` (the detection default the reference inherits): no
  half-pixel shift, ROI sizes floored at 1, ``ceil`` sampling grid when
  ``sampling_ratio <= 0``, samples outside ``[-1, size]`` contribute zero,
  coordinates clamped to ``[0, size - 1]`` before the 2x2 neighborhood.

The per-box dump tool (``tools/dump_perbox_features.py``) composes
:func:`roi_align` + :func:`adaptive_avg_pool2d` + ``reshape`` exactly as the
reference's ``FeatureExtractor.forward`` does, with the repo's frozen-BN R3D
backbone standing in for torchvision's FPN (offline — no pretrained
Faster-R-CNN weights can be fetched; the dump schema and the pooling math
are the parity surface, see the tool's docstring).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def _bilinear_gather(features: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample ``features [H, W, C]`` at float coords ``ys/xs [N]``.

    torchvision border rule (``roi_align_common.h``): samples with
    ``y < -1 or y > H`` (same for x) contribute exactly zero; otherwise
    coords clamp into ``[0, size - 1]`` and the 2x2 neighborhood blends with
    weights from the *clamped* position.
    """
    h, w, _ = features.shape
    dead = (ys < -1.0) | (ys > float(h)) | (xs < -1.0) | (xs > float(w))
    y = jnp.clip(ys, 0.0, float(h - 1))
    x = jnp.clip(xs, 0.0, float(w - 1))
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[:, None]
    lx = (x - x0.astype(x.dtype))[:, None]
    flat = features.reshape(h * w, -1)
    v00 = jnp.take(flat, y0 * w + x0, axis=0)
    v01 = jnp.take(flat, y0 * w + x1, axis=0)
    v10 = jnp.take(flat, y1 * w + x0, axis=0)
    v11 = jnp.take(flat, y1 * w + x1, axis=0)
    out = ((1 - ly) * (1 - lx) * v00 + (1 - ly) * lx * v01
           + ly * (1 - lx) * v10 + ly * lx * v11)
    return jnp.where(dead[:, None], 0.0, out)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    *,
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROI-Align one feature map. ``features [H, W, C]``, ``boxes [K, 4]``
    as ``(x1, y1, x2, y2)`` in input-image coordinates. Returns
    ``[K, out_h, out_w, C]`` float32.

    ``sampling_ratio > 0`` uses an ``s x s`` sample grid per bin;
    ``sampling_ratio <= 0`` uses torchvision's adaptive
    ``ceil(roi_extent / bins)`` — only supported here when that ceil is
    uniform across the (static) box set, so the adaptive case is exposed for
    parity tests but the dump tool always passes 2 (the detection default).
    """
    out_h, out_w = output_size
    feats = features.astype(jnp.float32)
    b = boxes.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_h = roi_h / out_h  # [K]
    bin_w = roi_w / out_w
    if sampling_ratio <= 0:
        raise NotImplementedError(
            "adaptive sampling_ratio is data-dependent per box; the dump "
            "chain (reference dump_perbox_features.py:22) always uses 2"
        )
    s = sampling_ratio

    # Sample coords: y = y1 + ph*bin_h + (iy + .5) * bin_h / s, for all
    # (ph, iy) — one [K, out_h*s] grid per axis, crossed into bins later.
    iy = (jnp.arange(out_h * s, dtype=jnp.float32) % s + 0.5) / s
    ph = jnp.arange(out_h * s, dtype=jnp.float32) // s
    ys = y1[:, None] + (ph + iy)[None, :] * bin_h[:, None]  # [K, out_h*s]
    ix = (jnp.arange(out_w * s, dtype=jnp.float32) % s + 0.5) / s
    pw = jnp.arange(out_w * s, dtype=jnp.float32) // s
    xs = x1[:, None] + (pw + ix)[None, :] * bin_w[:, None]  # [K, out_w*s]

    k = boxes.shape[0]
    yy = jnp.broadcast_to(ys[:, :, None], (k, out_h * s, out_w * s))
    xx = jnp.broadcast_to(xs[:, None, :], (k, out_h * s, out_w * s))
    vals = _bilinear_gather(feats, yy.reshape(-1), xx.reshape(-1))
    c = feats.shape[-1]
    vals = vals.reshape(k, out_h, s, out_w, s, c)
    return vals.mean(axis=(2, 4))


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """``nn.AdaptiveAvgPool2d`` on ``[..., H, W, C]`` (channels-last).

    torch bin rule: bin ``i`` covers ``[floor(i*In/Out), ceil((i+1)*In/Out))``
    — overlapping bins are legal (7 -> 3 gives 3/3/3 with overlap), so this
    builds the static bin lists at trace time.
    """
    out_h, out_w = output_size
    in_h, in_w = x.shape[-3], x.shape[-2]

    def _bins(n_in: int, n_out: int):
        return [
            (int(math.floor(i * n_in / n_out)), int(math.ceil((i + 1) * n_in / n_out)))
            for i in range(n_out)
        ]

    rows = [x[..., lo:hi, :, :].mean(axis=-3) for lo, hi in _bins(in_h, out_h)]
    x = jnp.stack(rows, axis=-3)
    cols = [x[..., lo:hi, :].mean(axis=-2) for lo, hi in _bins(in_w, out_w)]
    return jnp.stack(cols, axis=-2)


def fpn_level_for_boxes(
    boxes: jnp.ndarray,
    *,
    k_min: int = 2,
    k_max: int = 5,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """torchvision ``LevelMapper`` (``poolers.py``): assign each box to an
    FPN level by ``floor(k0 + log2(sqrt(area) / s0))``, clamped. Returns
    int32 ``[K]`` of levels in ``[k_min, k_max]``."""
    b = boxes.astype(jnp.float32)
    area = jnp.maximum((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]), 1e-6)
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6)
    )
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32)


def multiscale_roi_align(
    feature_maps: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    *,
    spatial_scales: Sequence[float],
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """MultiScaleRoIAlign over a static pyramid: pool every box on every
    level, then select by the level map. Dense-over-levels trades
    ``len(levels)``x pooling FLOPs (tiny — gathers on 7x7 bins) for static
    shapes and zero host sync, the right trade on TPU. ``spatial_scales[i]``
    is the i-th map's resolution relative to the input image; levels are
    numbered so ``k_min = -log2(spatial_scales[0])``."""
    k_min = int(-math.log2(spatial_scales[0]) + 0.5)
    k_max = int(-math.log2(spatial_scales[-1]) + 0.5)
    levels = fpn_level_for_boxes(
        boxes, k_min=k_min, k_max=k_max,
        canonical_scale=canonical_scale, canonical_level=canonical_level,
    )
    pooled = jnp.stack(
        [
            roi_align(
                fm, boxes, output_size=output_size,
                spatial_scale=sc, sampling_ratio=sampling_ratio,
            )
            for fm, sc in zip(feature_maps, spatial_scales)
        ],
        axis=0,
    )  # [L, K, oh, ow, C]
    sel = (levels - k_min)[None, :, None, None, None]
    lix = jnp.arange(len(feature_maps))[:, None, None, None, None]
    return (pooled * (lix == sel)).sum(axis=0)
