#!/usr/bin/env python
"""Dump per-frame and per-box ROI features to HDF5.

Working, TPU-native equivalent of the reference's
``src/dump_perbox_features.py`` (broken upstream: it indexes
``element["frames"][i]`` as a list of boxes, but every shipped dataset JSON
stores ``{"frame_objects": [...]}`` dicts — the stale-schema crash noted in
SURVEY.md §2.5). This tool keeps the reference's OUTPUT schema exactly
(``dump_perbox_features.py:92-105``): one HDF5 group per video id with

- ``{i}-frame``      — the whole-frame ROI feature of frame ``i``, and
- ``{i}-frame-{k}-box`` — the feature of that frame's ``k``-th box,

each a flat float32 vector from the reference's pooling chain
(ROI-Align ``7x7, sampling_ratio=2`` → adaptive avg-pool ``3x3`` → flatten,
``dump_perbox_features.py:22-39``), implemented in
``stlt_tpu/ops/roi_align.py`` with torchvision-parity tests.

Divergences (documented, deliberate):

- **Backbone.** torchvision's ImageNet Faster-R-CNN FPN cannot be fetched
  offline; the frozen-BN R3D backbone (``--resnet_model_path``, the same
  Kinetics checkpoint the appearance models load) stands in. Each frame's
  boxes pool on the temporally-nearest R3D feature map. Feature width is
  ``9 * C_backbone`` instead of ``9 * 256``.
- **Geometry.** Frames go through the repo's appearance eval transform
  (resize shorter side → center crop); boxes ride along with per-axis
  scaling exactly like torchvision's ``resize_boxes`` plus the crop offset.
- **Static shapes.** Boxes pad to the dataset-wide per-frame maximum and
  frames to ``--window`` multiples; padding is computed then dropped on
  write, so the jitted extractor compiles once.

Resumable like the reference: already-written video ids are skipped.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import re
from typing import List


def natural_sorted(keys: List[str]) -> List[str]:
    """``natsorted`` equivalent (reference dump_perbox_features.py:70):
    digit runs compare numerically, text runs lexically."""
    def split(k):
        # (0, number) / (1, text) pairs: numbers sort before text at the
        # same position, and int/str never compare directly.
        return tuple(
            (0, int(p)) if p.isdigit() else (1, p)
            for p in re.split(r"(\d+)", k)
            if p
        )

    return sorted(keys, key=split)


def transform_boxes(boxes, orig_hw, new_hw, crop_top_left):
    """Original-image boxes -> crop coordinates. Per-axis ratios like
    torchvision ``resize_boxes`` (reference dump_perbox_features.py:30-33),
    then the center-crop offset; no clamping (roi_align zero-fills samples
    outside the map, matching torchvision's border rule)."""
    import numpy as np

    (h0, w0), (h1, w1) = orig_hw, new_hw
    top, left = crop_top_left
    out = np.asarray(boxes, np.float32).copy()
    out[:, [0, 2]] = out[:, [0, 2]] * (w1 / w0) - left
    out[:, [1, 3]] = out[:, [1, 3]] * (h1 / h0) - top
    return out


def main():
    parser = argparse.ArgumentParser(
        description="Dumps per-frame and per-bounding-box ROI features."
    )
    parser.add_argument("--videos_path", type=str, required=True,
                        help="HDF5 JPEG-frame archive.")
    parser.add_argument("--dataset_path", type=str, required=True,
                        help="Something-Else layout JSON (frame_objects schema).")
    parser.add_argument("--save_features_path", type=str, required=True)
    parser.add_argument("--resnet_model_path", type=str, default=None,
                        help="Kinetics R3D checkpoint; random init if omitted.")
    parser.add_argument("--resnet_depth", type=int, default=50)
    parser.add_argument("--spatial_size", type=int, default=112)
    parser.add_argument("--window", type=int, default=32,
                        help="Frames per backbone invocation (static shape).")
    parser.add_argument("--print_freq", type=int, default=1000)
    parser.add_argument("--log_filepath", type=str, default=None)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    if args.log_filepath:
        logging.basicConfig(level=logging.INFO, filename=args.log_filepath,
                            filemode="w")
    else:
        logging.basicConfig(level=logging.INFO)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import h5py
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from stlt_tpu.configs import AppearanceModelConfig
    from stlt_tpu.data.transforms import (
        center_crop,
        center_crop_offsets,
        normalize_to_array,
        resize_shorter_side,
        resize_target,
    )
    from stlt_tpu.models.appearance import Resnet3D
    from stlt_tpu.ops.roi_align import adaptive_avg_pool2d, roi_align

    json_file = json.load(open(args.dataset_path))
    # Static box capacity: dataset-wide max boxes per frame, + 1 for the
    # whole-frame box the reference prepends (dump_perbox_features.py:84).
    max_boxes = 1 + max(
        (len(fr["frame_objects"]) for el in json_file for fr in el["frames"]),
        default=0,
    )
    window = args.window
    size = args.spatial_size
    resize_to = resize_target(size)

    model_cfg = AppearanceModelConfig(
        num_classes=1,  # classifier unused; features only
        appearance_num_frames=window,
        resnet_model_path=args.resnet_model_path or "unused",
        resnet_depth=args.resnet_depth,
        compute_dtype="bfloat16",
    )
    model = Resnet3D(model_cfg)
    template = {"video_frames": np.zeros((1, window, size, size, 3), np.float32)}
    params = model.init(
        jax.random.PRNGKey(0), template, method=Resnet3D.forward_features
    )["params"]
    if args.resnet_model_path:
        from stlt_tpu.utils.convert import load_kinetics_r3d

        params = load_kinetics_r3d(params, args.resnet_model_path)
        logging.info("Loaded R3D weights from %s", args.resnet_model_path)

    @jax.jit
    def extract(params, frames, boxes):
        """frames [window, S, S, 3] f32, boxes [window, K, 4] -> [window, K, F]."""
        feats = model.apply(
            {"params": params},
            {"video_frames": frames[None]},
            method=Resnet3D.forward_features,
        )[0]  # [T', H', W', C]
        t_units = feats.shape[0]
        unit = jnp.minimum(
            jnp.arange(window) * t_units // window, t_units - 1
        )
        maps = feats[unit].astype(jnp.float32)  # [window, H', W', C]
        scale = feats.shape[1] / size
        pooled = jax.vmap(
            lambda fm, bx: roi_align(
                fm, bx, output_size=(7, 7), spatial_scale=scale,
                sampling_ratio=2,
            )
        )(maps, boxes)  # [window, K, 7, 7, C]
        pooled = adaptive_avg_pool2d(pooled, (3, 3))
        return pooled.reshape(window, boxes.shape[1], -1)

    written = 0
    with h5py.File(args.videos_path, "r", libver="latest", swmr=True) as videos, \
            h5py.File(args.save_features_path, "a") as out:
        done = set(out.keys())
        for index, element in enumerate(json_file):
            video_id = element["id"]
            if video_id in done or video_id not in videos:
                continue
            frame_ids = natural_sorted(list(videos[video_id].keys()))
            num_frames = min(len(frame_ids), len(element["frames"]))
            if num_frames == 0:
                continue

            frames, all_boxes, counts = [], [], []
            for i in range(num_frames):
                img = Image.open(
                    io.BytesIO(np.asarray(videos[video_id][frame_ids[i]]).tobytes())
                ).convert("RGB")
                w0, h0 = img.size
                resized = resize_shorter_side(img, resize_to)
                w1, h1 = resized.size
                top, left = center_crop_offsets(h1, w1, size)
                frames.append(normalize_to_array(center_crop(resized, size)))
                raw = [[0.0, 0.0, float(w0), float(h0)]] + [
                    [b["x1"], b["y1"], b["x2"], b["y2"]]
                    for b in element["frames"][i]["frame_objects"]
                ]
                counts.append(len(raw))
                bx = transform_boxes(raw, (h0, w0), (h1, w1), (top, left))
                pad = np.zeros((max_boxes, 4), np.float32)
                pad[: len(raw)] = bx
                all_boxes.append(pad)

            feats = []
            for start in range(0, num_frames, window):
                f = np.zeros((window, size, size, 3), np.float32)
                b = np.zeros((window, max_boxes, 4), np.float32)
                chunk = min(window, num_frames - start)
                f[:chunk] = np.stack(frames[start:start + chunk])
                b[:chunk] = np.stack(all_boxes[start:start + chunk])
                feats.append(np.asarray(extract(params, f, b))[:chunk])
            feats = np.concatenate(feats, axis=0)  # [num_frames, K, F]

            grp = out.create_group(video_id)
            for i in range(num_frames):
                assert counts[i] == 1 + len(element["frames"][i]["frame_objects"])
                grp.create_dataset(f"{i}-frame", data=feats[i, 0])
                for k in range(1, counts[i]):
                    grp.create_dataset(f"{i}-frame-{k - 1}-box", data=feats[i, k])
            written += 1
            if index % args.print_freq == 0:
                logging.info("Current index is %d", index)
    logging.info("Wrote per-box features for %d videos to %s",
                 written, args.save_features_path)


if __name__ == "__main__":
    main()
