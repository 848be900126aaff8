"""Appearance (RGB) dataset: HDF5 JPEG archive → fixed-shape float frames.

Reference: ``AppearanceDataset`` (``src/modelling/datasets.py:139-208``) —
one HDF5 group per video id with one JPEG-bytes dataset per frame index,
opened lazily with SWMR for concurrent readers; stride-2 window sampling
(``sample_appearance_indices``); resize-128 → (train: per-clip color jitter +
shared random crop | eval: center crop) → 112px, mean/std 0.5.

TPU-first divergence: output is channel-LAST ``[T, S, S, 3]`` float32 (the
models' native layout) instead of torch's ``[C, T, S, S]``.
"""

from __future__ import annotations

import io
import json
import re
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from stlt_tpu.configs import DataConfig
from stlt_tpu.data.samplers import sample_appearance_indices
from stlt_tpu.data.transforms import (
    VideoColorJitter,
    center_crop,
    center_crop_offsets,
    crop,
    normalize_to_array,
    random_crop_params,
    resize_shorter_side,
    resize_target,
)

_TEMPLATE_BRACKETS = re.compile(r"[\[\]]")

# One warning per process when --native_decode was requested but the C++
# stage is unavailable — otherwise the advertised ~2x/core decode speedup
# silently degrades to PIL with no trace of the compiler error.
_warned_native_fallback = False


def _warn_native_fallback() -> None:
    global _warned_native_fallback
    if _warned_native_fallback:
        return
    _warned_native_fallback = True
    import logging

    from stlt_tpu.data.native_jpeg import unavailable_reason

    logging.warning(
        "--native_decode requested but the native JPEG stage is unavailable; "
        "falling back to PIL (slower). Build error:\n%s",
        unavailable_reason(),
    )


class AppearanceDataset:
    def __init__(self, config: DataConfig, json_file: Optional[List[dict]] = None):
        self.config = config
        if json_file is None:
            with open(config.dataset_path) as f:
                json_file = json.load(f)
        self.json_file = json_file
        with open(config.labels_path) as f:
            self.labels = json.load(f)
        self._videos = None  # lazy per-process open (SWMR), reference :158-165
        self._resize_to = resize_target(config.spatial_size)

    def __len__(self) -> int:
        return len(self.json_file)

    @property
    def videos(self):
        if self._videos is None:
            import h5py

            self._videos = h5py.File(
                self.config.videos_path, "r", libver="latest", swmr=True
            )
        return self._videos

    def _load_frame(self, group, index) -> Image.Image:
        img = Image.open(io.BytesIO(np.asarray(group[str(index)])))
        if self.config.fast_decode:
            # JPEG DCT-scaled decode: libjpeg produces a >= target-size image
            # directly (1/2, 1/4, 1/8 scale), then the normal resize finishes.
            img.draft("RGB", (self._resize_to, self._resize_to))
        return resize_shorter_side(img.convert("RGB"), self._resize_to)

    def _native_frames(self, group, indices) -> Optional[List[np.ndarray]]:
        """Decode+resize every sampled frame via the C++ stage (uint8 HWC
        arrays), or None to fall back to PIL (lib unavailable / bad frame)."""
        from stlt_tpu.data.native_jpeg import decode_resize, native_jpeg_available

        if not native_jpeg_available():
            _warn_native_fallback()
            return None
        frames = []
        for i in indices:
            arr = decode_resize(
                np.asarray(group[str(i)]).tobytes(),
                self._resize_to,
                draft=self.config.fast_decode,
            )
            if arr is None:
                return None
            frames.append(arr)
        return frames

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None) -> Dict:
        cfg = self.config
        if rng is None:
            rng = np.random.default_rng()
        video_id = self.json_file[idx]["id"]
        group = self.videos[video_id]
        num_frames = len(group)
        indices = sample_appearance_indices(
            cfg.appearance_num_frames, num_frames, cfg.train, rng=rng
        )
        native_frames = (
            self._native_frames(group, indices) if cfg.native_decode else None
        )
        if native_frames is not None:
            # C++ fast path: same RNG draw order as the PIL path below, so a
            # given seed yields the same augmentation either way.
            size = cfg.spatial_size
            if cfg.train:
                from stlt_tpu.data.native_jpeg import jitter_rgb

                jitter = VideoColorJitter(rng)
                top, left, h, w = random_crop_params(
                    native_frames[0], size, rng
                )
                for n, f in enumerate(native_frames):
                    if not jitter_rgb(f, jitter):
                        # Native jitter failed AFTER the RNG draws were
                        # consumed — apply the SAME draw via the PIL op chain
                        # so the clip still trains jittered and the stream
                        # stays aligned with the pure-PIL path.
                        native_frames[n] = np.asarray(
                            jitter(Image.fromarray(f)), dtype=np.uint8
                        )
            else:
                fh, fw = native_frames[0].shape[:2]
                top, left = center_crop_offsets(fh, fw, size)
                h = w = size
            video = np.stack(
                [f[top:top + h, left:left + w] for f in native_frames]
            )  # [T, S, S, 3] uint8
            if not cfg.device_normalize:
                video = normalize_to_array(video)
        else:
            frames = [
                self._load_frame(group, i)
                for i in indices
            ]
            if cfg.train:
                jitter = VideoColorJitter(rng)
                top, left, h, w = random_crop_params(frames[0], cfg.spatial_size, rng)
                frames = [crop(jitter(f), top, left, h, w) for f in frames]
            else:
                frames = [center_crop(f, cfg.spatial_size) for f in frames]
            if cfg.device_normalize:
                # Ship uint8; the model normalizes on device (appearance.py).
                video = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
            else:
                video = np.stack([normalize_to_array(f) for f in frames])  # [T, S, S, 3]
        label = np.asarray(
            int(
                self.labels[
                    _TEMPLATE_BRACKETS.sub("", self.json_file[idx]["template"])
                ]
            ),
            dtype=np.int32,
        )
        return {"video_id": video_id, "video_frames": video, "labels": label}


def collate_appearance(samples: List[Dict]) -> Dict[str, np.ndarray]:
    return {
        "video_frames": np.stack([s["video_frames"] for s in samples]),
        "labels": np.stack([s["labels"] for s in samples]),
    }
