"""Image transforms for the appearance pipeline (PIL + numpy; no torchvision).

Reimplements the reference's augmentation semantics
(``src/modelling/datasets.py:147-198`` + ``src/utils/data_utils.py:105-137``):

- resize shorter side to ``floor(spatial_size * 1.15)`` (bilinear);
- train: ONE ``VideoColorJitter`` parameter draw per clip (random order of
  brightness/contrast/saturation/hue with torchvision's factor ranges) and ONE
  shared random crop; eval: center crop;
- normalize mean 0.5 / std 0.5.

PIL's ImageEnhance Brightness/Contrast/Color are the same blend operations
torchvision's functional adjust_* use for PIL inputs; hue is the same
HSV-channel shift. Exact RNG streams differ (we use explicit numpy
Generators), the distributions match.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance


def resize_shorter_side(img: Image.Image, target: int) -> Image.Image:
    # torchvision Resize(int) TRUNCATES the long side: int(size * long / short)
    # — keep that exactly (the released checkpoints saw these pixels).
    w, h = img.size
    if w <= h:
        new_w, new_h = target, max(1, int(target * h / w))
    else:
        new_w, new_h = max(1, int(target * w / h)), target
    if (new_w, new_h) == (w, h):
        return img
    return img.resize((new_w, new_h), Image.BILINEAR)


def random_crop_params(
    img, size: int, rng: np.random.Generator
) -> Tuple[int, int, int, int]:
    """Shared-crop draw; accepts a PIL image or a uint8 [H, W, C] array
    (the native decode path)."""
    if isinstance(img, Image.Image):
        w, h = img.size
    else:
        h, w = img.shape[:2]
    if w == size and h == size:
        return 0, 0, size, size
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return top, left, size, size


def crop(img: Image.Image, top: int, left: int, height: int, width: int) -> Image.Image:
    return img.crop((left, top, left + width, top + height))


def center_crop_offsets(height: int, width: int, size: int) -> Tuple[int, int]:
    """(top, left) of the centered crop — the ONE place this rounding lives
    (the released checkpoints saw exactly these pixels)."""
    return int(round((height - size) / 2.0)), int(round((width - size) / 2.0))


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    top, left = center_crop_offsets(h, w, size)
    return img.crop((left, top, left + size, top + size))


def adjust_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    if abs(hue_factor) < 1e-9:
        return img
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    np_h = (np_h.astype(np.int16) + int(round(hue_factor * 255))).astype(np.uint8)
    return Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v)).convert("RGB")


class VideoColorJitter:
    """Per-clip-constant color jitter (reference data_utils.py:110-137):
    the factor draw happens ONCE per clip, then applies to every frame."""

    BRIGHTNESS = (0.75, 1.25)
    CONTRAST = (0.75, 1.25)
    SATURATION = (0.75, 1.25)
    HUE = (-0.1, 0.1)

    def __init__(self, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        self.order = rng.permutation(4)
        self.brightness = float(rng.uniform(*self.BRIGHTNESS))
        self.contrast = float(rng.uniform(*self.CONTRAST))
        self.saturation = float(rng.uniform(*self.SATURATION))
        self.hue = float(rng.uniform(*self.HUE))

    def __call__(self, img: Image.Image) -> Image.Image:
        for op in self.order:
            if op == 0:
                img = ImageEnhance.Brightness(img).enhance(self.brightness)
            elif op == 1:
                img = ImageEnhance.Contrast(img).enhance(self.contrast)
            elif op == 2:
                img = ImageEnhance.Color(img).enhance(self.saturation)
            else:
                img = adjust_hue(img, self.hue)
        return img


# mean/std 0.5 over the [0, 1] range ⇔ uint8 x → x / 127.5 - 1 (reference
# datasets.py:196-197). The ONE place the constants live: the host path
# (normalize_to_array) and the on-device DataConfig.device_normalize path
# (models/appearance.py Resnet3D.forward_features) both import these, and
# both use the same divide-then-subtract f32 op order so results are
# bit-identical either way.
NORM_DIVISOR = 127.5
NORM_OFFSET = -1.0


def normalize_to_array(img) -> np.ndarray:
    """uint8 PIL image or ndarray → float32 with mean 0.5 / std 0.5
    (range [-1, 1])."""
    arr = np.asarray(img, dtype=np.float32)
    return arr / NORM_DIVISOR + NORM_OFFSET


def resize_target(spatial_size: int) -> int:
    return math.floor(spatial_size * 1.15)
