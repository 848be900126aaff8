"""Bounding-box repair utilities.

Semantics match the reference's ``fix_box`` chain of hacks exactly
(``src/utils/data_utils.py:205-231``): boxes are int-cast, non-negative,
corner-ordered, clamped to the frame, and de-degenerated. These quirks are
baked into the released checkpoints' training data, so they must be preserved
bit-for-bit for parity.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def fix_box(box: Sequence[float], video_size: Tuple[int, int]) -> List[int]:
    """Repair one ``[x1, y1, x2, y2]`` box.

    ``video_size`` is ``(height, width)`` — the same (surprising) order the
    reference passes at ``src/modelling/datasets.py:79-81``.
    """
    height, width = video_size
    x1, y1, x2, y2 = (max(0, int(v)) for v in box)
    # Re-order swapped corners.
    if x1 > x2:
        x1, x2 = x2, x1
    if y1 > y2:
        y1, y2 = y2, y1
    # Clamp to the frame (x against width, y against height).
    x1 = min(x1, width - 1)
    x2 = min(x2, width - 1)
    y1 = min(y1, height - 1)
    y2 = min(y2, height - 1)
    # De-degenerate zero-area boxes.
    if x1 == x2 == 0:
        x2 = 1
    if y1 == y2 == 0:
        y2 = 1
    if x1 == x2:
        x1 -= 1
    if y1 == y2:
        y1 -= 1
    return [x1, y1, x2, y2]


# --- auxiliary box transforms (reference data_utils.py:140-202; unused by
# the reference's main path but part of its public surface) ----------------


def valid_box(box: Sequence[float], frame_size: int) -> bool:
    """False when the box lies entirely outside a frame_size² crop
    (reference data_utils.py:188-197)."""
    x1, y1, x2, y2 = box
    if x1 >= frame_size and x2 >= frame_size:
        return False
    if x1 <= 0 and x2 <= 0:
        return False
    if y1 >= frame_size and y2 >= frame_size:
        return False
    if y1 <= 0 and y2 <= 0:
        return False
    return True


def clamp_box(box: Sequence[float], frame_size: int) -> List[float]:
    """Clamp all coordinates into [0, frame_size] (reference data_utils.py:200-202)."""
    return [max(0, min(v, frame_size)) for v in box]


def resize_box(box: Sequence[float], scale_factor: float) -> List[float]:
    """Scale box coordinates (reference ResizeBoxes, data_utils.py:140-146)."""
    return [v * scale_factor for v in box]


def translate_box(box: Sequence[float], top: int, left: int) -> List[float]:
    """Shift a box into a crop's coordinate frame (reference
    CenterCropBoxes/RandomCropBoxes, data_utils.py:149-185)."""
    x1, y1, x2, y2 = box
    return [x1 - left, y1 - top, x2 - left, y2 - top]
