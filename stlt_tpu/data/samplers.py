"""Frame-index samplers.

Semantics match the reference exactly (they determine which frames are read
and therefore eval parity): ``src/utils/data_utils.py:32-90``, which itself
ports the Something-Else repo's samplers. Randomness is drawn from an explicit
``numpy.random.Generator`` instead of the global numpy RNG so the input
pipeline is reproducible and worker-shardable; the *distribution* of sampled
indices matches the reference.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def sample_train_layout_indices(
    num_to_sample: int,
    num_video_frames: int,
    rng: Optional[np.random.Generator] = None,
) -> List[int]:
    """Jittered-stratified training sampler (reference data_utils.py:32-45).

    Splits the video into ``num_to_sample`` equal segments and picks one
    uniformly-jittered index per segment.
    """
    if rng is None:
        rng = np.random.default_rng()
    segment = num_video_frames / num_to_sample
    if segment > 0:
        starts = np.arange(num_to_sample) * segment
        jitter = rng.uniform(0.0, segment, size=num_to_sample)
        picked = np.floor(starts + jitter)
    elif num_video_frames > num_to_sample:  # unreachable for >0 frames; kept for parity
        picked = np.sort(rng.integers(0, num_video_frames, size=num_to_sample))
    else:
        picked = np.arange(num_video_frames)
    return [int(p) for p in picked]


def get_test_layout_indices(num_to_sample: int, num_video_frames: int) -> List[int]:
    """Deterministic eval sampler: segment centers (reference data_utils.py:48-56).

    Note: when the clip has fewer frames than requested, *all* frames are
    returned (the result is shorter than ``num_to_sample``) — variable eval
    lengths are handled downstream by padding + masks.
    """
    if num_video_frames > num_to_sample:
        tick = num_video_frames / num_to_sample
        picked = [int(tick / 2.0 + tick * i) for i in range(num_to_sample)]
    else:
        picked = list(range(num_video_frames))
    return [int(p) for p in picked]


def sample_appearance_indices(
    num_to_sample: int,
    num_video_frames: int,
    train: bool,
    sample_rate: int = 2,
    rng: Optional[np.random.Generator] = None,
) -> List[int]:
    """RGB-frame sampler (reference data_utils.py:59-90).

    Long clips: a stride-``sample_rate`` window (random offset in train,
    centered in eval). Short clips: linspace / random-sorted-choice over
    ``[0, num_video_frames - 2]``.
    """
    if rng is None:
        rng = np.random.default_rng()
    window = num_to_sample * sample_rate
    if num_video_frames > window:
        if train:
            offset = int(rng.integers(0, num_video_frames - window))
        else:
            offset = (num_video_frames - window) // 2
        picked = list(range(offset, offset + window, sample_rate))
    else:
        if train and num_video_frames - 2 >= num_to_sample:
            picked = np.sort(
                rng.choice(num_video_frames - 2, size=num_to_sample, replace=False)
            ).tolist()
        else:
            picked = [round(p) for p in np.linspace(0, num_video_frames - 2, num_to_sample)]
    # Guard against negative indices when num_video_frames == 1
    # (same clamp as reference data_utils.py:88).
    return [int(max(p, 0)) for p in picked]
