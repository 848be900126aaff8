"""Frame-sampler semantics tests (reference src/utils/data_utils.py:32-90)."""

import numpy as np

from stlt_tpu.data.samplers import (
    get_test_layout_indices,
    sample_appearance_indices,
    sample_train_layout_indices,
)


class TestTestLayoutIndices:
    def test_long_clip_segment_centers(self):
        # 40 frames, 16 to sample: tick = 2.5 → int(1.25 + 2.5 * i)
        got = get_test_layout_indices(16, 40)
        expected = [int(2.5 / 2.0 + 2.5 * i) for i in range(16)]
        assert got == expected
        assert len(got) == 16

    def test_short_clip_returns_all_frames(self):
        # Fewer frames than requested → all frames, shorter result.
        assert get_test_layout_indices(16, 5) == [0, 1, 2, 3, 4]

    def test_exact_length(self):
        assert get_test_layout_indices(16, 16) == list(range(16))

    def test_known_values(self):
        # Golden vectors computed from the reference implementation.
        assert get_test_layout_indices(4, 10) == [1, 3, 6, 8]
        assert get_test_layout_indices(8, 100) == [6, 18, 31, 43, 56, 68, 81, 93]


class TestTrainLayoutIndices:
    def test_always_returns_requested_count(self):
        rng = np.random.default_rng(0)
        for frames in (1, 5, 16, 17, 100):
            got = sample_train_layout_indices(16, frames, rng=rng)
            assert len(got) == 16
            assert all(0 <= g < frames for g in got)

    def test_stratified_within_segments(self):
        rng = np.random.default_rng(1)
        # 64 frames / 16 samples → segment 4: index i must lie in [4i, 4(i+1))
        got = sample_train_layout_indices(16, 64, rng=rng)
        for i, g in enumerate(got):
            assert 4 * i <= g < 4 * (i + 1)

    def test_monotonic_nondecreasing(self):
        rng = np.random.default_rng(2)
        for _ in range(20):
            got = sample_train_layout_indices(16, 37, rng=rng)
            assert got == sorted(got)


class TestAppearanceIndices:
    def test_eval_long_clip_centered_window(self):
        # 100 frames, 32 to sample, stride 2 → window 64, offset 18
        got = sample_appearance_indices(32, 100, train=False)
        assert got == list(range(18, 82, 2))

    def test_eval_short_clip_linspace(self):
        got = sample_appearance_indices(32, 20, train=False)
        expected = [int(max(round(p), 0)) for p in np.linspace(0, 18, 32)]
        assert got == expected

    def test_train_long_clip_window(self):
        rng = np.random.default_rng(3)
        got = sample_appearance_indices(32, 100, train=True, rng=rng)
        assert len(got) == 32
        assert got[1] - got[0] == 2
        assert all(0 <= g < 100 for g in got)

    def test_train_short_clip_sorted_choice(self):
        rng = np.random.default_rng(4)
        got = sample_appearance_indices(8, 16, train=True, rng=rng)
        assert len(got) == 8
        assert got == sorted(got)
        assert len(set(got)) == 8  # replace=False
        assert all(0 <= g < 14 for g in got)  # range(nr - 2)

    def test_single_frame_clip_no_negatives(self):
        got = sample_appearance_indices(8, 1, train=False)
        assert all(g == 0 for g in got)
