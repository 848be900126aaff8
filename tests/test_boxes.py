"""fix_box edge cases (reference src/utils/data_utils.py:205-231)."""

from stlt_tpu.data.boxes import fix_box

HW = (240, 320)  # (height, width)


def test_normal_box_unchanged():
    assert fix_box([10, 20, 100, 200], HW) == [10, 20, 100, 200]


def test_float_cast():
    assert fix_box([10.7, 20.2, 100.9, 200.1], HW) == [10, 20, 100, 200]


def test_negative_clamped_to_zero():
    assert fix_box([-5, -3, 50, 60], HW) == [0, 0, 50, 60]


def test_swapped_corners():
    assert fix_box([100, 200, 10, 20], HW) == [10, 20, 100, 200]


def test_clamp_to_frame():
    # x clamps against width (320), y against height (240); the collapsed
    # box then gets de-degenerated (x1 -= 1, y1 -= 1)
    assert fix_box([400, 300, 500, 350], HW) == [318, 238, 319, 239]


def test_degenerate_at_origin():
    assert fix_box([0, 0, 0, 0], HW) == [0, 0, 1, 1]


def test_degenerate_nonzero():
    assert fix_box([50, 60, 50, 60], HW) == [49, 59, 50, 60]


def test_degenerate_after_clamp():
    # both corners beyond the frame collapse, then de-degenerate
    assert fix_box([400, 60, 500, 80], HW) == [318, 60, 319, 80]


def test_valid_box():
    from stlt_tpu.data.boxes import valid_box

    assert valid_box([10, 10, 50, 50], 112)
    assert not valid_box([120, 10, 130, 50], 112)  # fully right of crop
    assert not valid_box([-20, 10, -5, 50], 112)   # fully left
    assert not valid_box([10, 115, 50, 120], 112)  # fully below
    assert valid_box([100, 10, 120, 50], 112)      # straddles the edge


def test_clamp_resize_translate():
    from stlt_tpu.data.boxes import clamp_box, resize_box, translate_box

    assert clamp_box([-5, 10, 130, 50], 112) == [0, 10, 112, 50]
    assert resize_box([2, 4, 6, 8], 0.5) == [1, 2, 3, 4]
    assert translate_box([10, 20, 30, 40], top=5, left=8) == [2, 15, 22, 35]
