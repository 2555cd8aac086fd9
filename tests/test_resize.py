"""Golden-value and property tests for the smart_resize resolution policy.

Golden values are computed by hand from the algorithm spec
(reference dots_ocr/utils/image_utils.py:29-63).
"""

import math

import pytest

from dots_ocr_tpu.utils.consts import IMAGE_FACTOR, MAX_PIXELS, MIN_PIXELS
from dots_ocr_tpu.utils.resize import (
    ceil_by_factor,
    floor_by_factor,
    num_vision_tokens,
    round_by_factor,
    smart_resize,
)


def test_factor_utils():
    assert round_by_factor(27, 28) == 28
    assert round_by_factor(14, 28) == 0  # banker's rounding: 0.5 -> 0
    assert round_by_factor(43, 28) == 56
    assert ceil_by_factor(1, 28) == 28
    assert ceil_by_factor(28, 28) == 28
    assert ceil_by_factor(29, 28) == 56
    assert floor_by_factor(55, 28) == 28
    assert floor_by_factor(56, 28) == 56


# Hand-computed golden values for a grid of inputs.
GOLDEN = [
    # (height, width) -> (h_bar, w_bar) with defaults
    ((28, 28), (56, 56)),          # 784 px < min 3136 -> scaled up 2x
    ((1000, 800), (1008, 812)),    # plain round to the 28 grid
    ((56, 56), (56, 56)),          # exactly min_pixels: identity
    ((100, 100), (112, 112)),      # rounds up to 112
    ((14, 14), (56, 56)),          # tiny image scaled up to min_pixels
    ((5000, 5000), (3360, 3360)),  # 25MP scaled down under max_pixels
    ((10000, 1000), (9996, 1008)), # tall page: 10MP fits under the cap
]


def _expected(h, w, factor=28, min_pixels=MIN_PIXELS, max_pixels=MAX_PIXELS):
    # Independent reimplementation of the spec for cross-checking goldens.
    hb = max(factor, round(h / factor) * factor)
    wb = max(factor, round(w / factor) * factor)
    if hb * wb > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        hb = max(factor, math.floor(h / beta / factor) * factor)
        wb = max(factor, math.floor(w / beta / factor) * factor)
    elif hb * wb < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
        if hb * wb > max_pixels:
            beta = math.sqrt((hb * wb) / max_pixels)
            hb = max(factor, math.floor(hb / beta / factor) * factor)
            wb = max(factor, math.floor(wb / beta / factor) * factor)
    return hb, wb


@pytest.mark.parametrize("hw,expected", GOLDEN)
def test_smart_resize_golden(hw, expected):
    h, w = hw
    got = smart_resize(h, w)
    assert got == _expected(h, w), f"{hw}: spec cross-check failed"
    assert got == expected, f"{hw}: golden mismatch (got {got})"


def test_small_image_scales_to_min():
    h, w = smart_resize(28, 28)
    assert h * w >= MIN_PIXELS
    assert h % 28 == 0 and w % 28 == 0


def test_invariants_grid():
    for h in [28, 57, 100, 399, 1024, 2000, 3333, 6000, 9999]:
        for w in [28, 64, 141, 800, 1920, 4000, 8000]:
            if max(h, w) / min(h, w) > 200:
                continue
            hb, wb = smart_resize(h, w)
            assert hb % IMAGE_FACTOR == 0 and wb % IMAGE_FACTOR == 0
            assert hb * wb <= MAX_PIXELS, (h, w, hb, wb)
            # min_pixels holds unless max_pixels forced it lower
            if hb * wb < MIN_PIXELS:
                assert False, f"below min: {(h, w)} -> {(hb, wb)}"
            # idempotent
            assert smart_resize(hb, wb) == (hb, wb)


def test_max_pixels_priority_over_min():
    # Degenerate bounds: min > max forces the max to win.
    hb, wb = smart_resize(100, 100, min_pixels=3136 * 100, max_pixels=3136 * 4)
    assert hb * wb <= 3136 * 4


def test_aspect_ratio_guard():
    with pytest.raises(ValueError):
        smart_resize(10000, 28)


def test_num_vision_tokens():
    # 1036x1036 -> 37x37 grid of 28px cells
    assert num_vision_tokens(1036, 1036) == 37 * 37
    assert num_vision_tokens(56, 56) == 4
