"""Bbox round-trip and post_process_output tests (reference layout_utils.py)."""

import json

from PIL import Image

from dots_ocr_tpu.utils.boxes import (
    is_legal_bbox,
    post_process_cells,
    post_process_output,
    pre_process_bboxes,
)
from dots_ocr_tpu.utils.resize import smart_resize


def _img(w, h):
    return Image.new("RGB", (w, h), (255, 255, 255))


def test_post_process_cells_identity_when_same_size():
    # If the original image already sits on the smart_resize grid, scales are
    # 1.0 and coordinates pass through with int truncation only.
    origin = _img(1008, 812)
    cells = [{"bbox": [10, 20, 100, 200], "category": "Text", "text": "x"}]
    out = post_process_cells(origin, cells, input_width=1008, input_height=812)
    assert out[0]["bbox"] == [10, 20, 100, 200]
    # input is not mutated
    assert cells[0]["bbox"] == [10, 20, 100, 200]


def test_post_process_cells_rescale_truncation():
    # Original 2000x1600; model input is the smart-resized version.
    origin = _img(2000, 1600)
    ih, iw = smart_resize(1600, 2000)
    scale_x = iw / 2000
    scale_y = ih / 1600
    cells = [{"bbox": [99, 77, 501, 333], "category": "Text"}]
    out = post_process_cells(origin, cells, input_width=iw, input_height=ih)
    assert out[0]["bbox"] == [
        int(99 / scale_x),
        int(77 / scale_y),
        int(501 / scale_x),
        int(333 / scale_y),
    ]


def test_roundtrip_pre_then_post_close_to_identity():
    origin = _img(1920, 1080)
    ih, iw = smart_resize(1080, 1920)
    bbox = [[100, 200, 800, 900]]
    pre = pre_process_bboxes(origin, bbox, input_width=iw, input_height=ih)
    back = post_process_cells(
        origin, [{"bbox": pre[0]}], input_width=iw, input_height=ih
    )[0]["bbox"]
    # int truncation both ways: allow 1px+scale slack per coordinate
    for orig_coord, rt in zip(bbox[0], back):
        assert abs(orig_coord - rt) <= 3


def test_is_legal_bbox():
    assert is_legal_bbox([{"bbox": [0, 0, 1, 1]}])
    assert not is_legal_bbox([{"bbox": [5, 0, 5, 10]}])
    assert not is_legal_bbox([{"bbox": [0, 9, 10, 9]}])


def test_post_process_output_text_mode_passthrough():
    assert post_process_output("hello", "prompt_ocr", None, None) == "hello"


def test_post_process_output_valid_json():
    origin = _img(1008, 812)
    inp = _img(1008, 812)
    cells = [{"bbox": [1, 2, 3, 4], "category": "Text", "text": "t"}]
    out, filtered = post_process_output(
        json.dumps(cells), "prompt_layout_all_en", origin, inp
    )
    assert not filtered
    assert out[0]["category"] == "Text"


def test_post_process_output_salvage_path():
    origin = _img(1008, 812)
    inp = _img(1008, 812)
    broken = '[{"bbox": [1,2,3,4], "category": "Text", "text": "hello"}, {"bbox": [5,6'
    out, filtered = post_process_output(broken, "prompt_layout_all_en", origin, inp)
    assert filtered
    assert isinstance(out, str)
    assert "hello" in out
