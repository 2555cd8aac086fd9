"""Image loading / conversion / base64 tests (reference image_utils.py)."""

import pytest
from PIL import Image

from dots_ocr_tpu.utils.image_io import (
    base64_to_pil,
    fetch_image,
    get_input_dimensions,
    pil_to_base64,
    to_rgb,
)
from dots_ocr_tpu.utils.consts import MAX_PIXELS, MIN_PIXELS


def test_base64_roundtrip():
    img = Image.new("RGB", (17, 13), (10, 200, 30))
    url = pil_to_base64(img)
    assert url.startswith("data:image/png;base64,")
    back = base64_to_pil(url)
    assert back.size == (17, 13)
    assert back.convert("RGB").getpixel((0, 0)) == (10, 200, 30)


def test_to_rgb_composites_alpha_on_white():
    rgba = Image.new("RGBA", (4, 4), (255, 0, 0, 0))  # fully transparent red
    rgb = to_rgb(rgba)
    assert rgb.mode == "RGB"
    assert rgb.getpixel((0, 0)) == (255, 255, 255)

    semi = Image.new("RGBA", (4, 4), (0, 0, 0, 128))
    out = to_rgb(semi)
    # ~50% black over white ≈ mid gray
    assert abs(out.getpixel((0, 0))[0] - 127) <= 2


def test_to_rgb_palette():
    p = Image.new("P", (4, 4))
    assert to_rgb(p).mode == "RGB"


def test_fetch_image_no_bounds_no_resize():
    img = Image.new("RGB", (100, 50))
    out = fetch_image(img)
    assert out.size == (100, 50)


def test_fetch_image_with_bounds_snaps_to_grid():
    img = Image.new("RGB", (1000, 800))
    out = fetch_image(img, min_pixels=MIN_PIXELS, max_pixels=MAX_PIXELS)
    assert out.width % 28 == 0 and out.height % 28 == 0
    assert out.size == (1008, 812)  # (w, h) from smart_resize(800, 1000)


def test_fetch_image_explicit_dims():
    img = Image.new("RGB", (100, 100))
    out = fetch_image(img, resized_height=300, resized_width=400)
    assert out.height % 28 == 0 and out.width % 28 == 0


def test_fetch_image_from_path_and_file_uri(tmp_path):
    p = tmp_path / "t.png"
    Image.new("RGB", (64, 64), (1, 2, 3)).save(p)
    assert fetch_image(str(p)).size == (64, 64)
    assert fetch_image(f"file://{p}").size == (64, 64)


def test_fetch_image_from_data_url():
    url = pil_to_base64(Image.new("RGB", (32, 32)))
    assert fetch_image(url).size == (32, 32)


def test_fetch_image_none_raises():
    with pytest.raises(AssertionError):
        fetch_image(None)


def test_get_input_dimensions():
    img = Image.new("RGB", (1000, 800))
    w, h = get_input_dimensions(img, MIN_PIXELS, MAX_PIXELS)
    assert (w, h) == (1008, 812)


def test_visualize_draws():
    from dots_ocr_tpu.utils.visualize import draw_layout_on_image

    img = Image.new("RGB", (200, 200), (255, 255, 255))
    cells = [
        {"bbox": [10, 10, 100, 100], "category": "Text"},
        {"bbox": [110, 10, 190, 100], "category": "Table"},
        {"bbox": [50, 120, 20, 180], "category": "NotACategory"},  # inverted box
    ]
    out = draw_layout_on_image(img, cells)
    assert out.size == (200, 200)
    assert out.getpixel((50, 50)) != (255, 255, 255)  # translucent fill applied
