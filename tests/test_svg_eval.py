"""SVG evaluation harness tests (eval/svg.py).

Covers the reference's SVG-eval capability (rasterize model SVG output and
score image similarity — /root/reference/requirements.txt:12 cairosvg,
README.md:447-467 UniSVG rows) using the bounded built-in renderer, since
cairosvg is absent here.
"""

import numpy as np
import pytest
from PIL import Image, ImageDraw

from dots_ocr_tpu.eval.svg import (
    SVGRenderError,
    extract_svg,
    render_svg,
    score_svg,
)


def _px(img, x, y):
    return img.getpixel((x, y))


class TestRenderPrimitives:
    def test_rect_fill(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100" width="100" height="100">'
            '<rect x="10" y="10" width="50" height="30" fill="#ff0000"/>'
            "</svg>"
        )
        assert img.size == (100, 100)
        assert _px(img, 30, 20) == (255, 0, 0)
        assert _px(img, 80, 80) == (255, 255, 255)

    def test_circle_and_named_color(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100"><circle cx="50" cy="50" r="20" '
            'fill="blue"/></svg>'
        )
        assert _px(img, 50, 50) == (0, 0, 255)
        assert _px(img, 5, 5) == (255, 255, 255)

    def test_line_stroke(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100"><line x1="0" y1="50" x2="100" '
            'y2="50" stroke="black" stroke-width="4"/></svg>'
        )
        assert _px(img, 50, 50) == (0, 0, 0)

    def test_polygon(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100"><polygon points="50,10 90,90 10,90" '
            'fill="rgb(0,128,0)"/></svg>'
        )
        assert _px(img, 50, 60) == (0, 128, 0)

    def test_ellipse(self):
        img = render_svg(
            '<svg viewBox="0 0 200 100"><ellipse cx="100" cy="50" rx="80" '
            'ry="30" fill="#00f"/></svg>'
        )
        assert _px(img, 100, 50) == (0, 0, 255)
        assert _px(img, 100, 10) == (255, 255, 255)

    def test_path_lines_and_close(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100">'
            '<path d="M 10 10 L 90 10 L 90 90 L 10 90 Z" fill="black"/>'
            "</svg>"
        )
        assert _px(img, 50, 50) == (0, 0, 0)

    def test_path_relative_and_curves(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100">'
            '<path d="m 10 50 c 0 -40 80 -40 80 0 q -40 40 -80 0 z" '
            'fill="purple"/></svg>'
        )
        assert _px(img, 50, 40) == (128, 0, 128)

    def test_path_arc(self):
        # Half-disc via an arc: filled above the chord midline.
        img = render_svg(
            '<svg viewBox="0 0 100 100">'
            '<path d="M 10 50 A 40 40 0 0 1 90 50 Z" fill="black"/></svg>'
        )
        assert _px(img, 50, 25) == (0, 0, 0)
        assert _px(img, 50, 75) == (255, 255, 255)

    def test_text_paints_ink(self):
        img = render_svg(
            '<svg viewBox="0 0 200 50"><text x="10" y="30" font-size="24" '
            'fill="black">Hello</text></svg>'
        )
        arr = np.asarray(img)
        assert (arr < 128).any(), "text should paint some dark pixels"


class TestGroupsTransformsStyle:
    def test_group_transform_translate(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100"><g transform="translate(40,40)">'
            '<rect x="0" y="0" width="20" height="20" fill="red"/></g></svg>'
        )
        assert _px(img, 50, 50) == (255, 0, 0)
        assert _px(img, 10, 10) == (255, 255, 255)

    def test_scale_and_rotate(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100">'
            '<rect x="10" y="10" width="10" height="10" fill="black" '
            'transform="scale(2)"/></svg>'
        )
        assert _px(img, 30, 30) == (0, 0, 0)
        img2 = render_svg(
            '<svg viewBox="0 0 100 100">'
            '<rect x="40" y="0" width="20" height="20" fill="black" '
            'transform="rotate(90 50 50)"/></svg>'
        )
        # rect rotated 90° about center lands on the right edge, mid-height
        assert _px(img2, 90, 50) == (0, 0, 0)

    def test_inherited_fill_and_style_attr(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100"><g fill="green">'
            '<rect x="0" y="0" width="50" height="50"/>'
            '<rect x="50" y="50" width="50" height="50" '
            'style="fill:#0000ff"/></g></svg>'
        )
        assert _px(img, 25, 25) == (0, 128, 0)
        assert _px(img, 75, 75) == (0, 0, 255)

    def test_opacity_blends_toward_background(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100"><rect x="0" y="0" width="100" '
            'height="100" fill="black" fill-opacity="0.5"/></svg>'
        )
        r, g, b = _px(img, 50, 50)
        assert 100 <= r <= 160 and r == g == b

    def test_fill_none_skips_paint(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100"><rect x="0" y="0" width="100" '
            'height="100" fill="none" stroke="none"/></svg>'
        )
        assert _px(img, 50, 50) == (255, 255, 255)


class TestRobustness:
    def test_doctype_rejected(self):
        with pytest.raises(SVGRenderError):
            render_svg('<!DOCTYPE svg [<!ENTITY x "y">]>'
                       '<svg viewBox="0 0 10 10"/>')

    def test_huge_canvas_clamped(self):
        img = render_svg('<svg width="100000" height="100000" '
                         'viewBox="0 0 100 100">'
                         '<rect width="100" height="100" fill="red"/></svg>')
        assert img.size[0] * img.size[1] <= 4096 * 4096

    def test_element_budget(self):
        body = '<rect width="1" height="1"/>' * 10_001
        with pytest.raises(SVGRenderError):
            render_svg(f'<svg viewBox="0 0 10 10">{body}</svg>')

    def test_truncated_svg_autoclosed(self):
        # Model output cut off mid-stream: unclosed <g> and <svg>.
        img = render_svg(
            '<svg viewBox="0 0 100 100"><g>'
            '<rect x="0" y="0" width="100" height="100" fill="black"/>'
        )
        assert _px(img, 50, 50) == (0, 0, 0)

    def test_truncated_mid_tag(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100">'
            '<rect x="0" y="0" width="100" height="100" fill="red"/>'
            '<rect x="1" y="2" wi'
        )
        assert _px(img, 50, 50) == (255, 0, 0)

    def test_empty_raises(self):
        with pytest.raises(SVGRenderError):
            render_svg("   ")

    def test_non_svg_root_raises(self):
        with pytest.raises(SVGRenderError):
            render_svg("<html><body>no</body></html>")

    def test_markdown_fenced_output_extracted(self):
        text = ("Here is the SVG:\n```svg\n"
                '<svg viewBox="0 0 10 10"><rect width="10" height="10" '
                'fill="black"/></svg>\n```\ndone')
        assert extract_svg(text).startswith("<svg")
        img = render_svg(text)
        assert _px(img, 5, 5) == (0, 0, 0)

    def test_garbage_numbers_dont_crash(self):
        img = render_svg(
            '<svg viewBox="0 0 100 100">'
            '<rect x="nan-ish" width="10" height="10" fill="red"/>'
            '<path d="M x y L 1e999 2"/>'
            '<circle cx="10" cy="10" r="-5" fill="blue"/></svg>'
        )
        assert img.size == (100, 100)


class TestScoring:
    def _target(self):
        img = Image.new("RGB", (100, 100), (255, 255, 255))
        d = ImageDraw.Draw(img)
        d.rectangle([10, 10, 60, 40], fill=(255, 0, 0))
        d.ellipse([30, 50, 70, 90], fill=(0, 0, 255))
        return img

    def _matching_svg(self):
        return (
            '<svg viewBox="0 0 100 100" width="100" height="100">'
            '<rect x="10" y="10" width="51" height="31" fill="red"/>'
            '<ellipse cx="50" cy="70" rx="20" ry="20" fill="blue"/></svg>'
        )

    def test_good_match_scores_high(self):
        res = score_svg(self._matching_svg(), self._target())
        assert res["renderable"] == 1.0
        assert res["score"] > 0.85

    def test_mismatch_scores_lower(self):
        bad = ('<svg viewBox="0 0 100 100"><rect width="100" height="100" '
               'fill="black"/></svg>')
        good = score_svg(self._matching_svg(), self._target())["score"]
        assert score_svg(bad, self._target())["score"] < good

    def test_unrenderable_scores_zero(self):
        res = score_svg("not svg at all", self._target())
        assert res == {"renderable": 0.0, "l1": 1.0, "ssim": 0.0,
                       "score": 0.0}

    def test_self_similarity_is_near_perfect(self):
        svg = self._matching_svg()
        rendered = render_svg(svg)
        res = score_svg(svg, rendered)
        assert res["score"] > 0.99

    def test_scores_are_plain_floats(self):
        res = score_svg(self._matching_svg(), self._target())
        for v in res.values():
            assert isinstance(v, float)


def test_composite_falls_back_without_clip():
    """Zero-egress env: CLIP weights can't load, so the composite must
    equal the pixel score with clip reported absent (-1)."""
    from PIL import Image

    from dots_ocr_tpu.eval.svg import score_svg, score_svg_composite

    svg = ('<svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">'
           '<rect x="0" y="0" width="64" height="64" fill="#ffffff"/>'
           '<rect x="8" y="8" width="20" height="20" fill="#204080"/></svg>')
    target = Image.new("RGB", (64, 64), (255, 255, 255))
    base = score_svg(svg, target)
    comp = score_svg_composite(svg, target)
    assert comp["renderable"] == 1.0
    if comp["clip"] == -1.0:  # offline build env (the expected branch)
        assert abs(comp["composite"] - base["score"]) < 1e-9
    else:  # CLIP available (weights-day env)
        assert 0.0 <= comp["composite"] <= 1.0


def test_composite_unrenderable_scores_zero():
    from PIL import Image

    from dots_ocr_tpu.eval.svg import score_svg_composite

    comp = score_svg_composite("not svg at all", Image.new("RGB", (32, 32)))
    assert comp["composite"] == 0.0 and comp["clip"] == -1.0
