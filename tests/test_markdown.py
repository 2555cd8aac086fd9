"""Markdown emission snapshots (reference format_transformer.py semantics)."""

from PIL import Image

from dots_ocr_tpu.utils.markdown import (
    clean_latex_preamble,
    clean_text,
    fix_streamlit_formulas,
    get_formula_in_markdown,
    has_latex_markdown,
    layoutjson2md,
)


def test_has_latex_markdown():
    assert has_latex_markdown("$$x$$")
    assert has_latex_markdown("$x+y$")
    assert has_latex_markdown("\\begin{align}x\\end{align}")
    assert has_latex_markdown("\\frac{a}{b}")
    assert has_latex_markdown("\\alpha")
    assert has_latex_markdown("\\[x\\]")
    assert not has_latex_markdown("plain text")
    assert not has_latex_markdown(123)


def test_formula_already_wrapped():
    assert get_formula_in_markdown("$$E=mc^2$$") == "$$\nE=mc^2\n$$"
    # inner $ present -> returned unchanged
    assert get_formula_in_markdown("$$a$b$$") == "$$a$b$$"


def test_formula_bracket_form():
    assert get_formula_in_markdown("\\[x+y\\]") == "$$\nx+y\n$$"


def test_formula_embedded_brackets_unchanged():
    s = "text \\[x\\] more"
    assert get_formula_in_markdown(s) == s


def test_formula_inline_unchanged():
    s = "where $x$ is small"
    assert get_formula_in_markdown(s) == s


def test_formula_plain_text_unchanged():
    assert get_formula_in_markdown("no math here") == "no math here"


def test_formula_bare_latex_wrapped():
    assert get_formula_in_markdown("\\frac{a}{b}") == "$$\n\\frac{a}{b}\n$$"


def test_formula_preamble_stripped():
    out = get_formula_in_markdown("\\usepackage{amsmath}\\frac{a}{b}")
    assert "usepackage" not in out
    assert out.startswith("$$")


def test_clean_latex_preamble():
    s = "\\documentclass{article}\\usepackage[utf8]{inputenc}\\begin{document}x\\end{document}"
    assert clean_latex_preamble(s) == "x"


def test_clean_text():
    assert clean_text("  hi  ") == "hi"
    assert clean_text("`$x$`") == "$x$"
    assert clean_text("") == ""


def test_layoutjson2md_basic():
    img = Image.new("RGB", (100, 100), (200, 200, 200))
    cells = [
        {"bbox": [0, 0, 10, 10], "category": "Title", "text": "# Heading"},
        {"bbox": [0, 10, 10, 20], "category": "Page-header", "text": "hdr"},
        {"bbox": [0, 20, 50, 50], "category": "Picture"},
        {"bbox": [0, 50, 10, 60], "category": "Formula", "text": "\\frac{1}{2}"},
        {"bbox": [0, 60, 10, 70], "category": "Page-footer", "text": "ftr"},
    ]
    md = layoutjson2md(img, cells)
    assert "# Heading" in md
    assert "hdr" in md
    assert "![](data:image/png;base64," in md
    assert "$$\n\\frac{1}{2}\n$$" in md
    blocks = md.split("\n\n")
    assert len(blocks) == 5

    md_nohf = layoutjson2md(img, cells, no_page_hf=True)
    assert "hdr" not in md_nohf and "ftr" not in md_nohf
    assert len(md_nohf.split("\n\n")) == 3


def test_fix_streamlit_formulas():
    assert fix_streamlit_formulas("$$x$$") == "$$\nx\n$$"
    assert fix_streamlit_formulas("$$\nx\n$$") == "$$\nx\n$$"
    assert fix_streamlit_formulas("a $$x$$ b $$y$$") == "a $$\nx\n$$ b $$\ny\n$$"
