"""PDF ingestion tests: the builtin minipdf backend + rendering policy.

Fixtures are generated on the fly: PIL writes real image-based PDFs
(DCT/Flate), and a hand-built PDF exercises text rendering and rect fills.
"""

import io
import os
import zlib

import pytest
from PIL import Image

from dots_ocr_tpu.ingest import minipdf
from dots_ocr_tpu.ingest.pdf import (
    get_backend,
    load_images_from_pdf,
    render_page_image,
    upsample_image_to_dpi,
)

REFERENCE_PDF = "/root/reference/demo/demo_pdf1.pdf"


def _image_pdf_bytes(colors, size=(144, 72)):
    """Multi-page image PDF produced by PIL (JPEG-in-PDF)."""
    pages = [Image.new("RGB", size, c) for c in colors]
    buf = io.BytesIO()
    pages[0].save(buf, format="PDF", save_all=True, append_images=pages[1:], resolution=72)
    return buf.getvalue()


def _text_pdf_bytes():
    """Minimal hand-built PDF: one page, Helvetica text + a filled rect."""
    content = (
        b"1 0 0 RG 0.9 0.1 0.1 rg 20 700 100 50 re f\n"
        b"BT /F1 24 Tf 0 0 0 rg 72 720 Td (Hello PDF) Tj ET\n"
        b"BT /F1 12 Tf 72 690 Td [(kerned) -200 (text)] TJ ET\n"
    )
    stream = zlib.compress(content)
    objs = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    )
    objs.append(
        b"<< /Length " + str(len(stream)).encode() + b" /Filter /FlateDecode >>\nstream\n"
        + stream + b"\nendstream"
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_pos = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF".encode()
    )
    return out.getvalue()


def test_builtin_backend_selected():
    assert get_backend().name == "builtin"


def test_image_pdf_pages_and_colors():
    data = _image_pdf_bytes([(255, 0, 0), (0, 255, 0), (0, 0, 255)])
    doc = minipdf.open_pdf(data)
    assert doc.page_count == 3
    img = minipdf.render_page(doc, 1, dpi=72)
    assert img.size == (144, 72)
    r, g, b = img.getpixel((72, 36))
    assert g > 150 and r < 100 and b < 100  # page 2 is green (JPEG lossy)


def test_image_pdf_dpi_scaling():
    data = _image_pdf_bytes([(10, 10, 10)], size=(100, 50))
    doc = minipdf.open_pdf(data)
    img = minipdf.render_page(doc, 0, dpi=144)
    assert img.size == (200, 100)


def test_load_images_from_pdf_page_range(tmp_path):
    data = _image_pdf_bytes([(255, 0, 0), (0, 255, 0), (0, 0, 255)])
    p = tmp_path / "t.pdf"
    p.write_bytes(data)
    imgs = load_images_from_pdf(str(p), dpi=72)
    assert len(imgs) == 3
    imgs = load_images_from_pdf(str(p), dpi=72, start_page_id=1, end_page_id=1)
    assert len(imgs) == 1
    imgs = load_images_from_pdf(str(p), dpi=72, end_page_id=99)
    assert len(imgs) == 3


def test_4500px_fallback(tmp_path):
    # A 2000x1000pt page at 200dpi would be 5556px wide -> falls back to 72dpi.
    img = Image.new("RGB", (2000, 1000), (0, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PDF", resolution=72)
    doc = minipdf.open_pdf(buf.getvalue())
    backend = get_backend()
    out = render_page_image(doc, 0, target_dpi=200, backend=backend)
    assert max(out.size) <= 4500
    assert out.size == (2000, 1000)


def test_text_pdf_renders_dark_pixels():
    doc = minipdf.open_pdf(_text_pdf_bytes())
    assert doc.page_count == 1
    img = minipdf.render_page(doc, 0, dpi=72)
    assert img.size == (612, 792)
    # The filled red rect occupies (20,42)-(120,92) in device coords.
    r, g, b = img.getpixel((70, 67))
    assert r > 180 and g < 100
    # Text drew something dark near the baseline area.
    region = img.crop((60, 40, 300, 110)).convert("L")
    assert min(region.getdata()) < 128


@pytest.mark.skipif(not os.path.exists(REFERENCE_PDF), reason="reference PDF not present")
def test_reference_demo_pdf_parses():
    doc = minipdf.open_pdf(REFERENCE_PDF)
    assert doc.page_count == 2
    img = minipdf.render_page(doc, 0, dpi=72)
    assert img.width > 100 and img.height > 100
    # The page must not be blank: text-bearing PDF renders dark pixels.
    gray = img.convert("L")
    dark = sum(1 for v in gray.getdata() if v < 100)
    assert dark > 100


def test_upsample_image_to_dpi():
    img = Image.new("RGB", (720, 360))
    out = upsample_image_to_dpi(img, target_dpi=200)
    assert out.size == (2000, 1000)
    # 4500px guard: stays at original size
    big = Image.new("RGB", (2000, 2000))
    out = upsample_image_to_dpi(big, target_dpi=200)
    assert out.size == (2000, 2000)
