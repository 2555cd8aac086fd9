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


# ---------------------------------------------------------------------------
# Embedded-TrueType glyph rendering fidelity (VERDICT r2 item 8)
# ---------------------------------------------------------------------------

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def _type0_pdf_bytes(
    text, font_path, size=24, pos=(50, 120), page=(300, 160), cff=False
):
    """Hand-built PDF embedding ``font_path`` as a Type0/Identity-H CID font
    and showing ``text`` by GLYPH ID — the dominant embedded-font class in
    real documents, and the one PIL cannot render (glyph-id addressing).
    ``cff=True`` embeds as CIDFontType0 + FontFile3/OpenType (CFF
    outlines); default is CIDFontType2 + FontFile2 (TrueType)."""
    from PIL import ImageFont

    from dots_ocr_tpu.ingest.ttf import load_glyph_font

    font_bytes = open(font_path, "rb").read()
    ttf = load_glyph_font(font_bytes)
    pil = ImageFont.truetype(font_path, 1000)
    gids = [ttf.glyph_id_for_char(c) for c in text]
    hexstr = "".join(f"{g:04X}" for g in gids).encode()
    # Per-CID widths from PIL advances at 1000px (= PDF width units).
    w_entries = " ".join(
        f"{g} [{pil.getlength(c):.0f}]" for g, c in zip(gids, text)
    ).encode()

    content = (
        b"BT /F1 " + str(size).encode() + b" Tf 0 0 0 rg "
        + f"{pos[0]} {pos[1]}".encode() + b" Td <" + hexstr + b"> Tj ET\n"
    )
    stream = zlib.compress(content)
    ff = zlib.compress(font_bytes)

    objs = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 "
        + f"{page[0]} {page[1]}".encode()
        + b"] /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
    )
    objs.append(
        b"<< /Length " + str(len(stream)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream"
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Test "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>"
    )
    if cff:
        objs.append(
            b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Test "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /FontDescriptor 7 0 R "
            b"/DW 500 /W [" + w_entries + b"] >>"
        )
        objs.append(
            b"<< /Type /FontDescriptor /FontName /Test /Flags 4 "
            b"/FontBBox [-100 -300 1300 1100] /ItalicAngle 0 /Ascent 900 "
            b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile3 8 0 R >>"
        )
        objs.append(
            b"<< /Length " + str(len(ff)).encode()
            + b" /Filter /FlateDecode /Subtype /OpenType >>\nstream\n" + ff
            + b"\nendstream"
        )
    else:
        objs.append(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Test "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /FontDescriptor 7 0 R /CIDToGIDMap /Identity "
            b"/DW 500 /W [" + w_entries + b"] >>"
        )
        objs.append(
            b"<< /Type /FontDescriptor /FontName /Test /Flags 4 "
            b"/FontBBox [-100 -300 1300 1100] /ItalicAngle 0 /Ascent 900 "
            b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile2 8 0 R >>"
        )
        objs.append(
            b"<< /Length " + str(len(ff)).encode()
            + b" /Filter /FlateDecode /Length1 "
            + str(len(font_bytes)).encode() + b" >>\nstream\n" + ff
            + b"\nendstream"
        )

    out = io.BytesIO()
    out.write(b"%PDF-1.5\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs) + 1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode()
        + b"\n%%EOF\n"
    )
    return out.getvalue()


@pytest.mark.skipif(not os.path.exists(DEJAVU), reason="needs DejaVu fonts")
def test_type0_glyph_rendering_matches_freetype():
    """Glyph-ID text through the builtin rasterizer must match FreeType's
    rendering of the same string within a QUANTIFIED ink-IoU bound — the
    measured divergence envelope of the builtin backend's text raster
    (remaining diff: hinting + antialiasing policy)."""
    import numpy as np
    from PIL import ImageDraw, ImageFont

    text = "Hello TPU glyphs"
    size, pos, page = 24, (20, 60), (300, 100)
    data = _type0_pdf_bytes(text, DEJAVU, size=size, pos=pos, page=page)
    doc = minipdf.open_pdf(data)
    got = minipdf.render_page(doc, 0, dpi=144)  # 2x scale

    # FreeType ground truth at the same geometry (PDF y-up -> PIL y-down).
    scale = 144 / 72.0
    ref = Image.new("RGB", got.size, (255, 255, 255))
    d = ImageDraw.Draw(ref)
    pf = ImageFont.truetype(DEJAVU, int(size * scale))
    d.text((pos[0] * scale, got.size[1] - pos[1] * scale), text,
           font=pf, fill=(0, 0, 0), anchor="ls")

    a = np.asarray(got.convert("L")) < 128
    b = np.asarray(ref.convert("L")) < 128
    assert a.any(), "builtin backend rendered no ink for Type0 text"
    iou = (a & b).sum() / max(1, (a | b).sum())
    # Documented bound: >= 0.6 ink IoU vs FreeType at 2x scale (measured
    # ~0.75-0.9; single-glyph IoU ~0.9, string-level adds advance+rounding
    # differences). A ToUnicode-approximate fallback (PIL cmap lookup of a
    # glyph-id string) scores ~0 here.
    assert iou >= 0.6, f"ink IoU {iou:.3f} below the 0.6 fidelity bound"


@pytest.mark.skipif(not os.path.exists(DEJAVU), reason="needs DejaVu fonts")
def test_type0_cid_to_gid_stream_map():
    """A /CIDToGIDMap STREAM (CID != GID) must be honored: encode the text
    with CIDs 1..N mapped to the real glyph ids via the stream."""
    import numpy as np

    from dots_ocr_tpu.ingest.ttf import TrueTypeFont

    text = "Map"
    font_bytes = open(DEJAVU, "rb").read()
    ttf = TrueTypeFont(font_bytes)
    gids = [ttf.glyph_id_for_char(c) for c in text]
    # cid i+1 -> gids[i]
    table = bytearray(2 * (len(gids) + 1))
    for i, g in enumerate(gids, start=1):
        table[2 * i] = g >> 8
        table[2 * i + 1] = g & 0xFF
    data = _type0_pdf_bytes(text, DEJAVU)
    # Patch: CIDToGIDMap stream as object 9, referenced from object 6.
    mapped_hex = "".join(f"{i:04X}" for i in range(1, len(gids) + 1))
    orig_hex = "".join(f"{g:04X}" for g in gids)
    data = data.replace(orig_hex.encode(), mapped_hex.encode())
    comp = zlib.compress(bytes(table))
    extra = (
        b"9 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n"
    )
    data = data.replace(b"/CIDToGIDMap /Identity", b"/CIDToGIDMap 9 0 R")
    data = data.replace(b"\ntrailer\n", b"\n" + extra + b"trailer\n")

    doc = minipdf.open_pdf(data)
    img = minipdf.render_page(doc, 0, dpi=144)
    ink = (np.asarray(img.convert("L")) < 128).sum()
    assert ink > 50, "stream CIDToGIDMap produced no glyph ink"


# ---------------------------------------------------------------------------
# Embedded-CFF glyph rendering (FontFile3 / OpenType-CFF, VERDICT r2 item 5)
# ---------------------------------------------------------------------------

OTF_CFF = (
    "/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/fonts/"
    "test_fixed.otf"
)


@pytest.mark.skipif(not os.path.exists(OTF_CFF), reason="needs a CFF OTF fixture")
def test_cff_rasterizer_matches_freetype_single_glyph():
    """The Type 2 charstring interpreter's fill must match FreeType's
    rendering of the same CFF glyph within the documented ink-IoU bound."""
    import numpy as np
    from PIL import ImageDraw, ImageFont

    from dots_ocr_tpu.ingest.cff import CFFFont

    f = CFFFont(open(OTF_CFF, "rb").read())
    assert f.num_glyphs > 0 and f.units_per_em == 1000.0
    gid = f.glyph_id_for_char("A")
    assert gid != 0
    bm, xb, yt = f.render_glyph(gid, 96)
    assert bm is not None

    pf = ImageFont.truetype(OTF_CFF, 96)
    img = Image.new("L", (200, 200), 0)
    ImageDraw.Draw(img).text((50, 150), "A", font=pf, fill=255, anchor="ls")
    ref = np.asarray(img) > 128
    ours = np.zeros_like(ref)
    h, w = bm.shape
    y0, x0 = int(150 - yt), int(50 + xb)
    ours[y0 : y0 + h, x0 : x0 + w] = bm > 128
    iou = (ref & ours).sum() / max(1, (ref | ours).sum())
    assert iou >= 0.6, f"CFF ink IoU {iou:.3f} below the 0.6 fidelity bound"


@pytest.mark.skipif(not os.path.exists(OTF_CFF), reason="needs a CFF OTF fixture")
def test_bare_cff_payload_renders_by_gid():
    """A bare CFF table (the PDF `FontFile3`/Type1C payload shape, no sfnt
    wrapper, no cmap) must parse and render identically to the wrapped
    font — PDFs embed exactly these bytes."""
    import struct as _struct

    import numpy as np

    from dots_ocr_tpu.ingest.cff import CFFFont
    from dots_ocr_tpu.ingest.ttf import load_glyph_font

    data = open(OTF_CFF, "rb").read()
    (num_tables,) = _struct.unpack(">H", data[4:6])
    cff_bytes = None
    for i in range(num_tables):
        rec = data[12 + 16 * i : 12 + 16 * (i + 1)]
        if rec[:4] == b"CFF ":
            off, length = _struct.unpack(">II", rec[8:16])
            cff_bytes = data[off : off + length]
    assert cff_bytes is not None

    wrapped = CFFFont(data)
    bare = load_glyph_font(cff_bytes)  # factory must route to CFFFont
    assert isinstance(bare, CFFFont)
    gid = wrapped.glyph_id_for_char("B")
    # ASCII StandardEncoding lookup on the bare payload agrees with the
    # sfnt cmap on the wrapper (same charset).
    assert bare.glyph_id_for_char("B") == gid
    a, _, _ = wrapped.render_glyph(gid, 64)
    b, _, _ = bare.render_glyph(gid, 64)
    assert a is not None and np.array_equal(a, b)


@pytest.mark.skipif(not os.path.exists(OTF_CFF), reason="needs a CFF OTF fixture")
def test_type0_cff_glyph_rendering_matches_freetype():
    """End to end: a Type0/Identity-H CIDFontType0 (CFF outlines via
    FontFile3) PDF renders through the builtin backend within the same
    quantified ink-IoU bound as the TrueType path."""
    import numpy as np
    from PIL import ImageDraw, ImageFont

    text = "Fixed CFF 42"
    size, pos, page = 24, (20, 60), (300, 100)
    data = _type0_pdf_bytes(text, OTF_CFF, size=size, pos=pos, page=page, cff=True)
    doc = minipdf.open_pdf(data)
    got = minipdf.render_page(doc, 0, dpi=144)  # 2x scale

    scale = 144 / 72.0
    ref = Image.new("RGB", got.size, (255, 255, 255))
    d = ImageDraw.Draw(ref)
    pf = ImageFont.truetype(OTF_CFF, int(size * scale))
    d.text((pos[0] * scale, got.size[1] - pos[1] * scale), text,
           font=pf, fill=(0, 0, 0), anchor="ls")

    a = np.asarray(got.convert("L")) < 128
    b = np.asarray(ref.convert("L")) < 128
    assert a.any(), "builtin backend rendered no ink for CFF Type0 text"
    iou = (a & b).sum() / max(1, (a | b).sum())
    assert iou >= 0.6, f"CFF ink IoU {iou:.3f} below the 0.6 fidelity bound"


def _content_pdf_bytes(content: bytes, media=(0, 0, 200, 200)):
    """One-page PDF with a raw content stream and no resources."""
    stream = zlib.compress(content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox ["
            + " ".join(str(v) for v in media).encode()
            + b"] /Contents 4 0 R >>"
        ),
        b"<< /Length " + str(len(stream)).encode() + b" /Filter /FlateDecode >>\nstream\n"
        + stream + b"\nendstream",
    ]
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


def test_vector_paths_fill_stroke_bezier():
    """m/l/h fills, w-scaled S strokes, and flattened c Beziers all paint."""
    content = (
        # Filled black triangle in the lower-left quadrant.
        b"0 0 0 rg 10 10 m 90 10 l 50 90 l h f\n"
        # 4pt-wide red horizontal stroke across the top band.
        b"1 0 0 RG 4 w 10 180 m 190 180 l S\n"
        # Blue closed+stroked square (s closes back to the start point).
        b"0 0 1 RG 2 w 120 40 m 180 40 l 180 100 l 120 100 l s\n"
        # Green filled Bezier "bulge" (c), mid-right.
        b"0 0.6 0 rg 110 120 m 110 160 190 160 190 120 c h f\n"
    )
    doc = minipdf.open_pdf(_content_pdf_bytes(content))
    img = minipdf.render_page(doc, 0, dpi=72)
    assert img.size == (200, 200)
    # Triangle interior (PDF y=30 -> device y=170).
    assert img.getpixel((50, 170)) == (0, 0, 0)
    # Outside the triangle stays white.
    assert img.getpixel((15, 110)) == (255, 255, 255)
    # Red stroke at PDF y=180 -> device y=20, width ~4px.
    r, g, b = img.getpixel((100, 20))
    assert r > 200 and g < 80 and b < 80
    # Blue square: left edge stroked, interior NOT filled.
    r, g, b = img.getpixel((120, 130))
    assert b > 200 and r < 80
    assert img.getpixel((150, 130)) == (255, 255, 255)
    # The `s` close stroke: the segment from (120,100) back to (120,40)
    # is the LEFT edge; the close connects (120,100)->(120,40)? No — close
    # joins last point (120,100) to first (120,40): same left edge. Check
    # the bottom edge (120,40)-(180,40) -> device y=160 instead.
    r, g, b = img.getpixel((150, 160))
    assert b > 200 and r < 80
    # Bezier bulge: curve peaks at PDF y=150 (device y=50); interior of the
    # filled region between the chord and the curve near x=150.
    r, g, b = img.getpixel((150, 65))
    assert g > 120 and r < 80


def test_vector_path_ctm_scaled_stroke_width():
    """Line width scales with the CTM determinant (2x CTM -> ~2x pixels)."""
    content = b"2 0 0 2 0 0 cm 0 0 0 RG 3 w 10 50 m 90 50 l S\n"
    doc = minipdf.open_pdf(_content_pdf_bytes(content))
    img = minipdf.render_page(doc, 0, dpi=72)
    # Stroke at PDF y=100 (after 2x scale) -> device y=100; ~6px wide.
    col = [img.getpixel((100, y)) for y in range(90, 110)]
    dark = sum(1 for px in col if px[0] < 80)
    assert 4 <= dark <= 9, f"expected ~6px stroke, got {dark}"


def test_clip_path_applies_restores_and_intersects():
    """W/W* clips fills to the path region, q/Q restores the clip, and
    nested clips intersect (PDF 1.7 §8.5.4)."""
    content = (
        # Clip to the centered 100x100 square, then fill the whole page
        # red: only the clip region may paint.
        b"q 50 50 100 100 re W n 1 0 0 rg 0 0 200 200 re f Q\n"
        # After Q the clip is gone: a blue rect entirely OUTSIDE the old
        # clip must paint (it stays invisible if the clip leaked).
        b"0 0 1 rg 10 150 20 20 re f\n"
    )
    img = minipdf.render_page(minipdf.open_pdf(_content_pdf_bytes(content)), 0)
    r, g, b = img.getpixel((100, 100))  # inside the clip
    assert r > 200 and g < 80 and b < 80
    assert img.getpixel((20, 100)) == (255, 255, 255)  # left of the clip
    assert img.getpixel((100, 25)) == (255, 255, 255)  # above the clip
    r, g, b = img.getpixel((20, 40))  # blue rect, clip restored by Q
    assert b > 200 and r < 80

    nested = (
        b"q 40 40 120 120 re W n"
        b" q 80 80 40 40 re W n 0 0 0 rg 0 0 200 200 re f Q Q\n"
    )
    img = minipdf.render_page(minipdf.open_pdf(_content_pdf_bytes(nested)), 0)
    assert img.getpixel((100, 100)) == (0, 0, 0)  # inside both clips
    # Inside the outer clip but outside the inner one stays white.
    assert img.getpixel((60, 100)) == (255, 255, 255)
    assert img.getpixel((100, 60)) == (255, 255, 255)


def test_clip_applies_to_images_and_strokes():
    """Clip masks gate image XObjects/inline images and stroke painting."""
    # Clip to the left half, draw a full-page black inline image (2x2 raw
    # RGB zeros scaled by cm): right half must stay white.
    payload = bytes(12)
    content = (
        b"q 0 0 100 200 re W n"
        b" q 200 0 0 200 0 0 cm BI /W 2 /H 2 /CS /RGB /BPC 8 ID "
        + payload + b" EI Q Q\n"
        # Clipped stroke: horizontal line crossing the clip boundary.
        b"q 0 100 100 100 re W n 0 0 1 RG 6 w 0 150 m 200 150 l S Q\n"
    )
    img = minipdf.render_page(minipdf.open_pdf(_content_pdf_bytes(content)), 0)
    assert img.getpixel((50, 100)) == (0, 0, 0)  # image inside the clip
    assert img.getpixel((150, 100)) == (255, 255, 255)  # clipped away
    r, g, b = img.getpixel((50, 50))  # stroke inside its clip
    assert b > 200 and r < 80
    assert img.getpixel((150, 50)) == (255, 255, 255)  # stroke clipped


def _t1_encrypt(data: bytes, r: int) -> bytes:
    """Inverse of type1._decrypt with 4 salt bytes prepended."""
    out = bytearray()
    for p in b"\x00\x00\x00\x00" + data:
        c = p ^ (r >> 8)
        out.append(c)
        r = ((c + r) * 52845 + 22719) & 0xFFFF
    return bytes(out)


def _t1_num(v: int) -> bytes:
    import struct

    v = int(v)
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 255])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 255])
    return b"\xff" + struct.pack(">i", v)


def _build_type1_font() -> bytes:
    """Minimal synthesized Type 1 program: `boxglyph` = a 600-unit square
    at (100,100) (hsbw/rmoveto/hlineto/vlineto/closepath), `bumpglyph`
    adds an rrcurveto. Encrypted exactly per T1 spec §7.2."""
    sq = (
        _t1_num(0) + _t1_num(800) + bytes([13])        # hsbw
        + _t1_num(100) + _t1_num(100) + bytes([21])    # rmoveto
        + _t1_num(600) + bytes([6])                    # hlineto
        + _t1_num(600) + bytes([7])                    # vlineto
        + _t1_num(-600) + bytes([6])                   # hlineto
        + bytes([9, 14])                               # closepath endchar
    )
    bump = (
        _t1_num(0) + _t1_num(800) + bytes([13])
        + _t1_num(100) + _t1_num(100) + bytes([21])
        + _t1_num(600) + bytes([6])
        # rrcurveto bulging up-left back over the square's top.
        + b"".join(_t1_num(v) for v in (0, 400, -600, 200, -600, -200))
        + bytes([8, 9, 14])
    )
    notdef = _t1_num(0) + _t1_num(500) + bytes([13, 14])
    entries = []
    for name, code in (
        (b".notdef", notdef), (b"boxglyph", sq), (b"bumpglyph", bump)
    ):
        enc = _t1_encrypt(code, 4330)
        entries.append(
            b"/" + name + b" " + str(len(enc)).encode() + b" RD " + enc
            + b" ND"
        )
    private = (
        b"dup /Private 8 dict dup begin\n/lenIV 4 def\nend\n"
        b"/CharStrings 3 dict dup begin\n" + b"\n".join(entries) + b"\nend\n"
    )
    clear = (
        b"%!PS-AdobeFont-1.0: TestT1\n/FontName /TestT1 def\n"
        b"/Encoding 256 array\n0 1 255 {1 index exch /.notdef put} for\n"
        b"dup 66 /boxglyph put\ndup 67 /bumpglyph put\nreadonly def\n"
        b"currentfile eexec\n"
    )
    return clear + _t1_encrypt(private, 55665) + b"\n" + b"0" * 512


def test_type1_charstring_rasterizer():
    """Direct Type1Font API: eexec + charstring decryption, built-in
    encoding, square + bezier outlines rasterize with the expected ink."""
    import numpy as np

    from dots_ocr_tpu.ingest.type1 import Type1Font

    f = Type1Font(_build_type1_font())
    assert f.encoding[66] == "boxglyph" and f.encoding[67] == "bumpglyph"
    bm, xb, yt = f.render_glyph_name("boxglyph", 100)
    assert bm is not None
    # 600/1000 em at 100px -> ~60px square (+2px raster border).
    assert 58 <= bm.shape[0] <= 64 and 58 <= bm.shape[1] <= 64
    assert (np.asarray(bm) > 128).mean() > 0.85  # solidly filled
    assert abs(xb - 9) <= 2 and abs(yt - 71) <= 2  # bearing/top in px
    bm2, _, _ = f.render_glyph_name("bumpglyph", 100)
    assert bm2 is not None and (np.asarray(bm2) > 128).any()
    assert f.render_glyph_name("nosuch", 100)[0] is None


def test_type1_fontfile_pdf_text_renders_by_glyph_name():
    """End to end: a simple Type1 font embedded via FontFile renders text
    through /Encoding /Differences glyph-NAME addressing (the pdfTeX
    class PIL's unicode path garbles)."""
    font_bytes = _build_type1_font()
    ff = zlib.compress(font_bytes)
    content = zlib.compress(b"BT /F1 50 Tf 0 0 0 rg 20 30 Td (B) Tj ET\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 120] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /TestT1 "
        b"/FirstChar 66 /LastChar 66 /Widths [800] "
        b"/Encoding << /Differences [66 /boxglyph] >> "
        b"/FontDescriptor 6 0 R >>",
        b"<< /Type /FontDescriptor /FontName /TestT1 /Flags 4 "
        b"/FontBBox [0 0 800 800] /ItalicAngle 0 /Ascent 800 /Descent 0 "
        b"/CapHeight 700 /StemV 80 /FontFile 7 0 R >>",
        b"<< /Length " + str(len(ff)).encode()
        + b" /Filter /FlateDecode /Length1 100 /Length2 100 /Length3 512 "
        b">>\nstream\n" + ff + b"\nendstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    # 'B' -> boxglyph: square from em (0.1,0.1)..(0.7,0.7) at 50px, base-
    # line at PDF y=30 -> device y=90: ink spans x 25..55, y 55..85.
    assert img.getpixel((40, 70)) == (0, 0, 0)
    assert img.getpixel((40, 100)) == (255, 255, 255)  # below baseline
    assert img.getpixel((70, 70)) == (255, 255, 255)  # right of glyph


def test_ccitt_group4_image_decodes():
    """CCITTFaxDecode (G4) images — the scanned-document encoding — decode
    via the TIFF-framing path and render at the right polarity."""
    import numpy as np
    from PIL import Image, TiffImagePlugin  # noqa: F401

    from dots_ocr_tpu.ingest.minipdf import _ccitt_to_tiff

    rng = np.random.RandomState(7)
    # Blocky bitonal "document": white page, black text-ish rectangles.
    arr = np.ones((64, 96), bool)
    arr[10:20, 8:88] = False
    arr[30:34, 8:60] = False
    src = Image.fromarray(arr).convert("1")
    buf = io.BytesIO()
    src.save(buf, format="TIFF", compression="group4")
    t = Image.open(io.BytesIO(buf.getvalue()))
    off, cnt = t.tag_v2[273][0], t.tag_v2[279][0]
    payload = buf.getvalue()[off : off + cnt]

    # Direct framing round-trip. PIL's G4 save kept the source's
    # MINISBLACK photometric (0 = black), which is PDF's default
    # BlackIs1=false.
    framed = Image.open(io.BytesIO(
        _ccitt_to_tiff(payload, 96, 64, k=-1, black_is_1=False)
    ))
    framed.load()
    got = np.asarray(framed.convert("L")) > 128
    assert (got == arr).mean() > 0.99

    # End to end through a PDF image XObject.
    content = zlib.compress(b"q 96 0 0 64 0 0 cm /Im1 Do Q\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 96 64] "
        b"/Contents 4 0 R /Resources << /XObject << /Im1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /XObject /Subtype /Image /Width 96 /Height 64 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns 96 "
        b"/Rows 64 >> /Length " + str(len(payload)).encode()
        + b" >>\nstream\n" + payload + b"\nendstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img.convert("L")) > 128
    # Device y flips: text bar at arr rows 10:20 lands at the same rows
    # (cm maps the unit square with v=1 at the top -> row order preserved).
    assert px[15, 50] == False  # noqa: E712  — inside the black bar
    assert px[5, 50] == True  # noqa: E712  — white margin
    assert (px == arr).mean() > 0.98


def test_type3_font_charproc_rendering():
    """Type 3 glyphs (PDF content streams) execute through the renderer
    with FontMatrix x text-matrix composition — the old-TeX bitmap-font
    class. Two codes verify per-glyph placement and width advance."""
    import numpy as np

    # Glyph 'sq': filled 600x600 square at (100,100) in glyph space
    # (FontMatrix 0.001 -> em units). 'bar': thin full-height bar.
    sq = b"800 0 d0 100 100 600 600 re f\n"
    bar = b"400 0 d0 100 0 200 900 re f\n"
    content = zlib.compress(b"BT /F1 40 Tf 0 0 0 rg 10 30 Td (AB) Tj ET\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 100] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 1000 1000] "
        b"/FontMatrix [0.001 0 0 0.001 0 0] "
        b"/CharProcs << /sq 6 0 R /bar 7 0 R >> "
        b"/Encoding << /Type /Encoding /Differences [65 /sq /bar] >> "
        b"/FirstChar 65 /LastChar 66 /Widths [800 400] >>",
        b"<< /Length " + str(len(sq)).encode() + b" >>\nstream\n" + sq
        + b"endstream",
        b"<< /Length " + str(len(bar)).encode() + b" >>\nstream\n" + bar
        + b"endstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img.convert("L")) < 128
    # 'A' square: glyph (100..700)/1000 * 40pt at origin (10, 30) ->
    # user x 14..38, y 34..58 -> device y 42..66.
    assert px[50, 25]  # inside the square
    assert not px[50, 5]  # left margin
    assert not px[20, 25]  # above the square
    # 'B' bar advances by width 800/1000*40 = 32pt: bar at user
    # x 42+4..42+12 (glyph 100..300), y 30..66 -> device y 4..70.
    assert px[40, 48]  # inside the bar
    assert not px[40, 58]  # right of the bar


def test_axial_and_radial_shadings():
    """sh (direct) paints an axial gradient under the clip; a PatternType 2
    scn fill paints a radial gradient through the path mask."""
    import numpy as np

    content = zlib.compress(
        # Top half: clip + direct axial sh (red -> blue, left to right).
        b"q 0 100 200 100 re W n /Sh1 sh Q\n"
        # Bottom half: radial shading-pattern fill inside a rect path.
        b"q /Pattern cs /P1 scn 20 20 160 60 re f Q\n"
    )
    axial = (
        b"<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 200 0] "
        b"/Extend [true true] /Function << /FunctionType 2 /Domain [0 1] "
        b"/C0 [1 0 0] /C1 [0 0 1] /N 1 >> >>"
    )
    radial_pat = (
        b"<< /PatternType 2 /Shading << /ShadingType 3 /ColorSpace /DeviceGray "
        b"/Coords [100 50 0 100 50 80] /Extend [true true] "
        b"/Function << /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [1] /N 1 >> "
        b">> >>"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] "
        b"/Contents 4 0 R /Resources << /Shading << /Sh1 5 0 R >> "
        b"/Pattern << /P1 6 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        axial,
        radial_pat,
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    # Axial in the clipped TOP half (device y < 100): red left, blue right.
    r, g, b = px[50, 10]
    assert r > 200 and b < 60
    r, g, b = px[50, 190]
    assert b > 200 and r < 60
    mid = px[50, 100]
    assert 90 < mid[0] < 170 and 90 < mid[2] < 170  # blended middle
    # Clip: the sh must NOT paint the bottom half outside its q/Q region
    # beyond the pattern rect (check a point outside both).
    assert tuple(px[195, 5]) == (255, 255, 255)
    # Radial fill: dark at the circle centre (pdf 100,50 -> device y=150),
    # lighter toward the rect's edge, untouched outside the path.
    centre = px[150, 100]
    edge = px[150, 30]
    assert centre[0] < 60 and edge[0] > centre[0] + 60
    assert tuple(px[150, 10]) == (255, 255, 255)  # outside the 20..180 rect


def test_image_smask_alpha_compositing():
    """/SMask soft masks gate image pasting: transparent regions leave the
    backdrop visible (PNG-alpha-class images in PDFs)."""
    import numpy as np

    # 2x2 blue image; SMask: left column transparent, right opaque.
    rgb = bytes([0, 0, 255] * 4)
    alpha = bytes([0, 255, 0, 255])
    content = zlib.compress(
        b"1 0 0 rg 0 0 200 100 re f\n"  # red backdrop
        b"q 200 0 0 100 0 0 cm /Im1 Do Q\n"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 4 0 R /Resources << /XObject << /Im1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /SMask 6 0 R "
        b"/Length " + str(len(rgb)).encode() + b" >>\nstream\n" + rgb
        + b"\nendstream",
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
        b"/Length " + str(len(alpha)).encode() + b" >>\nstream\n" + alpha
        + b"\nendstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    r, g, b = px[50, 30]   # transparent left: red backdrop shows
    assert r > 180 and b < 120
    r, g, b = px[50, 170]  # opaque right: blue image
    assert b > 180 and r < 120


def test_extgstate_constant_alpha():
    """gs /ca blends fills and text (the watermark/highlight class): a 50%
    yellow rect over black text leaves the text visible through it."""
    import numpy as np

    content = zlib.compress(
        b"0 0 0 rg 20 40 160 20 re f\n"            # black bar (text stand-in)
        b"q /G1 gs 1 1 0 rg 0 30 200 40 re f Q\n"  # 50% yellow highlight
        b"q /G1 gs 0 0 1 rg 120 80 60 15 re f Q\n"  # 50% blue over white
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 4 0 R /Resources << /ExtGState << /G1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /ExtGState /ca 0.5 /CA 0.5 >>",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    # Black bar at pdf y 40..60 -> device y 40..60; highlight over it:
    # 50% yellow over black => dark yellow (~127,127,0), NOT opaque yellow.
    r, g, b = px[50, 100]
    assert 90 < r < 170 and 90 < g < 170 and b < 60
    # Highlight over white margin => light yellow (~255,255,127).
    r, g, b = px[35, 100]
    assert r > 200 and g > 200 and 90 < b < 170
    # 50% blue over white => ~(127,127,255).
    r, g, b = px[12, 150]
    assert 90 < r < 170 and b > 200
    # Untouched area stays white.
    assert tuple(px[90, 10]) == (255, 255, 255)


def test_tiling_pattern_fill():
    """PatternType 1 fills repeat a content-stream cell across the path:
    a 10x10 cell with a 5x5 red square -> ~25% red coverage at period 10."""
    import numpy as np

    pat_content = b"1 0 0 rg 0 0 5 5 re f\n"
    content = zlib.compress(b"/Pattern cs /P1 scn 20 20 100 60 re f\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 4 0 R /Resources << /Pattern << /P1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /PatternType 1 /PaintType 1 /TilingType 1 "
        b"/BBox [0 0 10 10] /XStep 10 /YStep 10 /Resources << >> "
        b"/Length " + str(len(pat_content)).encode() + b" >>\nstream\n"
        + pat_content + b"endstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    red = (px[:, :, 0] > 180) & (px[:, :, 2] < 80)
    # Fill rect: pdf (20..120, 20..80) -> device rows 20..80, cols 20..120.
    inside = red[22:78, 22:118]
    frac = inside.mean()
    assert 0.15 < frac < 0.35, f"red coverage {frac:.2f}, expected ~0.25"
    # Periodicity: the red pixel pattern repeats with period 10 in x.
    rows, cols = np.nonzero(inside)
    assert len(rows) > 50
    assert not red[:, :20].any() and not red[:, 121:].any()  # outside rect
    assert not red[:19].any() and not red[81:].any()


def test_invisible_text_mode_not_painted():
    """Tr 3 (invisible) text — the searchable-scan OCR layer — must not
    paint, while Tr 0 text after it still does."""
    import numpy as np

    content = (
        b"BT /F1 24 Tf 3 Tr 0 0 0 rg 20 130 Td (HIDDEN) Tj ET\n"
        b"BT /F1 24 Tf 0 Tr 0 0 0 rg 20 60 Td (SHOWN) Tj ET\n"
    )
    doc = minipdf.open_pdf(_content_pdf_bytes(content))
    img = minipdf.render_page(doc, 0, dpi=72)
    px = np.asarray(img.convert("L")) < 128
    # Visible line around device y = 200-60 = 140 has ink; the hidden
    # line's band (device y ~ 46..76) stays white.
    assert px[120:155].any()
    assert not px[40:80].any()


def test_annotation_appearance_stream_renders():
    """Annotations with /AP /N appearance streams paint into /Rect
    (PyMuPDF get_pixmap parity: stamps/squares/form appearances)."""
    import numpy as np

    ap = b"0 0 1 rg 0 0 10 10 re f\n"
    content = zlib.compress(b"1 0 0 rg 10 10 30 30 re f\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 4 0 R /Annots [5 0 R] >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Annot /Subtype /Square /Rect [100 40 160 80] "
        b"/F 4 /AP << /N 6 0 R >> >>",
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 10 10] "
        b"/Length " + str(len(ap)).encode() + b" >>\nstream\n" + ap
        + b"endstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    # The 10x10 BBox stretches onto Rect (100..160, 40..80) -> device
    # rows 20..60, cols 100..160: blue.
    r, g, b = px[40, 130]
    assert b > 180 and r < 80
    assert tuple(px[40, 170]) == (255, 255, 255)  # right of the annot
    # Page content (red square) still present.
    r, g, b = px[75, 25]
    assert r > 180 and b < 80


def test_lzw_decode_spec_vector_and_filter_dispatch():
    """LZWDecode: the PDF 32000-1 §7.4.4.2 worked example decodes
    byte-exactly, and the filter dispatch routes LZW/LZWDecode names."""
    from dots_ocr_tpu.ingest.minipdf import (
        Name, PDFDocument, _lzw_decode, apply_filters,
    )

    enc = bytes.fromhex("800B6050220C0C8501")
    want = bytes([45, 45, 45, 45, 45, 65, 45, 45, 45, 66])
    assert _lzw_decode(enc, None) == want

    doc = PDFDocument(_content_pdf_bytes(b"q Q"))  # any doc for resolve()
    assert apply_filters({Name("Filter"): Name("LZWDecode")}, enc, doc) == want


def _build_encrypted_pdf(mode: str) -> bytes:
    """Forward-construct an encrypted PDF (empty user password) with a red
    square, per the standard security handler algorithms."""
    import hashlib

    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    from dots_ocr_tpu.ingest.minipdf import _PW_PAD, _rc4

    file_id = b"\x01\x02" * 8
    p = (-4) & 0xFFFFFFFF
    content = b"1 0 0 rg 30 30 80 80 re f\n"

    if mode in ("rc4", "aesv2"):
        n = 16
        # Algorithm 3: /O from the (empty) owner password.
        ok = hashlib.md5(_PW_PAD).digest()
        for _ in range(50):
            ok = hashlib.md5(ok[:n]).digest()
        o = _PW_PAD
        for i in range(20):
            o = _rc4(bytes(b ^ i for b in ok[:n]), o)
        # Algorithm 2: file key.
        md = hashlib.md5(_PW_PAD + o[:32] + p.to_bytes(4, "little") + file_id)
        key = md.digest()
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
        key = key[:n]
        # Algorithm 5: /U.
        u = hashlib.md5(_PW_PAD + file_id).digest()
        for i in range(20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16

        def enc_obj(data, num):
            okey = hashlib.md5(
                key + num.to_bytes(3, "little") + b"\x00\x00"
                + (b"sAlT" if mode == "aesv2" else b"")
            ).digest()[:16]
            if mode == "rc4":
                return _rc4(okey, data)
            iv = bytes(range(16))
            padlen = 16 - len(data) % 16
            e = Cipher(algorithms.AES(okey), modes.CBC(iv)).encryptor()
            return iv + e.update(data + bytes([padlen]) * padlen) + e.finalize()

        if mode == "rc4":
            enc_dict = (
                b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -4 /O <"
                + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> >>"
            )
        else:
            enc_dict = (
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -4 "
                b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                b"/StmF /StdCF /StrF /StdCF /O <" + o.hex().encode()
                + b"> /U <" + u.hex().encode() + b"> >>"
            )
    else:  # aes256 (R6)
        key = bytes(range(32))  # the file key we choose
        vs, ks = b"VALSALT!", b"KEYSALT!"
        u_hash = hashlib.sha256(b"" + vs + b"").digest()  # R6 hash(pw="")
        # Run the 2.B hardening loop exactly as the reader does.
        from dots_ocr_tpu.ingest.minipdf import _StdCrypt
        h = _StdCrypt.__new__(_StdCrypt)
        h.r = 6
        u_hash = h._hash_r6(b"", vs, b"")
        ikey = h._hash_r6(b"", ks, b"")
        e = Cipher(algorithms.AES(ikey), modes.CBC(b"\x00" * 16)).encryptor()
        ue = e.update(key) + e.finalize()
        u = u_hash + vs + ks

        def enc_obj(data, num):
            iv = bytes(range(16))
            padlen = 16 - len(data) % 16
            e = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
            return iv + e.update(data + bytes([padlen]) * padlen) + e.finalize()

        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -4 "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF /O <" + (b"\x00" * 48).hex().encode()
            + b"> /U <" + u.hex().encode() + b"> /UE <" + ue.hex().encode()
            + b"> /OE <" + (b"\x00" * 32).hex().encode() + b"> >>"
        )

    stream = enc_obj(content, 4)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 140 140] "
        b"/Contents 4 0 R >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
        + stream + b"\nendstream",
        enc_dict,
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.6\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o_ in offsets:
        out.write(f"{o_:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R /Encrypt 5 0 R /ID [<" + file_id.hex().encode()
        + b"> <" + file_id.hex().encode() + b">] >>\nstartxref\n"
        + str(xref).encode() + b"\n%%EOF"
    )
    return out.getvalue()


@pytest.mark.parametrize("mode", ["rc4", "aesv2", "aes256"])
def test_encrypted_pdf_empty_user_password(mode):
    """Permissions-only encrypted PDFs (RC4-128 / AES-128 / AES-256, empty
    user password) open and render transparently — PyMuPDF parity for the
    common protected-but-readable document class."""
    import numpy as np

    data = _build_encrypted_pdf(mode)
    img = minipdf.render_page(minipdf.open_pdf(data), 0)
    px = np.asarray(img)
    r, g, b = px[70, 70]  # inside the red square
    assert r > 180 and g < 80, f"{mode}: square not decrypted/rendered"
    assert tuple(px[10, 10]) == (255, 255, 255)


def test_encrypted_pdf_with_real_password_rejected():
    """A document whose user password is NOT empty must fail loudly (we
    never guess passwords), not render garbage."""
    data = _build_encrypted_pdf("aes256")
    # Corrupt the /U validation hash -> empty password no longer validates.
    broken = data.replace(b"/U <", b"/U <ff", 1)
    with pytest.raises(ValueError):
        minipdf.open_pdf(broken).pages()


def test_page_rotate_renders_upright():
    """/Rotate 90 (landscape scans stored rotated) swaps the canvas and
    rotates content clockwise, like PyMuPDF's get_pixmap."""
    import numpy as np

    # 200x100 page, red square at the pdf lower-left corner (10..40).
    content = b"1 0 0 rg 10 10 30 30 re f\n"

    def build(rotate):
        extra = f" /Rotate {rotate}".encode() if rotate else b""
        stream = zlib.compress(content)
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100]"
            + extra + b" /Contents 4 0 R >>",
            b"<< /Length " + str(len(stream)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream",
        ]
        out = io.BytesIO()
        out.write(b"%PDF-1.4\n")
        offsets = []
        for i, body in enumerate(objs, 1):
            offsets.append(out.tell())
            out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
        xref = out.tell()
        out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
        for o in offsets:
            out.write(f"{o:010d} 00000 n \n".encode())
        out.write(
            b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
        )
        return out.getvalue()

    base = minipdf.render_page(minipdf.open_pdf(build(0)), 0)
    assert base.size == (200, 100)
    for rot, method in (
        (90, Image.ROTATE_270), (180, Image.ROTATE_180), (270, Image.ROTATE_90)
    ):
        got = minipdf.render_page(minipdf.open_pdf(build(rot)), 0)
        # PIL ROTATE_* are counter-clockwise; /Rotate is clockwise display.
        want = base.transpose(method)
        assert got.size == want.size
        a = np.asarray(got)
        b = np.asarray(want)
        assert (a == b).mean() > 0.99, f"Rotate {rot} mismatch"


def test_cropbox_defines_visible_region():
    """Rendering uses the CropBox (viewer-visible region) like PyMuPDF,
    not the full MediaBox."""
    import numpy as np

    content = zlib.compress(b"1 0 0 rg 50 50 20 20 re f\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 300] "
        b"/CropBox [40 40 140 140] /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    assert img.size == (100, 100)  # the CropBox, not 300x300
    px = np.asarray(img)
    # pdf (50..70) inside crop origin 40 -> local (10..30); device rows
    # 100-(10..30) = 70..90.
    r, g, b = px[80, 20]
    assert r > 180 and g < 80
    assert tuple(px[20, 80]) == (255, 255, 255)


def test_lzw_long_stream_roundtrip_vs_libtiff():
    """LZW width transitions (9->10->11->12 bits) decode byte-exactly
    against a REAL encoder: libtiff's TIFF-LZW strips (same bitstream as
    PDF LZWDecode, EarlyChange=1). The short spec vector cannot catch
    width-boundary desyncs — a 64k-byte image crosses every boundary."""
    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.ingest.minipdf import _lzw_decode
    from dots_ocr_tpu.native import get_lib, lzw_decode_native

    rng = np.random.RandomState(42)
    # Compressible but entropy-rich: block gradient + speckle.
    arr = (
        np.add.outer(np.arange(256), np.arange(256)) // 4
        + rng.randint(0, 8, (256, 256))
    ).astype(np.uint8)
    img = Image.fromarray(arr, "L")
    buf = io.BytesIO()
    img.save(buf, format="TIFF", compression="tiff_lzw")
    t = Image.open(io.BytesIO(buf.getvalue()))
    offs = t.tag_v2[273]
    cnts = t.tag_v2[279]
    rows_per_strip = t.tag_v2.get(278, 256)
    raw = buf.getvalue()
    want = arr.tobytes()
    got = b"".join(
        _lzw_decode(raw[o : o + c], None) for o, c in zip(offs, cnts)
    )
    assert got == want, "python LZW desyncs vs libtiff"
    if get_lib() is not None:
        got_native = b"".join(
            lzw_decode_native(raw[o : o + c], 1) for o, c in zip(offs, cnts)
        )
        assert got_native == want, "native LZW desyncs vs libtiff"
    assert rows_per_strip  # silence unused


def test_encrypted_pdf_rc4_wrong_password_rejected():
    """R3 (RC4) documents whose user password is not empty must raise —
    not silently decrypt content streams to garbage (review finding: /U
    was never validated on the RC4/AES-128 path)."""
    data = _build_encrypted_pdf("rc4")
    broken = data.replace(b"/U <", b"/U <ffff", 1)
    with pytest.raises(ValueError):
        minipdf.open_pdf(broken)


def test_form_xobject_clips_to_bbox_and_decode_inverts():
    """Form XObjects clip content to their /BBox (PDF §8.10.1); image
    /Decode [1 0] inverts 1-bit samples (inverted fax/gray scans)."""
    import numpy as np

    # Form paints a big rect; only the BBox part may show.
    form = b"0 0 1 rg 0 0 500 500 re f\n"
    # 2x2 1-bit image, raw bits 0b1000_0000 rows -> with Decode [1 0]
    # the set bit becomes BLACK.
    imgbits = bytes([0b10000000, 0b00000000])
    content = zlib.compress(
        b"q 1 0 0 1 10 110 cm /Fx Do Q\n"
        b"q 80 0 0 80 100 10 cm /Im1 Do Q\n"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] "
        b"/Contents 4 0 R /Resources << /XObject << /Fx 5 0 R /Im1 6 0 R "
        b">> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 40 40] /Length "
        + str(len(form)).encode() + b" >>\nstream\n" + form + b"endstream",
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 /Decode [1 0] "
        b"/Length " + str(len(imgbits)).encode() + b" >>\nstream\n"
        + imgbits + b"\nendstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    # Form at (10,110), BBox 40x40 -> device rows 50..90, cols 10..50 blue;
    # outside the BBox (but inside the painted 500x500 rect) stays white.
    r, g, b = px[70, 30]
    assert b > 180 and r < 80
    assert tuple(px[70, 70]) == (255, 255, 255)  # clipped by BBox
    assert tuple(px[30, 30]) == (255, 255, 255)
    # Image: top-left quadrant bit SET + Decode [1 0] -> black; the other
    # quadrants stay white. Placed at (100..180, 10..90) pdf -> device
    # rows 110..190.
    assert px[130, 120][0] < 80   # top-left quadrant: black
    assert px[130, 160][0] > 200  # top-right: white
    assert px[170, 120][0] > 200  # bottom-left: white


def test_tiling_pattern_rotated_matrix():
    """A 45-degree-rotated tiling matrix still fills the path with the
    cell's ink at roughly the same coverage (general-affine tiling)."""
    import math

    import numpy as np

    pat_content = b"1 0 0 rg 0 0 5 5 re f\n"
    r = math.sqrt(0.5)  # 45-degree rotation components
    matrix = f"{r:.6f} {r:.6f} {-r:.6f} {r:.6f} 0 0".encode()
    content = zlib.compress(b"/Pattern cs /P1 scn 40 30 120 50 re f\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 4 0 R /Resources << /Pattern << /P1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /PatternType 1 /PaintType 1 /TilingType 1 /Matrix ["
        + matrix + b"] /BBox [0 0 10 10] /XStep 10 /YStep 10 "
        b"/Resources << >> /Length " + str(len(pat_content)).encode()
        + b" >>\nstream\n" + pat_content + b"endstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    red = (px[:, :, 0] > 160) & (px[:, :, 2] < 100)
    inside = red[25:65, 45:155]  # fill rect interior (device rows 20..70)
    frac = inside.mean()
    assert 0.12 < frac < 0.40, f"rotated-tiling coverage {frac:.2f}"
    # The red dot rows must NOT be axis-aligned: red pixels appear in
    # diagonal bands, so some columns have red where others at the same
    # row offset pattern differ — check rotation via the diagonal shift.
    rows = np.nonzero(inside.any(axis=1))[0]
    assert len(rows) > 20  # bands cross most of the rect vertically
    assert not red[:18].any() and not red[72:].any()  # outside the rect


def test_mesh_shading_type4_gouraud_triangle():
    """Free-form triangle mesh (ShadingType 4): vertices decode from the
    packed bit stream and Gouraud-interpolate vertex colors."""
    import struct

    import numpy as np

    def vert(flag, x, y, r, g, b):
        # bpf=8, bpc=16, bpcomp=8; Decode maps x:[0,200] y:[0,100] c:[0,1].
        xi = round(x / 200 * 65535)
        yi = round(y / 100 * 65535)
        return struct.pack(
            ">BHHBBB", flag, xi, yi,
            round(r * 255), round(g * 255), round(b * 255),
        )

    stream = (
        vert(0, 20, 10, 1, 0, 0)
        + vert(0, 180, 10, 0, 1, 0)
        + vert(0, 100, 90, 0, 0, 1)
    )
    content = zlib.compress(b"/Sh1 sh\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 4 0 R /Resources << /Shading << /Sh1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /ShadingType 4 /ColorSpace /DeviceRGB /BitsPerCoordinate 16 "
        b"/BitsPerComponent 8 /BitsPerFlag 8 "
        b"/Decode [0 200 0 100 0 1 0 1 0 1] /Length "
        + str(len(stream)).encode() + b" >>\nstream\n" + stream
        + b"\nendstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    # Vertices: red at pdf (20,10) -> device (20, 90); green (180,10) ->
    # (180, 90); blue (100,90) -> (100, 10).
    r, g, b = px[88, 24]
    assert r > 180 and g < 90 and b < 90
    r, g, b = px[88, 176]
    assert g > 180 and r < 90
    r, g, b = px[14, 100]
    assert b > 180 and r < 90
    # Centroid blends roughly equal thirds.
    r, g, b = px[63, 100]
    assert 50 < r < 130 and 50 < g < 130 and 50 < b < 130
    # Outside the triangle stays white.
    assert tuple(px[90, 5]) == (255, 255, 255)


def test_jbig2_mmr_generic_region():
    """JBIG2 (MMR profile): an embedded segment stream with an immediate
    generic region coded as MMR (== T.6/G4) decodes and composes onto the
    page; arithmetic-coded pages safely return no image."""
    import numpy as np
    from PIL import Image, TiffImagePlugin  # noqa: F401

    from dots_ocr_tpu.ingest.minipdf import Name, StreamObj, _decode_image_payload
    from dots_ocr_tpu.ingest import minipdf as mp

    arr = np.ones((64, 96), bool)
    arr[20:30, 10:80] = False  # black bar
    src = Image.fromarray(arr).convert("1")
    buf = io.BytesIO()
    src.save(buf, format="TIFF", compression="group4")
    t = Image.open(io.BytesIO(buf.getvalue()))
    off, cnt = t.tag_v2[273][0], t.tag_v2[279][0]
    mmr = buf.getvalue()[off : off + cnt]

    def seg(num, styp, payload, page=1):
        return (
            num.to_bytes(4, "big") + bytes([styp]) + b"\x00"
            + bytes([page]) + len(payload).to_bytes(4, "big") + payload
        )

    page_info = (
        (96).to_bytes(4, "big") + (64).to_bytes(4, "big")
        + b"\x00" * 8 + b"\x00" + b"\x00\x00"
    )
    region = (
        (96).to_bytes(4, "big") + (64).to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + b"\x00"          # comb op OR
        + b"\x01"          # generic flags: MMR
        + mmr
    )
    stream = seg(0, 48, page_info) + seg(1, 38, region)

    xobj = StreamObj(
        {
            Name("Subtype"): Name("Image"),
            Name("Width"): 96,
            Name("Height"): 64,
            Name("BitsPerComponent"): 1,
            Name("ColorSpace"): Name("DeviceGray"),
            Name("Filter"): Name("JBIG2Decode"),
        },
        stream,
    )
    doc = mp.PDFDocument(_content_pdf_bytes(b"q Q"))
    img = _decode_image_payload(doc, xobj)
    assert img is not None
    got = np.asarray(img.convert("L")) > 128
    assert (got == arr).mean() > 0.99

    # PIL's libtiff decodes the bar as black where arr is False.
    assert not got[25, 40] and got[5, 40]

    # A symbol-dictionary segment (arithmetic machinery) => None, not junk.
    bad = seg(0, 0, b"\x00" * 8) + seg(1, 38, region)
    xobj_bad = StreamObj(dict(xobj.dict), bad)
    assert _decode_image_payload(doc, xobj_bad) is None


def test_jbig2_mq_coder_round_trip():
    """The T.88 MQ arithmetic coder round-trips random multi-context bit
    streams at several skew levels (encoder exists for test gating only)."""
    import numpy as np

    from dots_ocr_tpu.ingest.jbig2 import MQContexts, MQDecoder, MQEncoder

    rng = np.random.default_rng(7)
    for p in (0.02, 0.3, 0.5, 0.97):
        n = 3000
        bits = (rng.random(n) < p).astype(int)
        cxs = rng.integers(0, 32, n)
        enc = MQEncoder()
        ectx = MQContexts(32)
        for c, b in zip(cxs, bits):
            enc.encode(ectx, int(c), int(b))
        dec = MQDecoder(enc.flush())
        dctx = MQContexts(32)
        out = [dec.decode(dctx, int(c)) for c in cxs]
        assert out == list(bits)


def test_jbig2_generic_region_round_trip_all_templates():
    """Arithmetic generic regions round-trip for GB templates 0-3, with
    and without TPGDON, under the pdf.js/jbig2dec context-bit ordering."""
    import numpy as np

    from dots_ocr_tpu.ingest.jbig2 import (
        decode_generic_region, encode_generic_region,
    )

    rng = np.random.default_rng(11)
    bm = rng.random((48, 72)) < 0.25
    bm[12:20] = bm[12]  # repeated rows exercise TPGDON's SLTP path
    bm[30:34, :] = False
    for template in range(4):
        for tpgdon in (False, True):
            data = encode_generic_region(bm, template=template, tpgdon=tpgdon)
            out = decode_generic_region(
                data, 72, 48, template=template, tpgdon=tpgdon
            )
            assert np.array_equal(out, bm), (template, tpgdon)


def test_jbig2_arithmetic_generic_region_in_pdf():
    """JBIG2 arithmetic profile end to end: an embedded segment stream
    whose immediate generic region uses MQ coding (template 0, nominal
    AT) decodes through the PDF image path."""
    import numpy as np

    from dots_ocr_tpu.ingest import minipdf as mp
    from dots_ocr_tpu.ingest.jbig2 import NOMINAL_AT, encode_generic_region
    from dots_ocr_tpu.ingest.minipdf import (
        Name, StreamObj, _decode_image_payload,
    )

    w, h = 96, 64
    arr = np.zeros((h, w), bool)
    arr[20:30, 10:80] = True  # black bar (JBIG2: 1 = black)
    arr[40:44, 50:60] = True
    coded = encode_generic_region(arr, template=0)

    def seg(num, styp, payload, page=1):
        return (
            num.to_bytes(4, "big") + bytes([styp]) + b"\x00"
            + bytes([page]) + len(payload).to_bytes(4, "big") + payload
        )

    page_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x00" * 8 + b"\x00" + b"\x00\x00"
    )
    at_bytes = b"".join(
        bytes([dx & 0xFF, dy & 0xFF]) for dx, dy in NOMINAL_AT[0]
    )
    region = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + b"\x00"          # comb op OR
        + b"\x00"          # generic flags: arithmetic, template 0
        + at_bytes
        + coded
    )
    stream = seg(0, 48, page_info) + seg(1, 38, region)

    xobj = StreamObj(
        {
            Name("Subtype"): Name("Image"),
            Name("Width"): w,
            Name("Height"): h,
            Name("BitsPerComponent"): 1,
            Name("ColorSpace"): Name("DeviceGray"),
            Name("Filter"): Name("JBIG2Decode"),
        },
        stream,
    )
    doc = mp.PDFDocument(_content_pdf_bytes(b"q Q"))
    img = _decode_image_payload(doc, xobj)
    assert img is not None
    # 1 = black maps to dark pixels.
    got = np.asarray(img.convert("L")) < 128
    assert np.array_equal(got, arr)


def test_jbig2_arith_int_coder_round_trip():
    """The Annex A arithmetic integer coder round-trips every prefix
    class boundary, negatives, and the OOB sentinel."""
    from dots_ocr_tpu.ingest.jbig2 import (
        ArithIntDecoder, ArithIntEncoder, MQDecoder, MQEncoder,
    )

    vals = [
        0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 123456,
        -1, -4, -20, -84, -340, -4436, -999999, None, 7, None,
    ]
    enc = MQEncoder()
    ie = ArithIntEncoder()
    for v in vals:
        ie.encode(enc, v)
    dec = MQDecoder(enc.flush())
    idd = ArithIntDecoder()
    assert [idd.decode(dec) for _ in vals] == vals


def test_jbig2_symbol_dictionary_round_trip():
    """Symbol dictionaries (SDHUFF=0, SDREFAGG=0) round-trip: height
    classes, per-class width deltas, shared GB contexts, export runs."""
    import numpy as np

    from dots_ocr_tpu.ingest.jbig2 import (
        decode_symbol_dictionary, encode_symbol_dictionary,
    )

    rng = np.random.default_rng(3)
    symbols = [
        rng.random((h, w)) < 0.4
        for h, w in [(8, 5), (8, 7), (10, 6), (12, 12), (12, 4)]
    ]
    for template in (0, 2):
        payload = encode_symbol_dictionary(symbols, template=template)
        out = decode_symbol_dictionary(payload, [])
        assert out is not None and len(out) == len(symbols)
        for a, b in zip(out, symbols):
            assert np.array_equal(a, b)
    # Huffman-coded dictionaries are out of scope -> None, not garbage.
    huff = bytearray(encode_symbol_dictionary(symbols))
    huff[1] |= 1  # SDHUFF
    assert decode_symbol_dictionary(bytes(huff), []) is None


def test_jbig2_text_region_geometry():
    """Text-region placement matches T.88 6.4.5 for all four reference
    corners, transposed mode, multi-row strips, and negative SBDSOFFSET."""
    import numpy as np

    from dots_ocr_tpu.ingest.jbig2 import (
        decode_text_region, encode_text_region,
    )

    rng = np.random.default_rng(5)
    symbols = [rng.random((h, w)) < 0.5 for h, w in [(6, 4), (9, 7), (5, 11)]]

    def ref_place(insts, corner, transposed, shape=(40, 50)):
        ref = np.zeros(shape, bool)
        for sid, s, t in insts:
            sym = symbols[sid]
            h, w = sym.shape
            if transposed:
                y0, x0 = s, t - (w - 1 if corner & 2 else 0)
            else:
                x0, y0 = s, t - (0 if corner & 1 else h - 1)
            ya, xa = max(y0, 0), max(x0, 0)
            yb = min(y0 + h, shape[0])
            xb = min(x0 + w, shape[1])
            if ya < yb and xa < xb:
                ref[ya:yb, xa:xb] |= sym[ya - y0 : yb - y0, xa - x0 : xb - x0]
        return ref

    insts = [(0, 2, 12), (1, 14, 12), (2, 25, 30), (0, 4, 30)]
    for corner in range(4):
        for transposed in (False, True):
            payload = encode_text_region(
                50, 40, 0, 0, 0, symbols, insts,
                strips=1, ref_corner=corner, transposed=transposed,
            )
            res = decode_text_region(payload, symbols)
            assert res is not None
            assert np.array_equal(res[0], ref_place(insts, corner, transposed)), (
                corner, transposed,
            )

    # strips=4 (IAIT per-instance T offsets) + negative SBDSOFFSET
    insts = [(0, 2, 13), (1, 14, 14), (2, 27, 12), (0, 5, 33)]
    payload = encode_text_region(
        50, 40, 0, 0, 0, symbols, insts, strips=4, ref_corner=1, ds_offset=-3,
    )
    res = decode_text_region(payload, symbols)
    assert np.array_equal(res[0], ref_place(insts, 1, False))

    # SBDEFPIXEL=1 with AND composition
    payload = encode_text_region(
        30, 20, 0, 0, 0, symbols, [(1, 5, 3)],
        strips=1, ref_corner=1, def_pixel=1, sb_comb=1,
    )
    res = decode_text_region(payload, symbols)
    ref = np.ones((20, 30), bool)
    ref[3:12, 5:12] &= symbols[1]
    assert np.array_equal(res[0], ref)


def test_jbig2_symbol_text_page_in_pdf():
    """The scanned-text JBIG2 profile end to end: a symbol dictionary +
    an immediate text region referring to it decode through the PDF
    image path into the expected page bitmap."""
    import numpy as np

    from dots_ocr_tpu.ingest import minipdf as mp
    from dots_ocr_tpu.ingest.jbig2 import (
        encode_symbol_dictionary, encode_text_region,
    )
    from dots_ocr_tpu.ingest.minipdf import (
        Name, StreamObj, _decode_image_payload,
    )

    rng = np.random.default_rng(9)
    glyphs = [rng.random((10, w)) < 0.45 for w in (6, 8, 5, 9)]
    w, h = 120, 60
    # Two "lines of text": symbol instances along two baselines.
    insts = [
        (0, 5, 8), (1, 14, 8), (2, 26, 8), (3, 34, 8), (0, 46, 8),
        (3, 5, 30), (2, 17, 30), (1, 25, 30), (0, 36, 30),
    ]
    dict_payload = encode_symbol_dictionary(glyphs, template=0)
    text_payload = encode_text_region(w, h, 0, 0, 0, glyphs, insts, ref_corner=1)

    def seg(num, styp, payload, refs=(), page=1):
        # short referred-to form: count<=4 in the top 3 bits, 1-byte refs
        return (
            num.to_bytes(4, "big") + bytes([styp])
            + bytes([len(refs) << 5]) + bytes(refs)
            + bytes([page]) + len(payload).to_bytes(4, "big") + payload
        )

    page_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x00" * 8 + b"\x00" + b"\x00\x00"
    )
    stream = (
        seg(0, 48, page_info)
        + seg(1, 0, dict_payload)
        + seg(2, 6, text_payload, refs=[1])
    )
    xobj = StreamObj(
        {
            Name("Subtype"): Name("Image"),
            Name("Width"): w,
            Name("Height"): h,
            Name("BitsPerComponent"): 1,
            Name("ColorSpace"): Name("DeviceGray"),
            Name("Filter"): Name("JBIG2Decode"),
        },
        stream,
    )
    doc = mp.PDFDocument(_content_pdf_bytes(b"q Q"))
    img = _decode_image_payload(doc, xobj)
    assert img is not None
    got = np.asarray(img.convert("L")) < 128
    ref = np.zeros((h, w), bool)
    for sid, s, t in insts:
        g = glyphs[sid]
        ref[t : t + g.shape[0], s : s + g.shape[1]] |= g
    assert np.array_equal(got, ref)


def test_tiling_pattern_fine_hatch_small_period():
    """Regression (review finding): a fine 4-unit hatch on a letter-size
    page needs tens of thousands of small tiles — the cap must bound the
    RASTER, not the tile count, or the fill silently blanks."""
    import numpy as np

    pat_content = b"1 0 0 rg 0 0 2 2 re f\n"
    content = zlib.compress(b"/Pattern cs /P1 scn 100 100 300 300 re f\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Pattern << /P1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /PatternType 1 /PaintType 1 /TilingType 1 "
        b"/BBox [0 0 4 4] /XStep 4 /YStep 4 /Resources << >> "
        b"/Length " + str(len(pat_content)).encode() + b" >>\nstream\n"
        + pat_content + b"endstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n")
    for o in offsets:
        out.write(f"{o:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    img = minipdf.render_page(minipdf.open_pdf(out.getvalue()), 0)
    px = np.asarray(img)
    red = (px[:, :, 0] > 160) & (px[:, :, 2] < 100)
    frac = red[395:690, 105:395].mean()  # fill-rect interior
    assert 0.10 < frac < 0.45, f"fine hatch coverage {frac:.3f}"


def test_encrypted_pdf_with_object_streams():
    """Encryption + ObjStm ordering: the CONTAINER stream decrypts, the
    objects inside it are plaintext and must not be double-decrypted."""
    import hashlib

    import numpy as np

    from dots_ocr_tpu.ingest.minipdf import _PW_PAD, _rc4

    file_id = b"\x07\x08" * 8
    p = (-4) & 0xFFFFFFFF
    n = 16
    ok = hashlib.md5(_PW_PAD).digest()
    for _ in range(50):
        ok = hashlib.md5(ok[:n]).digest()
    o = _PW_PAD
    for i in range(20):
        o = _rc4(bytes(b ^ i for b in ok[:n]), o)
    md = hashlib.md5(_PW_PAD + o[:32] + p.to_bytes(4, "little") + file_id)
    key = md.digest()
    for _ in range(50):
        key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    u = hashlib.md5(_PW_PAD + file_id).digest()
    for i in range(20):
        u = _rc4(bytes(b ^ i for b in key), u)
    u = u + b"\x00" * 16

    def enc_obj(data, num):
        okey = hashlib.md5(
            key + num.to_bytes(3, "little") + b"\x00\x00"
        ).digest()[:16]
        return _rc4(okey, data)

    # Catalog + pages + page live INSIDE an ObjStm (objects 1-3).
    parts = [
        b"<< /Type /Catalog /Pages 2 0 R >> ",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >> ",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
        b"/Contents 5 0 R >>",
    ]
    inner = b"".join(parts)
    off1 = len(parts[0])
    off2 = off1 + len(parts[1])
    hdr = f"1 0 2 {off1} 3 {off2} ".encode()
    payload = hdr + inner
    objstm = enc_obj(payload, 4)
    content = enc_obj(b"1 0 0 rg 20 20 60 60 re f\n", 5)
    objs = {
        4: b"<< /Type /ObjStm /N 3 /First " + str(len(hdr)).encode()
        + b" /Length " + str(len(objstm)).encode() + b" >>\nstream\n"
        + objstm + b"\nendstream",
        5: b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        6: b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -4 /O <"
        + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> >>",
    }
    out = io.BytesIO()
    out.write(b"%PDF-1.5\n")
    offsets = {}
    for num, body in objs.items():
        offsets[num] = out.tell()
        out.write(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(
        b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R /ID [<"
        + file_id.hex().encode() + b"> <" + file_id.hex().encode()
        + b">] >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    doc = minipdf.open_pdf(out.getvalue())
    assert doc.page_count == 1
    img = minipdf.render_page(doc, 0)
    px = np.asarray(img)
    r, g, b = px[50, 50]
    assert r > 180 and g < 80
    assert tuple(px[10, 10]) == (255, 255, 255)
