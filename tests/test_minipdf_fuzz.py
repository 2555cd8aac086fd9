"""minipdf robustness fuzzing: corrupt PDFs must fail cleanly, not hang,
crash, or demand absurd allocations.

The builtin backend is the fallback ingest path on hosts without
pymupdf/pypdfium2, so it sees whatever bytes users upload. The reference
gets this robustness from MuPDF's hardened C parser
(/root/reference/dots_ocr/utils/doc_utils.py:20-39 simply trusts fitz);
the rebuild's pure-Python/C++ parser earns it here: deterministic
mutations (byte flips, truncations, slice deletes/dupes, junk inserts)
over real seed PDFs, where every mutant must either render or raise an
ordinary Exception promptly.
"""

import io
import zlib

import numpy as np
import pytest
from PIL import Image

from dots_ocr_tpu.ingest import minipdf

from tests.test_ingest import _image_pdf_bytes, _text_pdf_bytes


def _mutants(seed_bytes: bytes, n: int, rng: np.random.RandomState):
    data = np.frombuffer(seed_bytes, np.uint8)
    for _ in range(n):
        kind = rng.randint(5)
        buf = data.copy()
        if kind == 0:  # flip random bytes
            idx = rng.randint(0, len(buf), size=rng.randint(1, 16))
            buf[idx] = rng.randint(0, 256, size=len(idx)).astype(np.uint8)
        elif kind == 1:  # truncate
            buf = buf[: rng.randint(1, len(buf))]
        elif kind == 2:  # delete a slice
            a = rng.randint(0, len(buf) - 1)
            b = min(len(buf), a + rng.randint(1, 256))
            buf = np.concatenate([buf[:a], buf[b:]])
        elif kind == 3:  # duplicate a slice
            a = rng.randint(0, len(buf) - 1)
            b = min(len(buf), a + rng.randint(1, 256))
            buf = np.concatenate([buf[:a], buf[a:b], buf[a:]])
        else:  # insert junk
            a = rng.randint(0, len(buf))
            junk = rng.randint(0, 256, size=rng.randint(1, 128)).astype(np.uint8)
            buf = np.concatenate([buf[:a], junk, buf[a:]])
        yield buf.tobytes()


def _try_render_all(data: bytes) -> None:
    """Open + render every page; any ordinary Exception is acceptable."""
    try:
        doc = minipdf.open_pdf(data)
        for i in range(min(doc.page_count, 3)):
            minipdf.render_page(doc, i, dpi=24)
    except Exception:
        pass  # clean failure IS the contract


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_mutated_pdfs_fail_cleanly(seed):
    rng = np.random.RandomState(seed)
    seeds = [
        _image_pdf_bytes([(255, 0, 0), (0, 255, 0)]),
        _text_pdf_bytes(),
    ]
    for seed_bytes in seeds:
        for mutant in _mutants(seed_bytes, 40, rng):
            _try_render_all(mutant)


def test_fuzz_reference_pdf_mutants():
    """Mutants of a real-world PDF (object streams, embedded fonts)."""
    import os

    from tests.test_ingest import REFERENCE_PDF

    if not os.path.exists(REFERENCE_PDF):
        pytest.skip("reference demo PDF not mounted")
    with open(REFERENCE_PDF, "rb") as fh:
        seed_bytes = fh.read()
    rng = np.random.RandomState(7)
    for mutant in _mutants(seed_bytes, 10, rng):
        _try_render_all(mutant)


def test_fuzz_pure_junk_and_empty():
    rng = np.random.RandomState(99)
    _try_render_all(b"")
    _try_render_all(b"%PDF-1.4\n")
    _try_render_all(rng.randint(0, 256, 4096).astype(np.uint8).tobytes())
    # valid header, garbage body, valid-looking trailer markers
    _try_render_all(
        b"%PDF-1.7\n" + rng.randint(0, 256, 1024).astype(np.uint8).tobytes()
        + b"\ntrailer\n<< /Root 1 0 R >>\nstartxref\n9\n%%EOF"
    )


def _pdf_with_mediabox(box: bytes) -> bytes:
    content = zlib.compress(b"0.9 0.1 0.1 rg 10 10 50 50 re f\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox " + box + b" /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
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
        f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF".encode()
    )
    return out.getvalue()


def test_mediabox_bomb_is_capped():
    """A hostile /MediaBox must not demand a multi-GB canvas: the
    rasterizer clamps its scale to PIL-safe bounds (<= 65k per side,
    <= 150 MP) instead of allocating box * dpi/72 pixels."""
    doc = minipdf.open_pdf(_pdf_with_mediabox(b"[0 0 5000000 5000000]"))
    img = minipdf.render_page(doc, 0, dpi=200)
    assert img.width <= 65_000 and img.height <= 65_000
    assert img.width * img.height <= int(1.5e8) + 1


def test_normal_page_unaffected_by_cap():
    """Letter-size at 200 dpi renders at the exact uncapped geometry."""
    doc = minipdf.open_pdf(_pdf_with_mediabox(b"[0 0 612 792]"))
    img = minipdf.render_page(doc, 0, dpi=200)
    assert img.size == (round(612 * 200 / 72), round(792 * 200 / 72))


def test_jbig2_hostile_streams_bounded():
    """Random bytes parsed as JBIG2 segment streams must neither crash
    nor burn unbounded CPU: hostile referred-to counts, region dims past
    the pixel budget, empty symbol height classes, and inflated instance
    counts all bail out quickly."""
    import time

    import numpy as np

    from dots_ocr_tpu.ingest.jbig2 import (
        decode_symbol_dictionary, decode_text_region,
    )
    from dots_ocr_tpu.ingest.minipdf import _jbig2_decode

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for _ in range(300):
        n = int(rng.integers(10, 400))
        buf = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            _jbig2_decode(buf, b"", 64, 64)
        except Exception:
            pass  # the minipdf call site wraps in try/except
    # symbol dictionary announcing 50 new symbols over OOB-spam classes
    for _ in range(25):
        payload = (
            bytes([0, 0]) + bytes(rng.integers(0, 256, 16, dtype=np.uint8))
            + (50).to_bytes(4, "big") + (50).to_bytes(4, "big")
            + bytes(rng.integers(0, 256, 30, dtype=np.uint8))
        )
        decode_symbol_dictionary(payload, [])
    # text region whose header claims a million instances
    hdr = (
        (64).to_bytes(4, "big") * 2 + (0).to_bytes(4, "big") * 2
        + b"\x00" + b"\x00\x00" + (999999).to_bytes(4, "big")
    )
    assert decode_text_region(
        hdr + bytes(rng.integers(0, 256, 40, dtype=np.uint8)),
        [np.ones((3, 3), bool)],
    ) is None
    assert time.perf_counter() - t0 < 60  # CI slack; ~0.2 s typical


def test_jbig2_crafted_dictionary_attacks():
    """Regressions from an adversarial review: (1) unbounded height/width
    deltas must not overflow the pixel-cap product (native heap overflow),
    (2) trained zero-length export runs on an exhausted stream must not
    spin forever, (3) a single giant export run must not allocate
    run-length memory. All must fail fast; legit dictionaries decode."""
    import time

    import numpy as np

    from dots_ocr_tpu.ingest.jbig2 import (
        ArithIntEncoder, MQContexts, MQEncoder, NOMINAL_AT, _template,
        decode_symbol_dictionary, encode_generic_region,
        encode_symbol_dictionary,
    )
    from dots_ocr_tpu.native import jbig2_symbol_dict_native

    def dict_header(num_ex, num_new):
        at = b"".join(
            bytes([dx & 0xFF, dy & 0xFF]) for dx, dy in NOMINAL_AT[0]
        )
        return (
            b"\x00\x00" + at
            + num_ex.to_bytes(4, "big") + num_new.to_bytes(4, "big")
        )

    t0 = time.perf_counter()

    # (1) dimension-overflow stream
    mq = MQEncoder()
    iadh, iadw = ArithIntEncoder(), ArithIntEncoder()
    iadh.encode(mq, 2**31 - 1)
    iadw.encode(mq, None)
    iadh.encode(mq, 2**31 - 1)
    iadw.encode(mq, None)
    iadh.encode(mq, 1002)
    iadw.encode(mq, 2**31 - 1)
    data = mq.flush()
    assert decode_symbol_dictionary(dict_header(1, 1) + data, []) is None
    assert jbig2_symbol_dict_native(data, _template(0, None), 1, 0) is None

    # (2) zero-run export spam after one real symbol
    mq = MQEncoder()
    iadh, iadw, iaex = ArithIntEncoder(), ArithIntEncoder(), ArithIntEncoder()
    gb = MQContexts(1 << 16)
    iadh.encode(mq, 3)
    iadw.encode(mq, 3)
    encode_generic_region(np.ones((3, 3), np.uint8), mq=mq, gb=gb)
    iadw.encode(mq, None)
    for _ in range(400):
        iaex.encode(mq, 0)
    assert decode_symbol_dictionary(dict_header(1, 1) + mq.flush(), []) is None

    # (3) giant single export run clamps instead of allocating
    mq = MQEncoder()
    iadh, iadw, iaex = ArithIntEncoder(), ArithIntEncoder(), ArithIntEncoder()
    gb = MQContexts(1 << 16)
    iadh.encode(mq, 3)
    iadw.encode(mq, 3)
    encode_generic_region(np.ones((3, 3), np.uint8), mq=mq, gb=gb)
    iadw.encode(mq, None)
    iaex.encode(mq, 0)
    iaex.encode(mq, 2**31)
    out = decode_symbol_dictionary(dict_header(1, 1) + mq.flush(), [])
    assert out is not None and len(out) == 1

    # legit dictionaries unaffected
    rng = np.random.default_rng(1)
    symbols = [rng.random((h, w)) < 0.4 for h, w in [(8, 5), (8, 7), (10, 6)]]
    out = decode_symbol_dictionary(encode_symbol_dictionary(symbols), [])
    assert all(np.array_equal(a, b) for a, b in zip(out, symbols))

    assert time.perf_counter() - t0 < 60
