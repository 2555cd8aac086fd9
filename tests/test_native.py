"""Native C++ acceleration vs pure-Python reference equivalence."""

import os

import numpy as np
import pytest

from dots_ocr_tpu import native


@pytest.fixture(scope="module")
def lib():
    handle = native.get_lib()
    if handle is None:
        pytest.skip("no C++ compiler available")
    return handle


def _encode_png_rows(raw_rows, filters, bpp):
    """Build filtered PNG data from raw rows (inverse of unpredict)."""
    out = bytearray()
    prev = bytes(len(raw_rows[0]))
    for row, ft in zip(raw_rows, filters):
        out.append(ft)
        enc = bytearray(row)
        if ft == 1:
            for i in range(len(row) - 1, bpp - 1, -1):
                enc[i] = (row[i] - row[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(len(row)):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            def paeth(a, b, c):
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                enc[i] = (row[i] - paeth(a, prev[i], c)) & 0xFF
        out.extend(enc)
        prev = row
    return bytes(out)


def test_png_unpredict_all_filters(lib):
    rng = np.random.RandomState(0)
    columns, colors, bpc = 37, 3, 8
    row_len = columns * colors
    rows = [bytes(rng.randint(0, 256, row_len, np.uint8)) for _ in range(10)]
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    data = _encode_png_rows(rows, filters, bpp=colors)

    got = native.png_unpredict_native(data, 15, columns, colors, bpc)
    assert got == b"".join(rows)


def test_png_unpredict_matches_python(lib):
    rng = np.random.RandomState(1)
    columns, colors, bpc = 64, 1, 8
    rows = [bytes(rng.randint(0, 256, columns, np.uint8)) for _ in range(6)]
    data = _encode_png_rows(rows, [2, 4, 1, 3, 0, 4], bpp=1)
    from dots_ocr_tpu.ingest.minipdf import _png_unpredict

    native_out = native.png_unpredict_native(data, 15, columns, colors, bpc)
    # the module-level function should route to native and agree
    assert _png_unpredict(data, 15, columns, colors, bpc) == native_out
    assert native_out == b"".join(rows)


def test_tiff_predictor(lib):
    rng = np.random.RandomState(2)
    columns, colors = 16, 3
    raw = rng.randint(0, 256, columns * colors * 4, np.uint8)
    # TIFF predictor: encode by differencing
    enc = raw.copy().reshape(4, -1)
    for row in enc:
        for i in range(len(row) - 1, colors - 1, -1):
            row[i] = (row[i] - row[i - colors]) & 0xFF
    got = native.png_unpredict_native(enc.tobytes(), 2, columns, colors, 8)
    assert got == raw.tobytes()


def test_runlength_decode(lib):
    # literal run: n<128 copies n+1 bytes; repeat run: n>128 repeats 257-n;
    # 128 = EOD
    data = bytes([2, 10, 20, 30, 254, 7, 0, 99, 128, 42])
    got = native.runlength_decode_native(data)
    assert got == bytes([10, 20, 30, 7, 7, 7, 99])


def test_runlength_matches_python(lib):
    rng = np.random.RandomState(3)
    chunks = []
    for _ in range(20):
        if rng.rand() < 0.5:
            n = rng.randint(0, 127)
            chunks.append(bytes([n]) + bytes(rng.randint(0, 256, n + 1, np.uint8)))
        else:
            n = rng.randint(129, 256)
            chunks.append(bytes([n, rng.randint(0, 256)]))
    data = b"".join(chunks) + bytes([128])

    def py_rle(data):
        out = bytearray()
        i = 0
        while i < len(data):
            n = data[i]; i += 1
            if n == 128:
                break
            if n < 128:
                out += data[i : i + n + 1]; i += n + 1
            else:
                out += data[i : i + 1] * (257 - n); i += 1
        return bytes(out)

    assert native.runlength_decode_native(data) == py_rle(data)


def test_patchify_native_matches_numpy():
    """C++ single-pass patchifier must byte-match the numpy im2col +
    emission reorder, including windowed packing's padded slots."""
    import dots_ocr_tpu.native as nat

    if nat.get_lib() is None:
        import pytest

        pytest.skip("no host compiler")
    import dataclasses

    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.models import preprocess
    from dots_ocr_tpu.models.config import DotsOCRConfig

    base = DotsOCRConfig.flagship().vision
    rng = np.random.RandomState(3)
    for window in (0, 4):
        cfg = dataclasses.replace(base, window_size=window)
        img = Image.fromarray(rng.randint(0, 255, (112, 168, 3), np.uint8))
        got, grid, win, valid = preprocess.extract_patches(img, cfg)
        # numpy reference
        nat._TRIED, nat._LIB = True, None
        try:
            want, grid2, win2, valid2 = preprocess.extract_patches(img, cfg)
        finally:
            nat._TRIED, nat._LIB = False, None
        assert grid == grid2
        assert (got == want).all()
        assert (win == win2).all() and (valid == valid2).all()


def test_native_lzw_and_rc4_match_python():
    """Native LZW/RC4 must be byte-identical to the pure-Python paths
    (spec vector + randomized round-trips through the encrypted-PDF
    fixtures' primitives)."""
    import os

    import pytest

    from dots_ocr_tpu.native import get_lib, lzw_decode_native, rc4_native

    if get_lib() is None:
        pytest.skip("no native toolchain")
    enc = bytes.fromhex("800B6050220C0C8501")
    want = bytes([45, 45, 45, 45, 45, 65, 45, 45, 45, 66])
    assert lzw_decode_native(enc, 1) == want

    # Python reference paths (force-disable native inside _rc4/_lzw).
    import random

    from dots_ocr_tpu.ingest import minipdf

    rng = random.Random(0)
    for _ in range(20):
        key = bytes(rng.randrange(256) for _ in range(rng.randint(1, 16)))
        data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 300)))
        # Compute the pure-python RC4 inline for comparison.
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + key[i % len(key)]) & 0xFF
            s[i], s[j] = s[j], s[i]
        out = bytearray(len(data))
        i = j = 0
        for n, c in enumerate(data):
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
        assert rc4_native(key, data) == bytes(out)
        assert rc4_native(key, rc4_native(key, data)) == data  # involution


def test_jbig2_generic_native_matches_python():
    """The C++ JBIG2 generic-region decoder is bit-identical to the
    Python MQ path across templates, TPGDON, and custom AT pixels."""
    import numpy as np

    from dots_ocr_tpu.ingest.jbig2 import (
        MQContexts, MQDecoder, _template, _TPGDON_CONTEXT,
        decode_generic_region, encode_generic_region,
    )
    from dots_ocr_tpu.native import jbig2_generic_native

    if jbig2_generic_native(b"", 1, 1, [(-1, 0)], False, 0) is None:
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(17)
    for template in range(4):
        for tpgdon in (False, True):
            at = [(1, -1)] if template else [(1, -1), (-2, -1), (2, -2), (-1, -2)]
            bm = rng.random((37, 53)) < 0.35
            bm[8:14] = bm[8]
            data = encode_generic_region(
                bm, template=template, at=at, tpgdon=tpgdon
            )
            pixels = _template(template, at)
            nat = jbig2_generic_native(
                data, 53, 37, pixels, tpgdon, _TPGDON_CONTEXT[template]
            )
            # Force the pure-Python path by supplying shared coder state.
            py = decode_generic_region(
                data, 53, 37, template=template, at=at, tpgdon=tpgdon,
                mq=MQDecoder(data), gb=MQContexts(1 << len(pixels)),
            )
            assert nat is not None
            assert np.array_equal(nat, py) and np.array_equal(nat, bm)


def test_jbig2_symbol_dict_native_matches_python():
    """The C++ whole-dictionary decoder returns the same symbols as the
    Python shared-coder path."""
    import numpy as np
    import pytest

    import dots_ocr_tpu.native as native
    from dots_ocr_tpu.ingest.jbig2 import (
        decode_symbol_dictionary, encode_symbol_dictionary,
    )

    if native.get_lib() is None:
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(23)
    symbols = [
        rng.random((h, int(rng.integers(4, 14)))) < 0.4
        for h in sorted(rng.integers(5, 18, 12))
    ]
    payload = encode_symbol_dictionary(symbols, template=0)
    out_native = decode_symbol_dictionary(payload, [])

    old = os.environ.get("DOTS_OCR_DISABLE_NATIVE")
    os.environ["DOTS_OCR_DISABLE_NATIVE"] = "1"
    native._TRIED, native._LIB = False, None
    try:
        out_py = decode_symbol_dictionary(payload, [])
    finally:
        if old is None:
            os.environ.pop("DOTS_OCR_DISABLE_NATIVE", None)
        else:
            os.environ["DOTS_OCR_DISABLE_NATIVE"] = old
        native._TRIED, native._LIB = False, None

    assert out_native is not None and out_py is not None
    assert len(out_native) == len(out_py) == len(symbols)
    for a, b, c in zip(out_native, out_py, symbols):
        assert np.array_equal(a, b) and np.array_equal(a, c)
