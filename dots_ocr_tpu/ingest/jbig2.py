"""JBIG2 arithmetic decoding: MQ coder + generic region (ITU-T T.88).

Completes the builtin PDF backend's JBIG2 support beyond the MMR profile
(`minipdf._jbig2_decode`): IMMEDIATE GENERIC REGION segments whose flags
select arithmetic coding decode here — the MQ arithmetic decoder
(T.88 Annex E, the same coder JPEG2000 uses) driving the generic-region
template contexts (T.88 6.2.5, GB templates 0-3, nominal or custom AT
pixels, TPGDON typical-prediction rows).

Context-bit ordering follows the interop-proven convention (template
pixels sorted by (y, x), MSB first) used by the open-source decoders
(pdf.js, jbig2dec). Symbol dictionaries / text regions / refinement are
NOT implemented: pages needing them must fall through to the caller's
no-image behavior rather than render wrong bits.

The MQ *encoder* in this module exists for round-trip testing only (no
PDF producer role): decoder correctness is gated by encode->decode
round-trips over random and structured bitmaps across all templates.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

# T.88 Table E.1 — (Qe, NMPS, NLPS, SWITCH); shared with JPEG2000.
QE_TABLE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E software-conventions MQ decoder over one context set."""

    def __init__(self, data: bytes, num_contexts: int):
        self.data = data
        self.n = len(data)
        self.icx = np.zeros(num_contexts, np.uint8)
        self.mps = np.zeros(num_contexts, np.uint8)
        # INITDEC
        self.bp = 0
        b0 = data[0] if self.n else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp, n = self.data, self.bp, self.n
        b = data[bp] if bp < n else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < n else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[self.bp] if self.bp < n else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        icx = self.icx[cx]
        qe, nmps, nlps, switch = QE_TABLE[icx]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = int(self.mps[cx])
                self.icx[cx] = nmps
            else:
                d = 1 - int(self.mps[cx])
                if switch:
                    self.mps[cx] ^= 1
                self.icx[cx] = nlps
            self.a = qe
            # RENORMD
            while True:
                if self.ct == 0:
                    self._bytein()
                self.a = (self.a << 1) & 0xFFFF
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
                if self.a & 0x8000:
                    break
            return d
        self.c -= qe << 16
        if self.a & 0x8000:
            return int(self.mps[cx])
        # MPS exchange path
        if self.a < qe:
            d = 1 - int(self.mps[cx])
            if switch:
                self.mps[cx] ^= 1
            self.icx[cx] = nlps
        else:
            d = int(self.mps[cx])
            self.icx[cx] = nmps
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E MQ encoder — TEST SUPPORT ONLY (round-trip gating)."""

    def __init__(self, num_contexts: int):
        self.icx = np.zeros(num_contexts, np.uint8)
        self.mps = np.zeros(num_contexts, np.uint8)
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out: List[int] = []
        self.b = -1  # pending byte (B register); -1 = none yet

    def _byteout(self) -> None:
        # T.88 Figure E.8 exactly: C is only MASKED here — the left
        # shifts happen in the encode renorm loop.
        if self.b == 0xFF:
            self._stuff()
            return
        if self.c < 0x8000000:
            self._commit()
            self.b = (self.c >> 19) & 0xFF
            self.c &= 0x7FFFF
            self.ct = 8
            return
        self.b += 1  # carry (b was <= 0xFE here, no ripple possible)
        if self.b == 0xFF:
            self.c &= 0x7FFFFFF
            self._stuff()
        else:
            self._commit()
            self.b = (self.c >> 19) & 0xFF
            self.c &= 0x7FFFF
            self.ct = 8

    def _stuff(self) -> None:
        # After an 0xFF the next byte carries only 7 data bits; the carry
        # (bit 27) lands in the stuffed byte's MSB — do NOT mask it off.
        self._commit()
        self.b = (self.c >> 20) & 0xFF
        self.c &= 0xFFFFF
        self.ct = 7

    def _commit(self) -> None:
        if self.b >= 0:
            self.out.append(self.b)

    def encode(self, cx: int, d: int) -> None:
        # T.88 Figures E.3/E.4 (CODEMPS/CODELPS). Interval geometry matches
        # the decoder above: lower sub-interval [0,Qe) = LPS, upper = MPS,
        # exchanged when the MPS width A-Qe drops below Qe.
        icx = self.icx[cx]
        qe, nmps, nlps, switch = QE_TABLE[icx]
        self.a -= qe
        if d == self.mps[cx]:
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe  # exchange: MPS takes the lower interval
            else:
                self.c += qe
            self.icx[cx] = nmps
        else:
            if self.a < qe:
                self.c += qe  # exchange: LPS takes the upper interval
            else:
                self.a = qe
            if switch:
                self.mps[cx] ^= 1
            self.icx[cx] = nlps
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS
        temp = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= temp:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self._commit()
        self.out.append(0xFF)
        self.out.append(0xAC)
        return bytes(self.out)


# Generic-region template pixel lists (dx, dy), BEFORE AT substitution.
# Ordering convention: sorted by (dy, dx), MSB first — matches pdf.js /
# jbig2dec context construction, which is the interop ground truth.
_FIXED = {
    0: [(-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
    1: [(-1, -2), (0, -2), (1, -2), (2, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-3, 0), (-2, 0), (-1, 0)],
    2: [(-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-2, 0), (-1, 0)],
    3: [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
}
NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
# T.88 6.2.5.7 — SLTP decision contexts for TPGDON, per template.
_TPGDON_CONTEXT = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _template(template: int, at: Optional[Sequence[Tuple[int, int]]]):
    pixels = list(_FIXED[template]) + list(at or NOMINAL_AT[template])
    pixels.sort(key=lambda p: (p[1], p[0]))
    return pixels


def decode_generic_region(
    data: bytes,
    width: int,
    height: int,
    template: int = 0,
    at: Optional[Sequence[Tuple[int, int]]] = None,
    tpgdon: bool = False,
    mq: Optional[MQDecoder] = None,
) -> np.ndarray:
    """Decode one arithmetic generic region -> bool[height, width]
    (True = black, the JBIG2 convention)."""
    pixels = _template(template, at)
    nbits = len(pixels)
    bitmap = np.zeros((height, width), np.uint8)
    dec = mq or MQDecoder(data, 1 << nbits)
    ltp = 0
    sltp_cx = _TPGDON_CONTEXT[template]
    for y in range(height):
        if tpgdon:
            if dec.decode(sltp_cx):
                ltp ^= 1
            if ltp:
                if y > 0:
                    bitmap[y] = bitmap[y - 1]
                continue
        row = bitmap[y]
        for x in range(width):
            cx = 0
            for dx, dy in pixels:
                xx, yy = x + dx, y + dy
                if 0 <= yy < height and 0 <= xx < width and yy <= y:
                    if yy == y and xx >= x:
                        bit = 0  # causality: only already-decoded pixels
                    else:
                        bit = int(bitmap[yy, xx])
                else:
                    bit = 0
                cx = (cx << 1) | bit
            row[x] = dec.decode(cx)
    return bitmap.astype(bool)


def encode_generic_region(
    bitmap: np.ndarray,
    template: int = 0,
    at: Optional[Sequence[Tuple[int, int]]] = None,
    tpgdon: bool = False,
) -> bytes:
    """TEST SUPPORT: arithmetic-encode a bitmap with the same context
    model the decoder uses (round-trip gating)."""
    bitmap = np.asarray(bitmap, np.uint8)
    height, width = bitmap.shape
    pixels = _template(template, at)
    enc = MQEncoder(1 << len(pixels))
    sltp_cx = _TPGDON_CONTEXT[template]
    ltp = 0
    for y in range(height):
        if tpgdon:
            same = y > 0 and bool(np.array_equal(bitmap[y], bitmap[y - 1]))
            sltp = 1 if same != bool(ltp) else 0
            enc.encode(sltp_cx, sltp)
            ltp ^= sltp
            if ltp:
                continue
        for x in range(width):
            cx = 0
            for dx, dy in pixels:
                xx, yy = x + dx, y + dy
                if 0 <= yy < height and 0 <= xx < width and (
                    yy < y or (yy == y and xx < x)
                ):
                    bit = int(bitmap[yy, xx])
                else:
                    bit = 0
                cx = (cx << 1) | bit
            enc.encode(cx, int(bitmap[y, x]))
    return enc.flush()
