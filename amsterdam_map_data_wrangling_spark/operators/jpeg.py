"""Baseline JFIF (JPEG) codec — the engine's first LOSSY-family decoder,
closing the last format gap that kept ``multimodal.decode_stub`` alive
for images (r17 verdict "Next round" #7). Everything is spec-derived
(ITU-T T.81 / JFIF 1.02, public documents): Annex K "typical" Huffman
tables, the zigzag order, the category/extend coding of DC/AC
coefficients, byte stuffing, restart markers, the separable 2-D IDCT,
and the JFIF YCbCr↔RGB transform.

Scope and honesty:
- DECODER (:func:`decode_baseline_jpeg`): full baseline sequential DCT
  path — marker walk (APPn/COM skip, DQT, DHT, DRI, SOF0, SOS), Huffman
  entropy decode with FF00 unstuffing and RSTn handling, dequantize,
  de-zigzag, float IDCT, level shift, clamp, chroma upsampling by
  replication for sampling factors up to 2x2. Progressive (SOF2),
  arithmetic coding, 12-bit precision, and hierarchical modes return
  None (fail-safe — the same contract as every other parser here).
- ENCODER (:func:`encode_baseline_jpeg`): COEFFICIENT-level baseline
  encoder (quantized coefficient blocks → compliant bitstream) used by
  the synthesizer and the roundtrip fuzz pin. It is the test harness
  for the decoder, not a production image encoder (no FDCT — the
  engine curates data, it does not author photos).
- CROSS-CHECK: the container ships no independent JPEG codec (no
  Pillow), so the external cross-check is decomposed and pinned in
  tests/test_jpeg.py: (a) coefficient-level encode→decode roundtrip
  fuzz (Huffman/RLE/zigzag/stuffing/restarts are exact inverses), (b)
  the IDCT against an independent direct-cosine-sum reference (numpy,
  different code path), (c) DC-only closed forms, (d) an OPTIONAL
  Pillow decode comparison that becomes live the moment the
  environment ships PIL (env-skip ledger).

Reference basis: the reference repo stores media as opaque paths only;
this family exists for the 100 TB training-data story (SURVEY §2.10) —
image payloads as binary columns, decoded map-side, payload bytes never
shuffled.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# ---------------------------------------------------------------------------
# Spec tables (ITU-T T.81 Annex K — public)
# ---------------------------------------------------------------------------

#: zigzag order: ZIGZAG[k] = (row, col) of the k-th coefficient
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

#: Annex K.3.1 typical luminance DC table: BITS (codes per length 1-16),
#: then HUFFVAL (symbol per code, canonical order)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]
#: Annex K.3.1 typical chrominance DC table
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]
#: Annex K.3.2 typical luminance AC table
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
#: Annex K.3.2 typical chrominance AC table
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: separable IDCT basis: _COS[u][x] = C(u) * cos((2x+1) u pi / 16),
#: C(0)=1/sqrt(2) — plain double precision, deterministic IEEE
import math as _math

_COS = [
    [
        (1.0 / _math.sqrt(2.0) if u == 0 else 1.0)
        * _math.cos((2 * x + 1) * u * _math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment.
    Memoized: the Annex K tables are constants, and a per-image rebuild
    showed up in the sf0.1 gate wall (4 tables x n_images)."""
    key = (tuple(bits), tuple(vals))
    hit = _CODE_CACHE.get(key)
    if hit is not None:
        return hit
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    _CODE_CACHE[key] = out
    return out


_CODE_CACHE: dict = {}
_DECODE_CACHE: dict = {}


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol. Memoized on (bits, vals) — decoders
    re-parse DHT per payload, but the tables across a synthesized (or
    any single-encoder) corpus are identical."""
    key = (tuple(bits), tuple(vals))
    hit = _DECODE_CACHE.get(key)
    if hit is not None:
        return hit
    out = {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()
    }
    _DECODE_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# Encoder (coefficient-level)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                b = self._acc
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc = 0
                self._n = 0

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _extend_bits(v: int, s: int) -> int:
    """The s appended bits for a value of category s (T.81 F.1.2.1)."""
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(
    w: _BitWriter,
    coeffs: list[int],
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Encode one 64-coefficient (natural zigzag order) block; returns
    the new DC predictor."""
    dc = coeffs[0]
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(_extend_bits(diff, s), s)
    run = 0
    last_nonzero = 0
    for k in range(63, 0, -1):
        if coeffs[k]:
            last_nonzero = k
            break
    for k in range(1, last_nonzero + 1):
        v = coeffs[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(_extend_bits(v, s), s)
        run = 0
    if last_nonzero < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_baseline_jpeg(
    width: int,
    height: int,
    comp_blocks: list[list[list[int]]],
    sampling: list[tuple[int, int]],
    quant: list[list[int]],
    restart_interval: int = 0,
) -> bytes:
    """Compliant baseline JFIF bitstream from QUANTIZED coefficient
    blocks.

    ``comp_blocks[c]`` is the component's 8x8 blocks in raster order of
    its (possibly subsampled) block grid, each a 64-list in zigzag
    order. ``sampling[c] = (h, v)``. ``quant[c]`` is the component's
    64-entry zigzag quantization table (component 0 -> table 0, others
    -> table 1). Components use the Annex K typical Huffman tables
    (luma tables for component 0, chroma for the rest)."""
    ncomp = len(comp_blocks)
    if ncomp not in (1, 3):
        raise ValueError("1 or 3 components")
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFE, b"spark-graft synthetic")  # COM: skip path
    # DQT (8-bit): table 0 = quant[0]; table 1 = quant[1] if present
    out += _seg(0xDB, bytes([0x00]) + bytes(quant[0]))
    if ncomp == 3:
        out += _seg(0xDB, bytes([0x01]) + bytes(quant[1]))
    # DHT
    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if ncomp == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    # SOF0
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(ncomp)
    for c in range(ncomp):
        h, v = sampling[c]
        sof += bytes([c + 1, (h << 4) | v, 0 if c == 0 else 1])
    out += _seg(0xC0, bytes(sof))
    # SOS
    sos = bytearray([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))

    dc_codes = [
        _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        if c == 0
        else _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        for c in range(ncomp)
    ]
    ac_codes = [
        _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        if c == 0
        else _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
        for c in range(ncomp)
    ]

    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    blocks_w = [
        mcus_x * sampling[c][0] for c in range(ncomp)
    ]  # component block-grid width

    w = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                w.align()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for c in range(ncomp):
                h, v = sampling[c]
                for by in range(v):
                    for bx in range(h):
                        gx = mx * h + bx
                        gy = my * v + by
                        blk = comp_blocks[c][gy * blocks_w[c] + gx]
                        preds[c] = _encode_block(
                            w, blk, preds[c], dc_codes[c], ac_codes[c]
                        )
            mcu_index += 1
    w.align()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at any
    marker (FFxx, xx != 0) and reports it."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                return False
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        # keep ONLY the unread bits before appending (self-review r18:
        # the unmasked accumulator grew one byte per fill forever, so a
        # megabyte entropy stream made every shift/mask O(stream) — an
        # O(n^2) decode, invisible on gate-sized images, real on photos)
        self._acc = ((self._acc & ((1 << self._n) - 1)) << 8) | b
        self._n += 8
        return True

    def bit(self) -> int | None:
        if self._n == 0 and not self._fill():
            return None
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def sync_restart(self) -> bool:
        """Byte-align and consume an expected RSTn marker."""
        self._n = 0
        if self.marker is None:
            # marker not yet seen: scan forward
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0:
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            return False
        self.pos += 2
        self.marker = None
        return True


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        b = r.bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_block(coeffs: list[int]) -> list[int]:
    """8x8 inverse DCT (T.81 A.3.3) + level shift + clamp, separable
    double-precision (rows then columns) over FREQUENCY-domain natural
    order F[u][v] = coeffs[u * 8 + v]. DC-only fast path: the IDCT of a
    lone F(0,0) is the constant F00/8 (C(0)^2/4 = 1/8 exactly in the
    formula; computed in the same double arithmetic as the general
    path's u=v=0 term, so the fast path is value-identical — pinned by
    the independent-IDCT fuzz in tests/test_jpeg.py, whose random
    blocks include DC-only cases)."""
    if not any(coeffs[1:]):
        # same association as the general path: COS[0][y] * (COS[0][x] * F00)
        base = _COS[0][0] * (_COS[0][0] * coeffs[0])
        val = int(_math.floor(base / 4.0 + 128.0 + 0.5))
        val = 0 if val < 0 else (255 if val > 255 else val)
        return [val] * 64
    tmp = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        row = coeffs[u * 8 : u * 8 + 8]
        if any(row):
            for x in range(8):
                s = 0.0
                for v in range(8):
                    if row[v]:
                        s += _COS[v][x] * row[v]
                tmp[u][x] = s
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                if tmp[u][x]:
                    s += _COS[u][y] * tmp[u][x]
            val = int(_math.floor(s / 4.0 + 128.0 + 0.5))
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def decode_baseline_jpeg(
    payload: bytes, coefficients_only: bool = False
):
    """Decode a baseline sequential JFIF payload.

    Returns ``(width, height, planes)`` where ``planes`` is a list (one
    per component, in file order: Y[, Cb, Cr]) of full-resolution
    row-major pixel lists (chroma replicated up to image size), or
    ``None`` on any unsupported/damaged structure (fail-safe, never a
    guess). With ``coefficients_only=True`` returns
    ``(width, height, comp_blocks)`` — the DEQUANTIZED-before-IDCT...
    no: the QUANTIZED coefficient blocks exactly as entropy-decoded
    (zigzag order), the probe the roundtrip fuzz pins against the
    encoder's input."""
    b = bytes(payload)
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    pos = 2
    quant: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before scan
            return None
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(b):
            return None
        seglen = int.from_bytes(b[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > len(b):
            return None
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    return None  # 8-bit only (baseline)
                if i + 65 > len(seg):
                    return None
                quant[tq] = list(seg[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(seg):
                    return None
                vals = list(seg[i + 17 : i + 17 + n])
                tab = _decode_table(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                i += 17 + n
        elif marker == 0xDD:  # DRI
            if len(seg) != 2:
                return None
            restart_interval = int.from_bytes(seg, "big")
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6 or seg[0] != 8:
                return None
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3) or len(seg) < 6 + 3 * ncomp:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    return None
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            frame = (width, height, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types: fail safe
        elif marker == 0xDA:  # SOS
            if frame is None or len(seg) < 4:
                return None
            ns = seg[0]
            width, height, comps = frame
            if ns != len(comps) or len(seg) < 1 + 2 * ns + 3:
                return None
            scan = []
            for k in range(ns):
                cs, tds = seg[1 + 2 * k], seg[2 + 2 * k]
                td, ta = tds >> 4, tds & 0x0F
                match = [c for c in comps if c["id"] == cs]
                if not match:
                    return None
                scan.append((match[0], td, ta))
            return _decode_scan(
                b,
                pos + seglen,
                width,
                height,
                scan,
                quant,
                dc_tabs,
                ac_tabs,
                restart_interval,
                coefficients_only,
            )
        pos += seglen
    return None


def _decode_scan(
    b: bytes,
    pos: int,
    width: int,
    height: int,
    scan: list,
    quant: dict,
    dc_tabs: dict,
    ac_tabs: dict,
    restart_interval: int,
    coefficients_only: bool,
):
    ncomp = len(scan)
    hmax = max(c["h"] for c, _t, _a in scan)
    vmax = max(c["v"] for c, _t, _a in scan)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    blocks_w = [mcus_x * c["h"] for c, _t, _a in scan]
    blocks_h = [mcus_y * c["v"] for c, _t, _a in scan]
    for c, td, ta in scan:
        if td not in dc_tabs or ta not in ac_tabs or c["tq"] not in quant:
            return None
    comp_blocks: list[list[list[int] | None]] = [
        [None] * (blocks_w[i] * blocks_h[i]) for i in range(ncomp)
    ]
    r = _BitReader(b, pos)
    preds = [0] * ncomp
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                if not r.sync_restart():
                    return None
                preds = [0] * ncomp
            for ci in range(ncomp):
                comp, td, ta = scan[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = _decode_entropy_block(
                            r, dc_tabs[td], ac_tabs[ta], preds, ci
                        )
                        if blk is None:
                            return None
                        gx = mx * comp["h"] + bx
                        gy = my * comp["v"] + by
                        comp_blocks[ci][gy * blocks_w[ci] + gx] = blk
            mcu_index += 1
    if coefficients_only:
        return width, height, [list(cb) for cb in comp_blocks]
    # dequantize + de-zigzag + IDCT per block, assemble planes
    planes = []
    for ci in range(ncomp):
        comp, _td, _ta = scan[ci]
        q = quant[comp["tq"]]
        bw, bh = blocks_w[ci], blocks_h[ci]
        # component-resolution pixel grid
        cw, ch = bw * 8, bh * 8
        grid = [0] * (cw * ch)
        for gy in range(bh):
            for gx in range(bw):
                zz = comp_blocks[ci][gy * bw + gx]
                nat = [0] * 64
                for k in range(64):
                    row, col = ZIGZAG[k]
                    nat[row * 8 + col] = zz[k] * q[k]
                px = _idct_block(nat)
                for yy in range(8):
                    base = (gy * 8 + yy) * cw + gx * 8
                    grid[base : base + 8] = px[yy * 8 : yy * 8 + 8]
        # upsample to image resolution by replication
        sx = hmax // comp["h"]
        sy = vmax // comp["v"]
        plane = [0] * (width * height)
        for y in range(height):
            src_y = y // sy
            row_base = src_y * cw
            out_base = y * width
            for x in range(width):
                plane[out_base + x] = grid[row_base + x // sx]
        planes.append(plane)
    return width, height, planes


def _decode_entropy_block(
    r: _BitReader, dc_tab: dict, ac_tab: dict, preds: list[int], ci: int
) -> list[int] | None:
    blk = [0] * 64
    s = _huff_decode(r, dc_tab)
    if s is None or s > 11:
        return None
    if s:
        v = r.bits(s)
        if v is None:
            return None
        diff = _extend(v, s)
    else:
        diff = 0
    preds[ci] += diff
    blk[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac_tab)
        if rs is None:
            return None
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k >= 64:
            return None
        v = r.bits(size)
        if v is None:
            return None
        blk[k] = _extend(v, size)
        k += 1
    return blk


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """JFIF 1.02 conversion, floor(x+0.5) rounding, clamped."""

    def cl(x: float) -> int:
        v = int(_math.floor(x + 0.5))
        return 0 if v < 0 else (255 if v > 255 else v)

    return (
        cl(y + 1.402 * (cr - 128)),
        cl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        cl(y + 1.772 * (cb - 128)),
    )


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

#: flat quant table (all ones) in zigzag order
_Q_ONES = [1] * 64


def synthesize_jpeg_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL baseline JFIF payloads with closed-form pixel
    statistics (the GIF/BMP synthesis pattern): DC-only blocks, so
    after the full decode path (Huffman, restart markers, dequantize,
    IDCT, level shift) every 8x8 block is exactly its intended constant
    — lossless through the lossy pipeline by construction, hence
    SQL-replayable.

    - even id: GRAYSCALE 16x8 (two luma blocks), block bx's value
      ``(id*7 + bx*31) % 256``, quant DC = 1, restart interval 1 (an
      RST0 sits between the two MCUs — the restart path is in the gated
      data, not just the fuzz);
    - odd id: 4:4:4 COLOR 8x8, constant planes Y=(id*5)%256,
      Cb=(id*3)%256, Cr=(id*11)%256, quant DC = 2 (the dequantize
      multiply is witnessed: encoder halves, decoder doubles).
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 2 == 0:
                    vals = [(mid * 7 + bx * 31) % 256 for bx in range(2)]
                    blocks = [
                        [8 * (v - 128)] + [0] * 63 for v in vals
                    ]
                    payload = encode_baseline_jpeg(
                        16, 8, [blocks], [(1, 1)], [_Q_ONES],
                        restart_interval=1,
                    )
                else:
                    y, cb, cr = (
                        (mid * 5) % 256,
                        (mid * 3) % 256,
                        (mid * 11) % 256,
                    )
                    q2 = [2] + [1] * 63
                    blocks = [
                        [[8 * (v - 128) // 2] + [0] * 63] for v in (y, cb, cr)
                    ]
                    payload = encode_baseline_jpeg(
                        8, 8, blocks, [(1, 1)] * 3, [q2, q2]
                    )
                ids.append(mid)
                payloads.append(payload)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        batches, "media_id long, payload binary"
    )


def extract_jpeg_pixels(media: DataFrame) -> DataFrame:
    """Arrow-batched FULL baseline-JPEG decode over binary payloads —
    the lossy-codec twin of ``multimodal.extract_gif_pixels``. Output
    contract matches the image family: one row per (asset, channel)
    with exact-integer n_pixels / sum / max / top-row sum over the
    STORAGE-NATIVE planes (channel 0=Y, 1=Cb, 2=Cr — JPEG stores
    YCbCr; the BMP twin's channels are storage-order B/G/R for the
    same reason). RGB conversion is :func:`ycbcr_to_rgb`, pinned in
    tests. Undecodable or non-baseline payloads yield no rows
    (fail-safe). Scale: map-only — payload bytes never leave the
    scanning executor; 1-3 rows of integers per asset."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = {
                "media_id": [],
                "channel": [],
                "n_pixels": [],
                "sum_val": [],
                "max_val": [],
                "top_row_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                dec = decode_baseline_jpeg(bytes(payload))
                if dec is None:
                    continue
                w, h, planes = dec
                for ch, plane in enumerate(planes):
                    rows["media_id"].append(int(mid))
                    rows["channel"].append(ch)
                    rows["n_pixels"].append(len(plane))
                    rows["sum_val"].append(sum(plane))
                    rows["max_val"].append(max(plane))
                    rows["top_row_sum"].append(sum(plane[:w]))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches,
        "media_id long, channel int, n_pixels long, sum_val long, "
        "max_val long, top_row_sum long",
    )
