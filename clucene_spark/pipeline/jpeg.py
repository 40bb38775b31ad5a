"""Baseline-sequential JPEG codec (ITU-T T.81) in stdlib + numpy.

JPEG was the one image format `pipeline/multimodal.py` still stubbed
("needs external codec libraries") — but baseline JPEG is pure
arithmetic: an 8x8 DCT, the Annex-K quantization tables, canonical
Huffman coding, and marker framing, all implementable with numpy and
`struct`. This module provides the encode/decode twin pair in the same
spirit as the WAV/BMP/PNG codecs there: gates and tests build GENUINE
payloads deterministically and decode them back, so the Spark-side
multimodal plumbing is exercised on real bytes end-to-end.

Scope (the overwhelmingly common web shape):
  - encode: baseline DCT, 8-bit, grayscale or YCbCr 4:4:4 / 4:2:0,
    standard Annex-K quantization (quality-scaled, IJG convention) and
    Huffman tables, JFIF APP0 header.
  - decode: baseline DCT (SOF0) only, 8-bit, grayscale / 4:4:4 / 4:2:0
    (and any sampling whose factors divide the max), DQT/DHT read from
    the stream (NOT assumed), restart intervals (DRI/RSTn) honored.
    Progressive (SOF2), arithmetic coding, and 12-bit raise
    NotImplementedError honestly.

Everything here derives from the public T.81 spec; the quantization /
Huffman constants are the spec's own Annex K examples.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) ----------------------------------------

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# DC/AC Huffman table specs: (BITS[1..16], HUFFVAL) per T.81 K.3.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """(64,) flat indices into an 8x8 block in zigzag scan order,
    generated (not transcribed) from the diagonal-walk definition."""
    idx = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - j, j) for j in rng]
        if s % 2 == 0:
            diag.reverse()
        idx.extend(r * 8 + c for r, c in diag)
    return np.array(idx, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8-point DCT-II basis: forward F = M @ f @ M.T equals the
# T.81 A.3.3 definition (1/4 C(u)C(v) sum-of-cosines) exactly for N=8
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _DCT_M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> spec table, 100 -> all-ones."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


# --- bit IO -----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # marker byte hit mid-stream (RSTn / EOI)

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1            # stuffed byte
            else:
                self.marker = nxt        # real marker: stream segment over
                self.pos += 1
                b = 0                    # pad reads with zeros
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.marker is not None:
                self.acc <<= 8
                self.nbits += 8
            else:
                self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Consume an expected RSTn and realign to a byte boundary."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet consumed by _fill: scan forward for it
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
            self.pos += 2
        else:
            self.marker = None


# --- Huffman ----------------------------------------------------------------

def _canonical_codes(bits, vals):
    """(value -> (code, length)) canonical Huffman per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical-code decoder: (min_code, max_code, val_index) per length
    (the T.81 F.2.2.3 DECODE procedure)."""

    def __init__(self, bits, vals):
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += n
                k += n
                self.max_code[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read(1)
        length = 1
        while code > self.max_code[length]:
            code = (code << 1) | br.read(1)
            length += 1
            if length > 16:
                raise ValueError("invalid JPEG Huffman code")
        return self.vals[self.val_ptr[length] + code - self.min_code[length]]


def _magnitude(v: int) -> tuple[int, int]:
    """(category, bits) for a DC diff / AC coefficient (T.81 F.1.2.1.2):
    negative values store as value - 1 in `category` bits."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v >= 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


# --- color ------------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --- encoder ------------------------------------------------------------------

def _encode_plane(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(h, w) float plane -> (n_blocks_y, n_blocks_x, 64) quantized zigzag
    coefficients; the DCT/quantize is one vectorized einsum over all
    blocks (no per-block python loop)."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    shifted = blocks - 128.0
    coef = np.einsum("ux,byxz,vz->byuv", _DCT_M, shifted, _DCT_M)
    q = np.round(coef / qt).astype(np.int32)
    return q.reshape(q.shape[0], q.shape[1], 64)[..., _ZIGZAG]


def _write_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                 dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    cat, bits = _magnitude(diff)
    code, ln = dc_codes[cat]
    bw.write(code, ln)
    if cat:
        bw.write(bits, cat)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """(h, w) or (h, w, 1) grayscale / (h, w, 3) RGB uint8 -> baseline
    JFIF bytes. `subsample=True` writes 4:2:0 (2x2-averaged chroma);
    default is 4:4:4. Deterministic: same pixels+quality -> same bytes."""
    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[:, :, 0]
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)

    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        if subsample:
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            full = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
            cb = full[0::2, 0::2, 1] + full[0::2, 1::2, 1] \
                + full[1::2, 0::2, 1] + full[1::2, 1::2, 1]
            cr = full[0::2, 0::2, 2] + full[0::2, 1::2, 2] \
                + full[1::2, 0::2, 2] + full[1::2, 1::2, 2]
            planes = [ycc[..., 0], cb / 4.0, cr / 4.0]
        else:
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]

    zz = [
        _encode_plane(p, qt_l if i == 0 else qt_c)
        for i, p in enumerate(planes)
    ]

    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0] * len(planes)
    if gray or not subsample:
        nby, nbx = zz[0].shape[:2]
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(len(planes)):
                    preds[ci] = _write_block(
                        bw, zz[ci][by, bx], preds[ci],
                        dc_l if ci == 0 else dc_c,
                        ac_l if ci == 0 else ac_c,
                    )
    else:
        # 4:2:0 MCU = 4 luma blocks + 1 Cb + 1 Cr
        nby_c, nbx_c = zz[1].shape[:2]
        nby_l, nbx_l = zz[0].shape[:2]
        for by in range(nby_c):
            for bx in range(nbx_c):
                for dy in range(2):
                    for dx in range(2):
                        ly, lx = min(2 * by + dy, nby_l - 1), min(2 * bx + dx, nbx_l - 1)
                        preds[0] = _write_block(bw, zz[0][ly, lx], preds[0], dc_l, ac_l)
                preds[1] = _write_block(bw, zz[1][by, bx], preds[1], dc_c, ac_c)
                preds[2] = _write_block(bw, zz[2][by, bx], preds[2], dc_c, ac_c)
    bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0 (density 1,1)

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in tbl.flatten()[_ZIGZAG])

    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)

    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        hv = 0x22 if subsample else 0x11
        sof += bytes([1, hv, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xFF\xC0" + sof  # SOF0

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)

    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    sos += bytes([1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + sos
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> dict:
    """Baseline JFIF/JPEG bytes -> {'kind','width','height','channels',
    'pixels'}: marker walk, DQT/DHT from the stream, Huffman + dequant +
    IDCT, chroma upsample, YCbCr->RGB. SOF0 only (progressive /
    arithmetic / 12-bit raise NotImplementedError)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    comps = []       # (cid, h_samp, v_samp, qt_id)
    height = width = None
    restart_interval = 0
    scan_pos = None
    scan_map = {}    # cid -> (dc_id, ac_id)

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq:
                    raise NotImplementedError("16-bit quantization tables")
                tbl = np.frombuffer(seg, np.uint8, 64, sp).astype(np.int32)
                qts[tq] = tbl[_UNZIGZAG].reshape(8, 8)
                sp += 64
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1:sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _HuffDecoder(bits, vals)
                sp += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_map[cid] = (tt >> 4, tt & 0xF)
            scan_pos = pos + seg_len
            break
        pos += seg_len

    if scan_pos is None or height is None:
        raise ValueError("JPEG missing SOS/SOF")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    br = _BitReader(payload, scan_pos)
    preds = {c[0]: 0 for c in comps}
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = {c[0]: 0 for c in comps}
            for cid, hs, vs, tq in comps:
                dc_t = dc_tabs[scan_map[cid][0]]
                ac_t = ac_tabs[scan_map[cid][1]]
                qt = qts[tq]
                for dy in range(vs):
                    for dx in range(hs):
                        zz = np.zeros(64, dtype=np.int32)
                        cat = dc_t.decode(br)
                        diff = _extend(br.read(cat), cat) if cat else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        i = 1
                        while i < 64:
                            rs = ac_t.decode(br)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                i += 16
                                continue
                            run, cat = rs >> 4, rs & 0xF
                            i += run
                            if i > 63:
                                raise ValueError("AC index overflow")
                            zz[i] = _extend(br.read(cat), cat)
                            i += 1
                        block = (zz[_UNZIGZAG].reshape(8, 8) * qt).astype(np.float64)
                        pix = _DCT_M.T @ block @ _DCT_M + 128.0
                        y0 = (my * vs + dy) * 8
                        x0 = (mx * hs + dx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    if len(comps) == 1:
        cid = comps[0][0]
        px = np.clip(np.round(planes[cid][:height, :width]), 0, 255).astype(np.uint8)
        return {"kind": "image", "width": width, "height": height,
                "channels": 1, "pixels": px[:, :, None]}

    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:height, :width])
    rgb = _ycbcr_to_rgb(np.stack(full, axis=-1))
    return {"kind": "image", "width": width, "height": height,
            "channels": 3, "pixels": rgb}
