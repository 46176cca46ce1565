"""Baseline JPEG codec (ITU-T T.81 sequential DCT) — numpy + stdlib.

Implements the baseline profile from the public JPEG standard:

* encoder: JFIF container, Annex K quantization tables scaled by the
  libjpeg quality formula, Annex K "typical" Huffman tables, 8x8
  forward DCT done as one matrix triple-product over all blocks,
  4:4:4 or 4:2:0 chroma subsampling, optional restart intervals;
* decoder: marker walk (APP*/COM skipped, DQT/SOF0/DHT/DRI/SOS
  parsed), canonical-Huffman 16-bit lookup tables, interleaved MCU
  entropy decode with restart-marker handling, vectorized
  dequantize + inverse DCT, chroma upsampling, BT.601 YCbCr->RGB.

Only baseline sequential (SOF0, 8-bit, Huffman) is supported —
progressive (SOF2) and arithmetic coding raise a clear error.  The
entropy scan is a per-symbol Python loop (inherent to Huffman
decoding); everything block-shaped is numpy, so test/thumbnail-sized
images decode in milliseconds.  Both directions use the same public
tables, and the bitstreams are standard baseline JFIF, readable by any
JPEG library.

This closes the last multimodal codec gate: with BMP + PNG
(mediacodec.py) and JPEG here, the image stages decode all three for
real with zero third-party dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, Annex K quantization + Huffman tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIG = np.argsort(ZIGZAG)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K "typical" Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# orthonormal DCT-II matrix: F = C @ X @ C.T, X = C.T @ F @ C
_k = np.arange(8)[:, None]
_n = np.arange(8)[None, :]
_DCT_C = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_DCT_C[0] = np.sqrt(1.0 / 8.0)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K base tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment (T.81 C.2)."""
    out, code, vi = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit peek LUT: window -> (symbol, code length); length 0 = invalid."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for s, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self):  # pad with 1-bits to a byte boundary (T.81 F.1.2.3)
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


class _BitReader:
    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int):
        while self.n < need:
            b = self.d[self.i] if self.i < len(self.d) else 0
            self.i += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, nbits: int):
        self._fill(nbits)
        self.n -= nbits
        self.acc &= (1 << self.n) - 1

    def get(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        self.acc &= (1 << self.n) - 1
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits -> signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (SSSS, magnitude bits)."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


# ---------------------------------------------------------------------------
# block helpers (vectorized over all blocks at once)
# ---------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 -> (nbh, nbw, 8, 8) view-order array."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    f = np.einsum("ij,abjk,lk->abil", _DCT_C, blocks, _DCT_C)
    return np.round(f / q).astype(np.int32)


def _dequant_idct(coeffs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(nb, 64) zigzag coeffs -> (nb, 8, 8) pixel blocks (float)."""
    dz = np.zeros((coeffs.shape[0], 64), dtype=np.float64)
    dz[:, ZIGZAG] = coeffs
    f = dz.reshape(-1, 8, 8) * q
    x = np.einsum("ji,ajk,kl->ail", _DCT_C, f, _DCT_C)
    return x + 128.0


def _pad_edge(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = img.shape[:2]
    return np.pad(
        img,
        [(0, -h % mh), (0, -w % mw)] + [(0, 0)] * (img.ndim - 2),
        mode="edge",
    )


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> baseline JFIF bytes.

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2).
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"encode_jpeg wants (h, w) or (h, w, 3), got {img.shape}")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = _quant_tables(quality)

    if gray:
        planes = [img.astype(np.float64)]
        factors = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        if subsample == "420":
            cbp, crp = _pad_edge(cb, 2, 2), _pad_edge(cr, 2, 2)
            cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    # pad every plane to its MCU-aligned size, then DCT+quantize all
    # blocks in one vectorized triple-product
    comp_blocks = []
    for idx, (plane, (fh, fv)) in enumerate(zip(planes, factors)):
        p = _pad_edge(plane, 8 * fv, 8 * fh)
        comp_blocks.append(_fdct_quant(p, qy if idx == 0 else qc))

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    dc_codes = [_canonical_codes(*_DC_LUMA)] + (
        [] if gray else [_canonical_codes(*_DC_CHROMA)] * 2
    )
    ac_codes = [_canonical_codes(*_AC_LUMA)] + (
        [] if gray else [_canonical_codes(*_AC_CHROMA)] * 2
    )

    # pre-zigzag all blocks: ZIGZAG maps zigzag position -> raster
    # index, exactly the gather we need (zz[..., k] = block[ZIGZAG[k]])
    zz = [cb.reshape(*cb.shape[:2], 64)[:, :, ZIGZAG] for cb in comp_blocks]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy),) if gray else ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in q.reshape(-1)[ZIGZAG])
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = factors[ci]
        qtid = 0 if ci == 0 else 1
        out += bytes([ci + 1, (fh << 4) | fv, qtid])
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tclass_id, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([tclass_id]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        out += bytes([ci + 1, td_ta])
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.align()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            for ci in range(ncomp):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        blk = zz[ci][my * fv + by, mx * fh + bx]
                        diff = int(blk[0]) - preds[ci]
                        preds[ci] = int(blk[0])
                        s, bits_val = _magnitude(diff)
                        code, ln = dc_codes[ci][s]
                        bw.write(code, ln)
                        if s:
                            bw.write(bits_val, s)
                        run = 0
                        nz = np.nonzero(blk[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[ci][0xF0]
                                bw.write(code, ln)
                                run -= 16
                            s, bits_val = _magnitude(v)
                            code, ln = ac_codes[ci][(run << 4) | s]
                            bw.write(code, ln)
                            bw.write(bits_val, s)
                            run = 0
                        if last < 63:
                            code, ln = ac_codes[ci][0x00]  # EOB
                            bw.write(code, ln)
            mcu_count += 1
    bw.align()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, c) uint8 (c = 1 or 3)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps = None  # list of (id, fh, fv, qid)
    h = w = 0
    restart_interval = 0
    scan_comps = None
    scan_start = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT, possibly several tables
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[o + 1 : o + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            kinds = {0xC2: "progressive", 0xC9: "arithmetic-coded"}
            raise ValueError(
                f"{kinds.get(marker, f'SOF{marker - 0xC0}')} JPEG unsupported "
                "(baseline sequential only)"
            )
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, qid = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
        elif marker == 0xC4:  # DHT, possibly several tables
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nvals = sum(bits)
                vals = list(body[o + 17 : o + 17 + nvals])
                huff[(tc, th)] = _decode_lut(bits, vals)
                o += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            scan_start = pos + 2 + seglen
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # split the entropy stream on restart markers, strip byte stuffing
    segs: list[bytes] = []
    cur = bytearray()
    i = scan_start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or another marker
        cur.append(b)
        i += 1
    segs.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    total_mcus = mcus_x * mcus_y

    by_id = {c[0]: c for c in comps}
    order = []  # per scan component: (comp index, fh, fv, dc lut, ac lut)
    for cs, td, ta in scan_comps:
        cid, fh, fv, qid = by_id[cs]
        order.append((comps.index(by_id[cs]), fh, fv, huff[(0, td)], huff[(1, ta)]))

    nblk = [
        (mcus_y * fv, mcus_x * fh) for (_, fh, fv, _, _) in order
    ]
    coeffs = [
        np.zeros((bh * bw_, 64), dtype=np.int32) for (bh, bw_) in nblk
    ]

    mcu = 0
    seg_idx = 0
    br = _BitReader(segs[0])
    preds = [0] * len(order)
    while mcu < total_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG truncated: missing restart segment")
            br = _BitReader(segs[seg_idx])
            preds = [0] * len(order)
        my, mx = divmod(mcu, mcus_x)
        for si, (ci, fh, fv, (dsym, dln), (asym, aln)) in enumerate(order):
            bw_ = nblk[si][1]
            for byy in range(fv):
                for bxx in range(fh):
                    blk = coeffs[si][(my * fv + byy) * bw_ + (mx * fh + bxx)]
                    wdw = br.peek16()
                    s, ln = int(dsym[wdw]), int(dln[wdw])
                    if ln == 0:
                        raise ValueError("invalid DC Huffman code")
                    br.skip(ln)
                    diff = _extend(br.get(s), s) if s else 0
                    preds[si] += diff
                    blk[0] = preds[si]
                    k = 1
                    while k < 64:
                        wdw = br.peek16()
                        rs, ln = int(asym[wdw]), int(aln[wdw])
                        if ln == 0:
                            raise ValueError("invalid AC Huffman code")
                        br.skip(ln)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        s = rs & 0x0F
                        if k > 63:
                            raise ValueError("AC coefficient index overflow")
                        blk[k] = _extend(br.get(s), s)
                        k += 1
        mcu += 1

    # reconstruct planes
    planes = []
    for si, (ci, fh, fv, _, _) in enumerate(order):
        _, _, _, qid = comps[ci]
        q = qtables[qid]
        bh, bw_ = nblk[si]
        px = _dequant_idct(coeffs[si], q)  # (nb, 8, 8)
        plane = (
            px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        # upsample to full resolution
        if fh != hmax or fv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // fv, axis=0), hmax // fh, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
