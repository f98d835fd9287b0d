"""Baseline JFIF (ITU-T T.81 sequential DCT) codec in pure numpy/stdlib.

This container ships no image library, so — like the round-3 PNG/BMP work —
the dominant web-corpus format is implemented from the public spec:

  encoder: RGB -> YCbCr (JFIF), 4:4:4 or 4:2:0, batched 8x8 forward DCT
           (one einsum over every block), Annex-K quantization tables scaled
           by libjpeg's quality curve, zigzag + DC-differential + run-length
           huffman entropy coding with the Annex-K typical tables, byte
           stuffing, SOI/APP0/DQT/SOF0/DHT/SOS/EOI marker framing.
  decoder: full marker parse (DQT 8/16-bit, DHT, SOF0, DRI, SOS; APPn/COM
           skipped), spec DECODE-procedure huffman (mincode/maxcode/valptr,
           F.2.2.3) with byte-unstuffing and RSTn handling, then everything
           after entropy decode is BATCHED numpy: dezigzag + dequantize +
           inverse DCT across all blocks of a component in one einsum,
           chroma upsample by np.repeat, vectorized YCbCr->RGB.

Scope (honest): baseline sequential only — no progressive scans, no
arithmetic coding, no 12-bit precision.  That covers the overwhelming
majority of web JPEGs; a progressive file raises a clear ValueError.

Reference parity note: the reference engine delegates image payloads to
external libraries; this module exists because the BASELINE input table
(image_id, bytes, w, h, fmt, caption, phash) makes decode a first-class
pipeline stage (stages/images.py DecodeFeatures).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — public spec constants)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)  # natural-order index -> zigzag position

QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K "typical" huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II matrix: pixels = D.T @ coef @ D, coef = D @ pixels @ D.T
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(0.25)
_DCT[0] *= 1 / np.sqrt(2)


def scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve (public ijg code): 1..100 -> scaled Annex-K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _build_canonical_codes(bits: list[int], vals: list[int]):
    """(code, length) per symbol value, canonical per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss category, amplitude bits) for a signed coefficient (F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        # Truncate drained high bits: otherwise acc grows into an ever-larger
        # bigint and each write() becomes O(output size) -> O(n^2) encode.
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """plane (H, W) float, H/W multiples of 8 -> (n_blocks, 64) float DCT.

    Two batched matmuls, not a 3-operand einsum: numpy's un-optimized
    multi-operand einsum path is ~16x slower on thumbnail-sized batches
    (measured 115 ms vs 7 ms for 8000 blocks)."""
    H, W = plane.shape
    blocks = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = _DCT @ (blocks - 128.0) @ _DCT.T
    return coef.reshape(-1, 64)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) dequantized natural-order coef -> (n_blocks, 8, 8)
    float.  Batched matmuls for the same reason as :func:`_fdct_blocks`."""
    c = coef.reshape(-1, 8, 8)
    return (_DCT.T @ c) @ _DCT + 128.0


def _rgb_to_ycbcr(px: np.ndarray):
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    H, W = plane.shape
    ph = (-H) % mh
    pw = (-W) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(writer, zz, pred, dc_codes, ac_codes) -> int:
    """Entropy-encode one zigzagged quantized block; returns new DC pred."""
    dc = int(zz[0])
    ssss, bits = _magnitude(dc - pred)
    code, ln = dc_codes[ssss]
    writer.write(code, ln)
    if ssss:
        writer.write(bits, ssss)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        ssss, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | ssss]
        writer.write(code, ln)
        writer.write(bits, ssss)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of an (h, w, 3) uint8 RGB array.

    subsampling: "444" (no chroma subsampling — use for noise-like content
    where 4:2:0 chroma averaging would wreck PSNR) or "420".
    restart_interval: emit DRI + RSTn markers every N MCUs (0 = never) —
    exercised by the decoder's restart handling tests.
    """
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    assert subsampling in ("444", "420")
    h, w = pixels.shape[:2]
    ql = scaled_qtable(QTABLE_LUMA, quality)
    qc = scaled_qtable(QTABLE_CHROMA, quality)
    y, cb, cr = _rgb_to_ycbcr(pixels)

    if subsampling == "420":
        hs, vs = 2, 2
        ype = _pad_to(y, 16, 16)
        # pad to the MCU grid first, then 2x2 box-average the chroma planes
        cbp = _pad_to(cb, 16, 16)
        crp = _pad_to(cr, 16, 16)
        cbd = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        crd = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        hs, vs = 1, 1
        ype = _pad_to(y, 8, 8)
        cbd = _pad_to(cb, 8, 8)
        crd = _pad_to(cr, 8, 8)

    # quantize all blocks of each component (batched)
    def quantize(plane, qt):
        coef = _fdct_blocks(plane)
        qz = np.round(coef / qt[np.newaxis, :].astype(np.float64))
        return qz.astype(np.int64)[:, ZIGZAG]  # zigzag order per block

    yq = quantize(ype, ql)
    cbq = quantize(cbd, qc)
    crq = quantize(crd, qc)

    dc_l = _build_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    wr = _BitWriter()
    yW = ype.shape[1] // 8  # luma blocks per row
    cW = cbd.shape[1] // 8
    mcu_rows = ype.shape[0] // (8 * vs)
    mcu_cols = ype.shape[1] // (8 * hs)
    pred = [0, 0, 0]
    mcu_count = 0
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.flush()
                wr.buf += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
                pred = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    bi = (mr * vs + by) * yW + (mc * hs + bx)
                    pred[0] = _encode_block(wr, yq[bi], pred[0], dc_l, ac_l)
            pred[1] = _encode_block(wr, cbq[mr * cW + mc], pred[1], dc_c, ac_c)
            pred[2] = _encode_block(wr, crq[mr * cW + mc], pred[2], dc_c, ac_c)
            mcu_count += 1
    wr.flush()

    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, ql), (1, qc)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + bytes(int(v) for v in qt[ZIGZAG])
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hs << 4) | vs, 0])  # Y
    out += bytes([2, 0x11, 1])            # Cb
    out += bytes([3, 0x11, 1])            # Cr
    for tc, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | tid)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11])  # comp -> (dc<<4)|ac table ids
    out += bytes([0, 63, 0])  # Ss, Se, Ah/Al
    out += wr.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


_LUT_CACHE: dict[tuple[bytes, bytes], tuple[np.ndarray, np.ndarray]] = {}


class _HuffTable:
    """Huffman table as a 16-bit-peek LUT: one array index resolves any
    canonical code (max length 16, T.81 C.2) to (symbol, length).  Built
    once per distinct (BITS, HUFFVAL) spec and cached process-wide — a
    corpus encoded with the Annex-K typical tables pays the build once."""

    __slots__ = ("sym", "length", "key")

    def __init__(self, bits: list[int], vals: list[int]):
        key = (bytes(bits), bytes(vals))
        self.key = key
        cached = _LUT_CACHE.get(key)
        if cached is None:
            sym = np.zeros(1 << 16, np.int64)
            length = np.zeros(1 << 16, np.int64)  # 0 marks an invalid code
            code = 0
            k = 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    start = code << (16 - ln)
                    sym[start : start + (1 << (16 - ln))] = vals[k]
                    length[start : start + (1 << (16 - ln))] = ln
                    code += 1
                    k += 1
                code <<= 1
            # plain Python lists: list indexing beats numpy scalar indexing
            # in the per-symbol hot loop
            cached = _LUT_CACHE[key] = (sym.tolist(), length.tolist())
        self.sym, self.length = cached


class _BitReader:
    """Entropy-segment preprocessor: unstuffs the whole scan up front
    (numpy pass over the byte array) into ``buf`` and records where each
    RSTn restart segment begins (``seg_starts``, cleaned-stream byte
    offsets).  The actual bit reads happen inline in jpeg_decode's MCU
    loop — ~1 ``int.from_bytes`` 4-byte window peek per huffman symbol
    instead of per-bit Python calls."""

    __slots__ = ("buf", "bitpos", "seg_starts")

    def __init__(self, data: bytes, pos: int):
        if len(data) - pos < 2048:
            # small-scan fast path (web thumbnails): numpy setup costs more
            # than scanning the handful of 0xFF sites in Python.  RST
            # streams fall through to the vectorized path.
            s = data[pos:]
            q = 0
            end = len(s)
            has_rst = False
            while True:
                q = s.find(b"\xff", q)
                if q == -1:
                    break
                nxt = s[q + 1] if q + 1 < len(s) else 0xD9
                if nxt == 0x00:
                    q += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    has_rst = True
                    break
                end = q
                break
            if not has_rst:
                self.buf = s[:end].replace(b"\xff\x00", b"\xff") + b"\xff\xff\xff\xff\xff\xff"
                self.bitpos = 0
                self.seg_starts = []
                return
        arr = np.frombuffer(data, np.uint8, len(data) - pos, pos)
        is_ff = arr == 0xFF
        nxt = np.empty(len(arr), np.uint8)
        nxt[:-1] = arr[1:]
        nxt[-1] = 0xD9
        # scan ends at the first non-stuffing, non-RST marker (EOI / next SOS)
        marker_pos = np.flatnonzero(is_ff & (nxt != 0) & ~((nxt >= 0xD0) & (nxt <= 0xD7)))
        end = int(marker_pos[0]) if len(marker_pos) else len(arr)
        arr = arr[:end]
        is_ff = is_ff[:end]
        nxt = nxt[:end]
        # drop stuffed 0x00 bytes and RST marker pairs; record where each
        # restart segment begins in the cleaned stream
        drop = np.zeros(len(arr), bool)
        stuffed = np.flatnonzero(is_ff & (nxt == 0)) + 1  # the 0x00 byte
        drop[stuffed[stuffed < len(arr)]] = True
        rst = np.flatnonzero(is_ff & (nxt >= 0xD0) & (nxt <= 0xD7))
        drop[rst] = True
        drop[rst[rst + 1 < len(arr)] + 1] = True
        keep = ~drop
        kept_idx = np.cumsum(keep) - 1  # original index -> cleaned index
        self.buf = arr[keep].tobytes() + b"\xff\xff\xff\xff\xff\xff"  # peek padding (1-fill)
        self.bitpos = 0
        # cleaned-stream byte offset where the segment AFTER each RST starts
        self.seg_starts = [
            int(kept_idx[r + 2]) if r + 2 < len(arr) else len(self.buf) - 6 for r in rst
        ]
    # bit reads happen inline in jpeg_decode's MCU loop (locals-only hot
    # path): peek = (int.from_bytes(buf[i:i+4]) >> (16 - (bitpos & 7)))
    # & 0xFFFF, then LUT-resolve / EXTEND (T.81 F.2.2.1) in place.


# one-entry header cache: corpus images typically share BYTE-IDENTICAL
# headers (same tables, dims, scan spec) and the parse only ever reads
# blob[:pos], so prefix equality implies parse equality — one memcmp
# replaces the full marker walk (which dominated batch decode once the
# entropy loop was vectorized).  The cached tuple is shared read-only.
_HDR_CACHE: list = [b"", None]


def _parse_headers_cached(blob: bytes):
    prefix, parsed = _HDR_CACHE
    if parsed is not None and blob[: len(prefix)] == prefix:
        return parsed
    parsed = _parse_headers(blob)
    _HDR_CACHE[0] = blob[: parsed[7]]
    _HDR_CACHE[1] = parsed
    return parsed


def _parse_headers(blob: bytes):
    """Marker parse of one baseline JPEG up to (and including) SOS; returns
    ``(h, w, restart_interval, comps, scan, qtables, htables, pos)`` with
    ``pos`` = start of the entropy-coded data."""
    assert blob[:2] == b"\xFF\xD8", "not a JPEG"
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    comps = None  # list of (cid, hs, vs, tq)
    h = w = None
    restart_interval = 0
    scan = None

    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", blob, pos)
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, off).astype(np.int64)
                    off += 64
                else:
                    vals = np.frombuffer(seg, ">u2", 64, off).astype(np.int64)
                    off += 128
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = vals  # stored zigzag -> natural order
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, tid = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                htables[(tc, tid)] = _HuffTable(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            assert precision == 8, "only 8-bit precision supported"
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0xF))
            pos += seglen
            break  # entropy data follows
        pos += seglen

    assert comps is not None and scan is not None, "missing SOF/SOS"
    assert len(comps) in (1, 3), "only grayscale / YCbCr supported"
    if len(scan) < len(comps):
        # A legal multi-scan (non-interleaved) baseline file starts with a
        # partial scan; decoding only it would silently drop chroma.
        raise ValueError("multi-scan (non-interleaved) baseline JPEG not supported")
    return h, w, restart_interval, comps, scan, qtables, htables, pos


def _geometry(h: int, w: int, comps, scan):
    """(hmax, vmax, mcus_x, mcus_y, shapes, order_ids) — order_ids is the
    per-MCU block emission order as (comp_idx, dc_table_id, ac_table_id)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    by_cid = {c[0]: c for c in comps}
    order_ids = []
    shapes = []
    for ci, (cs, td, ta) in enumerate(scan):
        cid, hs, vs, tq = by_cid[cs]
        bw, bh = mcus_x * hs, mcus_y * vs
        shapes.append((bh, bw, hs, vs, tq))
        for _ in range(hs * vs):
            order_ids.append((ci, td, ta))
    return hmax, vmax, mcus_x, mcus_y, shapes, order_ids


def _entropy_decode(blob: bytes):
    """Markers + Huffman entropy decode of one baseline JPEG; returns
    ``(h, w, hmax, vmax, shapes, coefs, qtables)`` — everything the batched
    numpy finish (dezigzag/dequant/IDCT/upsample/color) needs.  Split out so
    :func:`jpeg_decode_many` can run ONE finish over a whole batch of
    same-geometry images (per-image einsum/clip/stack call overhead was
    ~40% of thumbnail decode time)."""
    h, w, restart_interval, comps, scan, qtables, htables, pos = _parse_headers(blob)
    hmax, vmax, mcus_x, mcus_y, shapes, order_ids = _geometry(h, w, comps, scan)
    order = [(ci, htables[(0, td)], htables[(1, ta)]) for ci, td, ta in order_ids]

    # entropy decode into per-component (n_blocks, 64) int arrays.  The
    # loop body reads bits through local variables only (4-byte window
    # peek + list-LUT huffman resolve) — the single unavoidable sequential
    # pass; everything downstream is batched numpy.
    coefs = [np.zeros((bh * bw, 64), np.int64) for bh, bw, *_ in shapes]
    rdr = _BitReader(blob, pos)
    buf = rdr.buf
    seg_starts = rdr.seg_starts
    next_seg = 0
    bitpos = 0
    from_bytes = int.from_bytes
    # per-emitted-block: (component, dc sym/len LUTs, ac sym/len LUTs)
    order_l = [(ci, d.sym, d.length, a.sym, a.length) for ci, d, a in order]
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if next_seg >= len(seg_starts):
                    raise ValueError("restart marker expected but missing")
                bitpos = seg_starts[next_seg] << 3
                next_seg += 1
                pred = [0] * len(scan)
            blk_in_comp = [0] * len(scan)
            for ci, dc_sym, dc_len, ac_sym, ac_len in order_l:
                bh, bw, hs, vs, _tq = shapes[ci]
                k = blk_in_comp[ci]
                row = my * vs + k // hs
                col = mx * hs + k % hs
                blk_in_comp[ci] += 1
                zz = [0] * 64
                # ONE 6-byte window serves huffman code + amplitude bits:
                # offset(<=7) + code(<=16) + magnitude(<=11) = 34 <= 48
                i = bitpos >> 3
                off = bitpos & 7
                w48 = from_bytes(buf[i : i + 6], "big")
                w16 = (w48 >> (32 - off)) & 0xFFFF
                ssss = dc_sym[w16]
                ln = dc_len[w16]
                if ln == 0:
                    raise ValueError("corrupt huffman stream")
                if ssss:
                    v = (w48 >> (48 - off - ln - ssss)) & ((1 << ssss) - 1)
                    bitpos += ln + ssss
                    pred[ci] += v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1
                else:
                    bitpos += ln
                zz[0] = pred[ci]
                k2 = 1
                while k2 <= 63:
                    i = bitpos >> 3
                    off = bitpos & 7
                    w48 = from_bytes(buf[i : i + 6], "big")
                    w16 = (w48 >> (32 - off)) & 0xFFFF
                    rs = ac_sym[w16]
                    ln = ac_len[w16]
                    if ln == 0:
                        raise ValueError("corrupt huffman stream")
                    s = rs & 0xF
                    if s == 0:
                        bitpos += ln
                        if rs == 0xF0:
                            k2 += 16  # ZRL
                            continue
                        break  # EOB
                    k2 += rs >> 4
                    v = (w48 >> (48 - off - ln - s)) & ((1 << s) - 1)
                    bitpos += ln + s
                    zz[k2] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                    k2 += 1
                coefs[ci][row * bw + col] = zz
            mcu_count += 1

    return h, w, hmax, vmax, shapes, coefs, qtables


def jpeg_decode(blob: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF/EXIF JPEG to (h, w, 3) uint8 RGB.

    Entropy decode is the only sequential loop; dezigzag + dequantization +
    IDCT + upsample + color conversion are batched numpy over all blocks.
    Decoding MANY images at once?  Use :func:`jpeg_decode_many` — it runs
    the numpy finish once per geometry group instead of once per image.
    """
    return _finish_batch([_entropy_decode(blob)])[0]


_VEC_MIN_LANES = 16  # below this, per-image Python beats lockstep setup
_VEC_COEF_BUDGET = 64 << 20  # bytes of (lanes x blocks x 64) int64 per chunk


def jpeg_decode_many(blobs) -> list[np.ndarray]:
    """Decode a batch of baseline JPEGs, amortizing everything batchable.

    Images are grouped by (dimensions, sampling, quant AND huffman tables) —
    one group for a typical thumbnail corpus.  Within a group the Huffman
    entropy decode runs LOCKSTEP-VECTORIZED across images
    (:func:`_entropy_many_vec`: every step advances one symbol in every
    still-active image with numpy gathers — byte-window fetch, LUT resolve,
    EXTEND, coefficient scatter — so the per-symbol Python interpreter cost
    is paid once per step, not once per image), then ONE numpy
    dezigzag/dequant/IDCT/upsample/color pass finishes the group.
    Restart-interval streams and tiny groups fall back to the per-image
    scalar decoder.  Bit-identical to per-image :func:`jpeg_decode` (pinned
    by tests over the full fixture corpus)."""
    parses = [_parse_headers_cached(b) for b in blobs]
    groups: dict = {}
    sig_of: dict = {}  # id(parse tuple) -> sig; shared header tuples skip re-keying
    for i, p in enumerate(parses):
        sig = sig_of.get(id(p))
        if sig is None:
            h, w, restart, comps, scan, qtables, htables, _pos = p
            sig = (
                h, w, restart, tuple(comps), tuple(scan),
                tuple(sorted((tq, t.tobytes()) for tq, t in qtables.items())),
                tuple(sorted((tc, tid, ht.key) for (tc, tid), ht in htables.items())),
            )
            sig_of[id(p)] = sig
        groups.setdefault(sig, []).append(i)
    out: list = [None] * len(blobs)
    for sig, idx in groups.items():
        restart = sig[2]
        if restart == 0 and len(idx) >= _VEC_MIN_LANES:
            recs = _entropy_many_vec(
                [blobs[i] for i in idx], [parses[i] for i in idx]
            )
        else:
            recs = [_entropy_decode(blobs[i]) for i in idx]
        decoded = _finish_batch(recs)
        for i, px in zip(idx, decoded):
            out[i] = px
    return out


_NP_LUT_CACHE: dict = {}


def _np_luts(htables, ids):
    """Stack the needed Huffman LUTs into (n_tables, 65536) numpy banks;
    returns (sym_bank int32, len_bank int64, {table key -> bank row})."""
    rows = {}
    syms, lens = [], []
    for tc_tid in ids:
        ht = htables[tc_tid]
        if tc_tid not in rows:
            cached = _NP_LUT_CACHE.get(ht.key)
            if cached is None:
                cached = _NP_LUT_CACHE[ht.key] = (
                    np.asarray(ht.sym, dtype=np.int64),
                    np.asarray(ht.length, dtype=np.int64),
                )
            rows[tc_tid] = len(syms)
            syms.append(cached[0])
            lens.append(cached[1])
    return np.stack(syms), np.stack(lens), rows


def _emission_meta(shapes, order_ids, mcus_x, mcus_y):
    """Per-emitted-block arrays over the WHOLE image (all MCUs):
    comp_of (int64), slot_of (row*bw+col within the component's block
    array), plus per-block dc/ac LUT-row placeholders filled by caller."""
    npm = len(order_ids)
    n_total = mcus_x * mcus_y * npm
    comp_of = np.empty(n_total, np.int64)
    slot_of = np.empty(n_total, np.int64)
    j_of = np.tile(np.arange(npm), mcus_x * mcus_y)
    m_idx = np.repeat(np.arange(mcus_x * mcus_y), npm)
    my = m_idx // mcus_x
    mx = m_idx % mcus_x
    k_in_comp = {}
    for j, (ci, _td, _ta) in enumerate(order_ids):
        k = k_in_comp.get(ci, 0)
        k_in_comp[ci] = k + 1
        bh, bw, hs, vs, _tq = shapes[ci]
        sel = j_of == j
        row = my[sel] * vs + k // hs
        col = mx[sel] * hs + k % hs
        comp_of[sel] = ci
        slot_of[sel] = row * bw + col
    return comp_of, slot_of, j_of


def _entropy_many_vec(blobs, parses):
    """Lockstep-vectorized Huffman decode of same-signature baseline JPEGs
    (no restart intervals).  Exactly the scalar MCU loop's semantics — same
    window peek, LUT resolve, EXTEND, EOB/ZRL handling — advanced one symbol
    per step across all still-active lanes."""
    parse0 = parses[0]
    h, w, _restart, comps, scan, qtables, htables, _pos = parse0
    hmax, vmax, mcus_x, mcus_y, shapes, order_ids = _geometry(h, w, comps, scan)
    npm = len(order_ids)
    n_total = mcus_x * mcus_y * npm
    comp_of, slot_of, j_of = _emission_meta(shapes, order_ids, mcus_x, mcus_y)
    sym_bank, len_bank, rows = _np_luts(
        htables,
        [(0, td) for _ci, td, _ta in order_ids] + [(1, ta) for _ci, _td, ta in order_ids],
    )
    dc_row_of = np.array([rows[(0, td)] for _ci, td, _ta in order_ids], np.int64)[j_of]
    ac_row_of = np.array([rows[(1, ta)] for _ci, _td, ta in order_ids], np.int64)[j_of]

    # chunk lanes so the (lanes, blocks, 64) coefficient tensor stays small
    per_lane = n_total * 64 * 8
    chunk = max(_VEC_MIN_LANES, _VEC_COEF_BUDGET // max(per_lane, 1))
    recs = []
    for lo in range(0, len(blobs), chunk):
        recs.extend(
            _vec_chunk(
                blobs[lo : lo + chunk],
                [p[7] for p in parses[lo : lo + chunk]],
                parse0, shapes, comp_of, slot_of,
                dc_row_of, ac_row_of, sym_bank, len_bank, n_total,
                hmax, vmax, h, w,
            )
        )
    return recs


_POW6 = (np.uint64(256) ** np.arange(5, -1, -1, dtype=np.uint64)).astype(np.uint64)


def _vec_chunk(blobs, positions, parse0, shapes, comp_of, slot_of, dc_row_of,
               ac_row_of, sym_bank, len_bank, n_total, hmax, vmax, h, w):
    h_, w_, _r, comps, scan, qtables, htables, _p = parse0
    n = len(blobs)
    bufs = [_BitReader(b, pos).buf for b, pos in zip(blobs, positions)]
    base = np.zeros(n, np.int64)
    if n > 1:
        np.cumsum([len(x) for x in bufs[:-1]], out=base[1:])
    big = np.frombuffer(b"".join(bufs), dtype=np.uint8)

    coef = np.zeros((n, n_total, 64), np.int64)
    bitpos = np.zeros(n, np.int64)
    blk = np.zeros(n, np.int64)
    kpos = np.zeros(n, np.int64)  # 0 = DC next, else next AC index
    pred = np.zeros((n, len(scan)), np.int64)
    AR6 = np.arange(6, dtype=np.int64)
    u1 = np.uint64(1)

    active = np.arange(n)
    while len(active):
        a = active
        bp = bitpos[a]
        byte = base[a] + (bp >> 3)
        off = (bp & 7).astype(np.uint64)
        win = big[byte[:, None] + AR6].astype(np.uint64)
        w48 = win @ _POW6
        w16 = ((w48 >> (np.uint64(32) - off)) & np.uint64(0xFFFF)).astype(np.int64)
        isdc = kpos[a] == 0
        bi = blk[a]
        lut_row = np.where(isdc, dc_row_of[bi], ac_row_of[bi])
        sym = sym_bank[lut_row, w16]
        ln = len_bank[lut_row, w16]
        if not ln.all():
            raise ValueError("corrupt huffman stream")
        s_ac = sym & 0xF
        nbits = np.where(isdc, sym, s_ac)
        run = np.where(isdc, 0, sym >> 4)
        # magnitude bits from the same 48-bit window (off+ln+nbits <= 34)
        shift = (np.uint64(48) - off - ln.astype(np.uint64) - nbits.astype(np.uint64))
        mag_mask = (u1 << nbits.astype(np.uint64)) - u1
        v = ((w48 >> shift) & mag_mask).astype(np.int64)
        safe_n = np.maximum(nbits, 1)
        val = np.where(v >= (np.int64(1) << (safe_n - 1)), v, v - (np.int64(1) << safe_n) + 1)
        val = np.where(nbits > 0, val, 0)
        bitpos[a] = bp + ln + nbits

        dcm = isdc
        if dcm.any():
            lanes = a[dcm]
            ci = comp_of[bi[dcm]]
            pred[lanes, ci] += val[dcm]
            coef[lanes, bi[dcm], 0] = pred[lanes, ci]
            kpos[lanes] = 1
        acm = ~isdc
        if acm.any():
            zrl = acm & (s_ac == 0) & (sym == 0xF0)
            eob = acm & (s_ac == 0) & (sym != 0xF0)
            wrt = acm & (s_ac > 0)
            if zrl.any():
                kpos[a[zrl]] += 16
            if wrt.any():
                newk = kpos[a[wrt]] + run[wrt]
                coef[a[wrt], bi[wrt], newk] = val[wrt]
                kpos[a[wrt]] = newk + 1
            if eob.any():
                lanes = a[eob]
                blk[lanes] += 1
                kpos[lanes] = 0
        over = kpos[a] > 63
        if over.any():
            lanes = a[over]
            blk[lanes] += 1
            kpos[lanes] = 0
        active = active[blk[active] < n_total]

    recs = []
    comp_arrays = []
    for ci, (bh, bw, hs, vs, tq) in enumerate(shapes):
        sel = comp_of == ci
        arr = np.zeros((n, bh * bw, 64), np.int64)
        arr[:, slot_of[sel], :] = coef[:, sel, :]
        comp_arrays.append(arr)
    for i in range(n):
        recs.append((h, w, hmax, vmax, shapes, [ca[i] for ca in comp_arrays], qtables))
    return recs


def _finish_batch(recs) -> list[np.ndarray]:
    """Batched numpy finish for 1+ entropy-decoded images with IDENTICAL
    geometry (dims, sampling, quant tables): dezigzag + dequant + IDCT over
    every block of every image in one einsum, batched upsample + one color
    conversion for the group."""
    h, w, hmax, vmax, shapes, _c, qtables = recs[0]
    n = len(recs)
    n_comps = len(shapes)
    planes = []
    for ci in range(n_comps):
        bh, bw, hs, vs, tq = shapes[ci]
        n_b = bh * bw
        stacked = (
            recs[0][5][ci][None, ...]
            if n == 1
            else np.stack([r[5][ci] for r in recs])
        )  # (n, n_b, 64)
        deq = stacked[:, :, UNZIGZAG] * qtables[tq].astype(np.float64)
        px = _idct_blocks(deq.reshape(n * n_b, 64))  # (n*n_b, 8, 8)
        plane = (
            px.reshape(n, bh, bw, 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, bh * 8, bw * 8)
        )
        # upsample to full resolution (sample replication, JFIF default)
        if hs < hmax:
            plane = np.repeat(plane, hmax // hs, axis=2)
        if vs < vmax:
            plane = np.repeat(plane, vmax // vs, axis=1)
        planes.append(plane[:, :h, :w])

    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
    else:
        rgb = _ycbcr_to_rgb(*planes)
    return [rgb[i] for i in range(n)]
