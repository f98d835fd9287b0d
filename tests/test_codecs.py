"""Spec-compliance tests for the from-scratch PNG/BMP codecs: PNGs are
BUILT with each of the five scanline filters applied per RFC 2083 §6 (the
inverse of the decoder), so the decoder is validated against the spec, not
against our own filter-0 encoder."""

import struct
import zlib

import numpy as np
import pytest

from raywin.stages.images import (
    _PNG_SIG,
    _chunk,
    bmp_decode,
    bmp_encode,
    png_decode,
    png_encode,
)


def _filter_scanlines(px: np.ndarray, ftype: int) -> bytes:
    """Apply PNG filter `ftype` to every scanline (the encoder side of
    RFC 2083 §6), over RGB or RGBA 8-bit pixels."""
    h, w, c = px.shape
    raw = px.reshape(h, w * c).astype(np.int32)
    out = []
    prior = np.zeros(w * c, np.int32)
    for y in range(h):
        cur = raw[y]
        left = np.zeros(w * c, np.int32)
        left[c:] = cur[:-c]
        pleft = np.zeros(w * c, np.int32)
        pleft[c:] = prior[:-c]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prior
        elif ftype == 3:
            filt = cur - ((left + prior) >> 1)
        else:  # paeth
            p = left + prior - pleft
            pa = np.abs(p - left)
            pb = np.abs(p - prior)
            pc = np.abs(p - pleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, pleft))
            filt = cur - pred
        out.append(bytes([ftype]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    return b"".join(out)


def _build_png(px: np.ndarray, ftype: int) -> bytes:
    h, w, c = px.shape
    color = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = _filter_scanlines(px, ftype)
    return (
        _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [3, 4])
def test_png_all_filters_decode(ftype, channels):
    rng = np.random.default_rng(ftype * 10 + channels)
    px = rng.integers(0, 256, (13, 7, channels), dtype=np.uint8)
    back = png_decode(_build_png(px, ftype))
    np.testing.assert_array_equal(back, px)


def test_png_mixed_filters_per_row():
    """Real encoders choose a filter PER ROW — splice rows with different
    filters into one IDAT stream."""
    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    lines = []
    prior = np.zeros(27, np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        one = _filter_scanlines(px[max(0, y - 1):y + 1], f)
        # take just the LAST scanline of the two-row filtering (correct prior)
        lines.append(one[-28:])
        prior = px[y].reshape(-1).astype(np.int32)
    ihdr = struct.pack(">IIBBBBB", 9, 5, 8, 2, 0, 0, 0)
    blob = (
        _PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6)) + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png_decode(blob), px)


def test_png_own_roundtrip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(px)), px)


@pytest.mark.parametrize("w", [7, 8])  # odd width exercises row padding
def test_bmp_roundtrip(w):
    rng = np.random.default_rng(w)
    px = rng.integers(0, 256, (11, w, 3), dtype=np.uint8)
    blob = bmp_encode(px)
    assert blob[:2] == b"BM"
    np.testing.assert_array_equal(bmp_decode(blob), px)
