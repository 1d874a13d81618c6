"""Property-based tests (hypothesis) for the pure-Python PNG codec.

The codec is the one hand-written bit-level component in the repo
(``operators/images.py``): the encoder emits filter-0 scanlines, but
the decoder must undo ALL five PNG scanline filters because the JVM
image source and any external producer may emit them. Example-based
tests cover fixture images; these properties drive random pixel data
through every filter type, including the sequential Sub/Average/Paeth
reconstruction loop."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.images import (
    _chunk,
    make_png,
    png_meta,
    png_pixels,
)


def _encode_filtered(pixels: np.ndarray, ftypes: list[int]) -> bytes:
    """Encode with an arbitrary filter type per scanline — the inverse
    of the decoder's reconstruction, using the RAW bytes as the
    predictor inputs exactly as the PNG spec defines for encoding."""
    h, w = pixels.shape[:2]
    bpp = 3
    stride = w * bpp
    prev = np.zeros(stride, dtype=np.int32)
    raw = bytearray()
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int32)
        ftype = ftypes[y]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                base = 0
            elif ftype == 1:
                base = a
            elif ftype == 2:
                base = b
            elif ftype == 3:
                base = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                base = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(line[x]) - base) & 0xFF
        raw.append(ftype)
        raw += enc.astype(np.uint8).tobytes()
        prev = line
    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", header)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


_pixels = st.integers(1, 8).flatmap(
    lambda h: st.integers(1, 8).flatmap(
        lambda w: st.binary(min_size=h * w * 3, max_size=h * w * 3).map(
            lambda b: np.frombuffer(b, dtype=np.uint8).reshape(h, w, 3).copy()
        )
    )
)


@settings(max_examples=40, deadline=None)
@given(_pixels)
def test_roundtrip_filter0(pixels):
    payload = make_png(pixels)
    assert png_meta(payload) == (pixels.shape[1], pixels.shape[0])
    assert np.array_equal(png_pixels(payload), pixels)


@settings(max_examples=40, deadline=None)
@given(
    _pixels.flatmap(
        lambda px: st.tuples(
            st.just(px),
            st.lists(
                st.integers(0, 4),
                min_size=px.shape[0],
                max_size=px.shape[0],
            ),
        )
    )
)
def test_decoder_undoes_every_filter(case):
    pixels, ftypes = case
    payload = _encode_filtered(pixels, ftypes)
    assert np.array_equal(png_pixels(payload), pixels)


@settings(max_examples=20, deadline=None)
@given(_pixels)
def test_multi_idat_chunks_concatenate(pixels):
    """Decoders must concatenate split IDAT chunks — producers are
    free to emit any number of them."""
    payload = make_png(pixels)
    # split the single IDAT into two chunks at a midpoint
    off = 8 + 12 + 13  # signature + IHDR chunk
    (length,) = struct.unpack(">I", payload[off : off + 4])
    idat = payload[off + 8 : off + 8 + length]
    mid = max(1, len(idat) // 2)
    rebuilt = (
        payload[:off]
        + _chunk(b"IDAT", idat[:mid])
        + _chunk(b"IDAT", idat[mid:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_pixels(rebuilt), pixels)


@settings(max_examples=25, deadline=None)
@given(_pixels)
def test_interlaced_roundtrip_truecolor(pixels):
    """Adam7 write -> decode must reproduce the sequential image for
    ANY dimensions (1..8 exercises every empty/partial pass case)."""
    payload = make_png(pixels, interlace=True)
    assert png_meta(payload) == (pixels.shape[1], pixels.shape[0])
    assert np.array_equal(png_pixels(payload), pixels)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 11).flatmap(
        lambda h: st.integers(1, 11).flatmap(
            lambda w: st.binary(min_size=h * w, max_size=h * w).map(
                lambda b: np.frombuffer(b, dtype=np.uint8).reshape(h, w).copy()
            )
        )
    ),
    st.booleans(),
)
def test_grayscale_roundtrip(gray, interlace):
    payload = make_png(gray, color_type=0, interlace=interlace)
    out = png_pixels(payload)
    assert out.shape == (*gray.shape, 3)
    for c in range(3):
        assert np.array_equal(out[..., c], gray)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 9).flatmap(
        lambda h: st.integers(1, 9).flatmap(
            lambda w: st.binary(min_size=h * w, max_size=h * w).map(
                lambda b: (np.frombuffer(b, dtype=np.uint8) % 16).reshape(h, w).copy()
            )
        )
    ),
    st.booleans(),
)
def test_palette_roundtrip(idx, interlace):
    pal = [(i * 15, 255 - i * 15, (i * 37) % 256) for i in range(16)]
    payload = make_png(idx, color_type=3, palette=pal, interlace=interlace)
    out = png_pixels(payload)
    expected = np.array(pal, dtype=np.uint8)[idx]
    assert np.array_equal(out, expected)


def test_palette_out_of_range_rejected():
    idx = np.array([[0, 5]], dtype=np.uint8)  # index 5, 3-entry PLTE
    payload = make_png(idx, color_type=3, palette=[(1, 2, 3)] * 3)
    with pytest.raises(ValueError):
        png_pixels(payload)
