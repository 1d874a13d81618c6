"""Property-based tests (hypothesis) for the pure-Python baseline JPEG
codec (``operators/jpeg.py``) - the lossy sibling of
``test_png_properties.py``. JPEG is lossy, so the properties are
BOUNDS, not equality: dimensions survive exactly, the round-trip
error is bounded by the quantization analysis (uniform qtable of 4
with an orthonormal DCT bounds the spatial error per coefficient),
solid blocks survive within YCbCr rounding only, and the entropy
stream obeys byte stuffing (no bare 0xFF outside markers).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.jpeg import (
    jpeg_meta,
    jpeg_pixels,
    make_jpeg,
)

# Generous but meaningful bound for arbitrary (noise) images: uniform
# quantization step 4 bounds each DCT coefficient error by 2; the
# orthonormal IDCT maps that to at most sum(|e_uv|)/8 <= 16 per pixel
# in the worst case, and the YCbCr round trip adds ~2. Measured noise
# images land around 7-9; 20 catches real breakage (wrong zigzag,
# table mixup, bit slip) without flaking.
NOISE_TOL = 20
SOLID_TOL = 2

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))

_pixels = _dims.flatmap(
    lambda hw: st.binary(
        min_size=hw[0] * hw[1] * 3, max_size=hw[0] * hw[1] * 3
    ).map(lambda b: np.frombuffer(b, dtype=np.uint8).reshape(*hw, 3).copy())
)


@settings(max_examples=30, deadline=None)
@given(_pixels)
def test_dims_survive_and_error_bounded(pixels):
    payload = make_jpeg(pixels)
    assert jpeg_meta(payload) == (pixels.shape[1], pixels.shape[0])
    decoded = jpeg_pixels(payload)
    assert decoded.shape == pixels.shape
    assert int(np.abs(decoded.astype(int) - pixels.astype(int)).max()) <= NOISE_TOL


@settings(max_examples=30, deadline=None)
@given(_dims, st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)))
def test_solid_images_survive_within_rounding(hw, rgb):
    """Solid blocks have only a DC coefficient, and qtable=4 divides
    the orthonormal DC gain of 8 - the DCT path is EXACT, leaving only
    YCbCr forward/backward rounding (<= 2 per channel)."""
    h, w = hw
    px = np.tile(np.array(rgb, dtype=np.uint8), (h, w, 1))
    decoded = jpeg_pixels(make_jpeg(px))
    assert int(np.abs(decoded.astype(int) - px.astype(int)).max()) <= SOLID_TOL
    # a solid input decodes to a solid output (no block artifacts)
    assert len(np.unique(decoded.reshape(-1, 3), axis=0)) == 1


@settings(max_examples=20, deadline=None)
@given(_pixels)
def test_entropy_stream_is_byte_stuffed(pixels):
    """Between SOS payload and EOI, every 0xFF must be followed by
    0x00 - a decoder that sees a bare 0xFF would treat it as a marker
    and truncate the scan."""
    payload = make_jpeg(pixels)
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    (seg_len,) = np.frombuffer(payload[sos + 2 : sos + 4], dtype=">u2")
    scan = payload[sos + 2 + int(seg_len) : -2]  # up to EOI
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert i + 1 < len(scan) and scan[i + 1] == 0x00
            i += 2
        else:
            i += 1


@settings(max_examples=20, deadline=None)
@given(_pixels)
def test_decode_is_deterministic(pixels):
    payload = make_jpeg(pixels)
    assert np.array_equal(jpeg_pixels(payload), jpeg_pixels(payload))


@settings(max_examples=15, deadline=None)
@given(_pixels, st.sampled_from(["420", "422"]))
def test_subsampled_dims_and_luma_bound(pixels, sub):
    """4:2:0 / 4:2:2 round trip: dims survive exactly; gray pixels
    (chroma constant at 128) stay within the 4:4:4 noise bound because
    luma is never subsampled and constant chroma survives any
    upsampling kernel exactly."""
    gray = np.repeat(pixels[..., :1], 3, axis=-1)
    payload = make_jpeg(gray, subsampling=sub)
    assert jpeg_meta(payload) == (gray.shape[1], gray.shape[0])
    decoded = jpeg_pixels(payload)
    assert decoded.shape == gray.shape
    assert int(np.abs(decoded.astype(int) - gray.astype(int)).max()) <= NOISE_TOL


@settings(max_examples=10, deadline=None)
@given(_dims, st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)))
def test_subsampled_solid_survives(hw, rgb):
    """Solid color through 4:2:0: box-mean downsample and triangle
    upsample are both exact on constant planes, so the only error is
    YCbCr rounding - the same bound as the 4:4:4 solid property."""
    h, w = hw
    px = np.tile(np.array(rgb, dtype=np.uint8), (h, w, 1))
    decoded = jpeg_pixels(make_jpeg(px, subsampling="420"))
    assert int(np.abs(decoded.astype(int) - px.astype(int)).max()) <= SOLID_TOL


@settings(max_examples=15, deadline=None)
@given(_pixels, st.integers(1, 5))
def test_restart_markers_are_transparent(pixels, interval):
    """RSTn markers partition the entropy stream but must not change a
    single pixel: DC predictors reset, everything else re-syncs."""
    base = jpeg_pixels(make_jpeg(pixels))
    with_rst = jpeg_pixels(make_jpeg(pixels, restart_interval=interval))
    assert np.array_equal(base, with_rst)


def test_fill_bytes_between_segments_tolerated():
    """Spec-legal 0xFF padding before a marker (T.81 B.1.1.2) must not
    reject the stream - real-world encoders emit it."""
    px = np.full((9, 11, 3), 90, dtype=np.uint8)
    payload = make_jpeg(px)
    stuffed = payload[:2] + b"\xff\xff" + payload[2:]
    assert jpeg_meta(stuffed) == (11, 9)
    assert np.array_equal(jpeg_pixels(stuffed), jpeg_pixels(payload))


@settings(max_examples=15, deadline=None)
@given(_pixels, st.sampled_from(["444", "420", "422"]))
def test_progressive_is_lossless_reordering(pixels, sub):
    """SOF2 with the 10-scan simple-progression script (spectral
    selection + successive approximation + EOB runs) must decode
    BIT-IDENTICALLY to the baseline encoding of the same pixels - the
    progression only re-orders the same quantized coefficients."""
    base = jpeg_pixels(make_jpeg(pixels, subsampling=sub))
    prog = make_jpeg(pixels, subsampling=sub, progressive=True)
    assert jpeg_meta(prog) == (pixels.shape[1], pixels.shape[0])
    assert np.array_equal(jpeg_pixels(prog), base)


@settings(max_examples=10, deadline=None)
@given(_pixels, st.integers(1, 4))
def test_progressive_restart_markers_transparent(pixels, interval):
    """RSTn inside progressive scans (DC predictor + EOB-run reset,
    per-scan numbering) must not change a pixel either."""
    base = jpeg_pixels(make_jpeg(pixels, progressive=True))
    with_rst = jpeg_pixels(
        make_jpeg(pixels, progressive=True, restart_interval=interval)
    )
    assert np.array_equal(base, with_rst)


def test_progressive_eobrun_sparse_image():
    """A nearly-black image maximizes end-of-band runs (the EOBRUN >
    1 paths on both encoder and decoder); round trip must still be
    bit-identical to baseline."""
    px = np.zeros((64, 80, 3), dtype=np.uint8)
    px[30, 40] = [200, 30, 90]
    px[3, 5] = [10, 250, 40]
    base = jpeg_pixels(make_jpeg(px))
    assert np.array_equal(jpeg_pixels(make_jpeg(px, progressive=True)), base)


def test_lossless_meta_parses_pixels_raise():
    """Truly unsupported SOF types (lossless SOF3): pixel decode
    raises (the honest seam) but jpeg_meta still reads the dims - the
    metadata-only fallback decode_media_meta relies on."""
    import pytest

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    payload = bytearray(make_jpeg(px))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    assert jpeg_meta(bytes(payload)) == (8, 8)
    with pytest.raises(NotImplementedError):
        jpeg_pixels(bytes(payload))


def test_meta_matches_reference_store_magic():
    """real_decode dispatches on the JPEG SOI magic - the reference
    store's format (s3-to-es_aws.py:92)."""
    from data_pipeline_capstone_project_spark.operators.multimodal import (
        real_decode,
    )

    px = np.full((10, 7, 3), 55, dtype=np.uint8)
    payload = make_jpeg(px)
    assert payload[:3] == b"\xff\xd8\xff"
    assert real_decode(payload) == (7, 10)


@settings(max_examples=15, deadline=None)
@given(_pixels, st.sampled_from(["444", "420", "422"]))
def test_noninterleaved_baseline_is_lossless_reordering(pixels, sub):
    """A spec-legal non-interleaved baseline layout (three
    single-component scans, each over that component's TRUE data-unit
    grid per T.81 A.2.2 - never the MCU-padded grid) must decode
    BIT-IDENTICALLY to the interleaved encoding of the same pixels:
    the scans carry the same quantized coefficients in a different
    order. On subsampled images this is the regression test for the
    padded-grid walk bug (ADVICE r5): a decoder that walks the
    interleaved MCU grid consumes phantom padding blocks and
    desynchronizes the entropy stream."""
    base = jpeg_pixels(make_jpeg(pixels, subsampling=sub))
    ni = make_jpeg(pixels, subsampling=sub, interleave=False)
    assert jpeg_meta(ni) == (pixels.shape[1], pixels.shape[0])
    assert np.array_equal(jpeg_pixels(ni), base)


@settings(max_examples=10, deadline=None)
@given(_pixels, st.integers(1, 4))
def test_noninterleaved_restart_markers_transparent(pixels, interval):
    """RSTn inside non-interleaved baseline scans count DATA UNITS
    (one block = one MCU in a non-interleaved scan, T.81 A.2.2) and
    reset the single DC predictor - pixels must not change."""
    base = jpeg_pixels(make_jpeg(pixels, subsampling="420"))
    with_rst = jpeg_pixels(
        make_jpeg(
            pixels, subsampling="420", interleave=False,
            restart_interval=interval,
        )
    )
    assert np.array_equal(base, with_rst)
