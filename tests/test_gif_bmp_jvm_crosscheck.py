"""Independent cross-check of the from-scratch GIF and BMP decoders
against the JVM's ImageIO via Spark's native image source: the same
fixture bytes must decode to pixel-identical images in both
implementations (the same contract the PNG codec carries in
``test_image_source.py`` / the ``image_decode`` registry entry)."""

from __future__ import annotations

import numpy as np

from data_pipeline_capstone_project_spark.operators.gif import (
    _lcg_indices,
    _lcg_palette,
    gif_frames,
    make_gif,
)
from data_pipeline_capstone_project_spark.operators.images import (
    bmp_pixels,
    make_bmp,
    make_bmp_indexed,
)


def _jvm_decode(spark, store: str) -> dict[str, np.ndarray]:
    """name -> (h, w, 3) RGB via the image source (ImageIO decode,
    OpenCV-style BGR byte layout)."""
    rows = (
        spark.read.format("image")
        .option("dropInvalid", True)
        .load(store)
        .select("image.*")
        .collect()
    )
    out = {}
    for r in rows:
        assert r["nChannels"] in (3, 4), r["origin"]
        arr = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(
            r["height"], r["width"], r["nChannels"]
        )
        out[r["origin"].rsplit("/", 1)[-1]] = arr[:, :, [2, 1, 0]]
    return out


def test_gif_decoder_matches_jvm_imageio(spark, tmp_path):
    store = tmp_path / "gifs"
    store.mkdir()
    ours = {}
    for i in range(4):
        w, h = 9 + 3 * i, 6 + 2 * i
        pal_n = (8, 4, 256, 2)[i]
        frames = [
            {
                "idx": _lcg_indices(h, w, pal_n, 17 * i),
                "interlace": i % 2 == 1,
            }
        ]
        payload = make_gif(w, h, _lcg_palette(pal_n, i), frames)
        (store / f"x{i}.gif").write_bytes(payload)
        ours[f"x{i}.gif"] = gif_frames(payload)[0]["rgb"]
    theirs = _jvm_decode(spark, str(store))
    assert set(theirs) == set(ours)
    for name, rgb in ours.items():
        assert np.array_equal(theirs[name], rgb), name


def test_bmp_decoder_matches_jvm_imageio(spark, tmp_path):
    store = tmp_path / "bmps"
    store.mkdir()
    ours = {}
    for i in range(3):
        h, w = 5 + 2 * i, 8 + 3 * i
        img = np.random.RandomState(40 + i).randint(
            0, 256, (h, w, 3)
        ).astype(np.uint8)
        payload = make_bmp(img)
        (store / f"b{i}.bmp").write_bytes(payload)
        ours[f"b{i}.bmp"] = bmp_pixels(payload)
        assert np.array_equal(ours[f"b{i}.bmp"], img)
    theirs = _jvm_decode(spark, str(store))
    assert set(theirs) == set(ours)
    for name, rgb in ours.items():
        assert np.array_equal(theirs[name], rgb), name


def test_bmp_paletted_and_rle8_match_jvm_imageio(spark, tmp_path):
    """r11: 8-bit paletted BI_RGB and BI_RLE8 (encoded runs, absolute
    mode, EOL/EOF escapes) decode pixel-identically to JVM ImageIO —
    the external cross-check the H.264 VLC subsets cannot have."""
    from data_pipeline_capstone_project_spark.operators.gif import (
        _lcg_indices,
        _lcg_palette,
    )

    store = tmp_path / "bmps8"
    store.mkdir()
    ours = {}
    for i in range(4):
        h, w = 6 + 2 * i, 9 + 3 * i
        n = (4, 8, 256, 3)[i]
        pal = [tuple(int(v) for v in c) for c in _lcg_palette(n, i)]
        idx = np.array(_lcg_indices(h, w, n, 13 * i), dtype=np.uint8)
        idx[0, :] = idx[0, 0]  # a run-heavy row next to noisy rows
        for rle in (False, True):
            name = f"b{i}_{'rle' if rle else 'pal'}.bmp"
            payload = make_bmp_indexed(idx, pal, rle=rle)
            (store / name).write_bytes(payload)
            ours[name] = bmp_pixels(payload)
            assert np.array_equal(
                ours[name], np.array(pal, dtype=np.uint8)[idx]
            ), name
    theirs = _jvm_decode(spark, str(store))
    assert set(theirs) == set(ours)
    for name, rgb in ours.items():
        assert np.array_equal(theirs[name], rgb), name


def test_bmp_rle8_delta_escape_matches_jvm(spark, tmp_path):
    """The delta escape (0,2,dx,dy) leaves skipped pixels at palette
    index 0 — the zero-initialised-raster convention; a hand-built
    stream must decode identically here and in ImageIO."""
    import struct

    pal = [(10, 20, 30), (200, 100, 50), (5, 5, 5)]
    quads = b"".join(bytes((b, g, r, 0)) for r, g, b in pal)
    body = bytes((2, 1, 0, 2, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0, 0, 1))
    info = struct.pack(
        "<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, len(body), 0, 0, len(pal), 0
    )
    off = 14 + 40 + len(quads)
    payload = (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + info + quads + body
    )
    got = bmp_pixels(payload)
    want = np.zeros((4, 4, 3), np.uint8)
    want[:] = pal[0]
    want[3, 0] = want[3, 1] = pal[1]  # bottom-row run of 2
    want[2, 3] = pal[2]  # one pixel after the (1,1) delta jump
    assert np.array_equal(got, want)
    store = tmp_path / "bmpd"
    store.mkdir()
    (store / "delta.bmp").write_bytes(payload)
    theirs = _jvm_decode(spark, str(store))
    assert np.array_equal(theirs["delta.bmp"], want)


def test_bmp_low_depth_and_rle4_match_jvm_imageio(spark, tmp_path):
    """r11: 1-bit and 4-bit paletted BI_RGB plus BI_RLE4 (nibble
    runs/absolute mode, word alignment) decode pixel-identically to
    JVM ImageIO."""
    store = tmp_path / "bmps_low"
    store.mkdir()
    rng = np.random.RandomState(5)
    ours = {}
    for i in range(3):
        h, w = 5 + 3 * i, 7 + 5 * i
        for bpp, rle_opts in ((1, (False,)), (4, (False, True))):
            n = 1 << bpp
            pal = [tuple(int(v) for v in rng.randint(0, 256, 3))
                   for _ in range(n)]
            idx = rng.randint(0, n, (h, w)).astype(np.uint8)
            idx[0, :] = idx[0, 0]  # a run-heavy row
            for rle in rle_opts:
                name = f"b{i}_{bpp}{'r' if rle else ''}.bmp"
                payload = make_bmp_indexed(idx, pal, rle=rle, bpp=bpp)
                (store / name).write_bytes(payload)
                ours[name] = bmp_pixels(payload)
                assert np.array_equal(
                    ours[name], np.array(pal, dtype=np.uint8)[idx]
                ), name
    theirs = _jvm_decode(spark, str(store))
    assert set(theirs) == set(ours)
    for name, rgb in ours.items():
        assert np.array_equal(theirs[name], rgb), name


def test_bmp_rle4_alternating_run_nibbles():
    """An RLE4 encoded run alternates the count byte's two nibbles:
    count 5 of 0xAB decodes to A,B,A,B,A (hand-built stream)."""
    import struct

    pal = [(i, 2 * i, 3 * i) for i in range(16)]
    quads = b"".join(bytes((b, g, r, 0)) for r, g, b in pal)
    body = bytes((5, 0xAB, 0, 0, 0, 1))
    info = struct.pack(
        "<IiiHHIIiiII", 40, 5, 1, 1, 4, 2, len(body), 0, 0, 16, 0
    )
    off = 14 + 40 + len(quads)
    payload = (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + info + quads + body
    )
    want = np.array(pal, np.uint8)[np.array([[10, 11, 10, 11, 10]])]
    assert np.array_equal(bmp_pixels(payload), want)


def test_bmp_rle8_hostile_streams_raise():
    """Corrupt RLE streams fail loudly, never write out of bounds:
    run overflowing the row, truncated stream, delta past the image,
    index beyond the color table."""
    import struct

    import pytest

    def bmp(body, w=4, h=4, npal=2, comp=1):
        quads = b"\0\0\0\0\xff\xff\xff\0" * (npal // 2)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, comp, len(body), 0, 0, npal, 0
        )
        off = 14 + 40 + len(quads)
        return (
            b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + info + quads + bytes(body)
        )

    with pytest.raises(ValueError, match="overflows"):
        bmp_pixels(bmp((6, 1, 0, 1)))  # run of 6 into a 4-wide row
    with pytest.raises(ValueError, match="truncated"):
        bmp_pixels(bmp((2, 1, 0)))  # stream ends mid-escape
    with pytest.raises(ValueError, match="out of bounds"):
        bmp_pixels(bmp((0, 2, 9, 9, 0, 1)))  # delta past the image
    with pytest.raises(ValueError, match="color table"):
        bmp_pixels(bmp((1, 7, 0, 1)))  # index 7 with a 2-color table


def test_bmp_indexed_roundtrip_property():
    """Hypothesis sweep: any index image at any supported depth
    round-trips through the indexed writer and bmp_pixels (BI_RGB
    everywhere; RLE4/RLE8 where the format defines them)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 12),
        st.integers(1, 21),
        st.sampled_from([1, 4, 8]),
        st.data(),
    )
    def run(h, w, bpp, data):
        n = min(1 << bpp, 2 + data.draw(st.integers(0, 14)))
        pal = [
            tuple(data.draw(st.integers(0, 255)) for _ in range(3))
            for _ in range(n)
        ]
        idx = np.array(
            [
                [data.draw(st.integers(0, n - 1)) for _ in range(w)]
                for _ in range(h)
            ],
            dtype=np.uint8,
        )
        want = np.array(pal, dtype=np.uint8)[idx]
        for rle in ((False,) if bpp == 1 else (False, True)):
            got = bmp_pixels(make_bmp_indexed(idx, pal, rle=rle, bpp=bpp))
            assert np.array_equal(got, want), (h, w, bpp, rle)

    run()
