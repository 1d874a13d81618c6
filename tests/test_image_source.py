"""Native Spark image source (SURVEY §2.1 S4).

The reference loads its image store with
``spark.read.format("image")`` and relies on ``dropInvalid`` to skip
undecodable files (``spark_image.py:180-183``). This container has no
Python image libraries, but the image source decodes JVM-side via
ImageIO - so the tests synthesize real PNG bytes with nothing but
stdlib ``zlib``/``struct`` and exercise the actual source: schema,
OpenCV-compatible mode, BGR channel order, and corrupt-file dropping.
"""

from __future__ import annotations

import struct
import zlib


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal truecolor PNG: one IDAT, no interlace, filter 0 rows."""
    header = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", header)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_image_source_decodes_and_drops_invalid(spark, tmp_path):
    store = tmp_path / "store"
    store.mkdir()
    (store / "red.png").write_bytes(make_png(4, 3, (255, 0, 0)))
    (store / "blue.png").write_bytes(make_png(2, 2, (0, 0, 255)))
    (store / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\nnot really a png")

    df = (
        spark.read.format("image")
        .option("dropInvalid", True)
        .load(str(store))
        .select("image.*")
    )
    rows = {r["origin"].rsplit("/", 1)[-1]: r for r in df.collect()}

    # corrupt file dropped, not a scan failure
    assert set(rows) == {"red.png", "blue.png"}

    red = rows["red.png"]
    assert (red["width"], red["height"]) == (4, 3)
    # mode 16 = CV_8UC3, the reference's filter predicate (F13)
    assert red["mode"] == 16 and red["nChannels"] == 3
    # data is BGR row-major: a pure-red pixel is (0, 0, 255)
    assert bytes(red["data"][:3]) == b"\x00\x00\xff"
    assert bytes(rows["blue.png"]["data"][:3]) == b"\xff\x00\x00"
    assert len(red["data"]) == 4 * 3 * 3


def test_image_source_filter_mode_16_hoisted(spark, tmp_path):
    """F13: the reference filters mode==16 INSIDE its pandas UDF; the
    engine hoists it to a relational filter so Catalyst can prune
    before any Python runs."""
    store = tmp_path / "imgs"
    store.mkdir()
    (store / "a.png").write_bytes(make_png(3, 3, (1, 2, 3)))

    df = spark.read.format("image").load(str(store)).select("image.*")
    kept = df.filter("mode = 16")
    assert kept.count() == 1
