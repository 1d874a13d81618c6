"""Round-3 additions: pure-Python PNG codec + image pipeline queries,
and the upsert audit (ES ``_version``) operator."""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.images import (
    _chunk,
    make_png,
    png_meta,
    png_pixels,
)


def test_png_roundtrip_random_pixels():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    payload = make_png(px)
    assert png_meta(payload) == (9, 5)
    assert np.array_equal(png_pixels(payload), px)


def test_png_decoder_handles_all_filters():
    """The fixture encoder only emits filter 0, but real encoders use
    Sub/Up/Average/Paeth - build one scanline of each by hand and
    check the unfilter logic against a reference decode."""
    w, h = 4, 5
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3) * 3 % 251

    def encode_with_filters(pixels, ftypes):
        raw = bytearray()
        prev = np.zeros(w * 3, dtype=np.int32)
        for y, ftype in enumerate(ftypes):
            line = pixels[y].reshape(-1).astype(np.int32)
            out = np.zeros(w * 3, dtype=np.int32)
            for x in range(w * 3):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
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
                out[x] = (line[x] - base) & 0xFF
            raw.append(ftype)
            raw += bytes(out.astype(np.uint8))
            prev = line
        header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", header)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )

    payload = encode_with_filters(px, [0, 1, 2, 3, 4])
    assert np.array_equal(png_pixels(payload), px)


def test_image_decode_cross_checks_jvm(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.images import (
        image_decode_query,
    )

    df = image_decode_query(spark, sf_dir)
    rows = df.collect()
    assert rows and all(r.pixels_match for r in rows)


def test_color_palette_png_exact(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.images import (
        _expected_palette_json,
        color_palette_png_query,
    )

    got = {r.igId: r.colors for r in color_palette_png_query(spark, sf_dir).collect()}
    assert got == {str(u): _expected_palette_json(u) for u in range(len(got))}


def test_upsert_audit_consistent_with_latest_wins(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.upsert import (
        latest_wins_query,
        upsert_audit_query,
    )

    audit = upsert_audit_query(spark, sf_dir).cache()
    latest = latest_wins_query(spark, sf_dir)
    # same keys, same surviving row
    assert audit.count() == latest.count()
    assert (
        audit.select("user_id", "event_type", "event_id")
        .exceptAll(latest.select("user_id", "event_type", "event_id"))
        .count()
        == 0
    )
    # version_count sums to the full event count; single-version keys
    # cannot be flagged changed
    from data_pipeline_capstone_project_spark.sources.readers import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    assert audit.agg(F.sum("version_count")).collect()[0][0] == n_events
    assert audit.filter((F.col("version_count") == 1) & F.col("changed")).count() == 0
    audit.unpersist()
