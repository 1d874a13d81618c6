"""EXIF APP1/TIFF: both byte orders, inline vs offset-stored values,
the spliced JPEG remaining fully decodable, malformed hardening, and
the registry query vs oracle."""

from __future__ import annotations

import struct

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.exif import (
    _FIXTURES,
    EXIF_META_ORACLE_SQL,
    ExifError,
    _frame,
    exif_meta,
    exif_meta_query,
    make_exif_app1,
    make_exif_jpeg,
)


def test_both_byte_orders_roundtrip():
    for i, (name, kw) in enumerate(_FIXTURES):
        m = exif_meta(make_exif_jpeg(_frame(i), **kw))
        assert m["orientation"] == kw["orientation"], name
        assert m["byte_order"] == ("MM" if kw.get("big_endian") else "II")
        assert (m["exif_width"], m["exif_height"]) == (kw["width"], kw["height"])
        assert (m["f_number_num"], m["f_number_den"]) == kw["f_number"]


def test_spliced_jpeg_still_decodes():
    """The APP1 splice must not break the image itself."""
    from data_pipeline_capstone_project_spark.operators.jpeg import (
        jpeg_pixels,
        make_jpeg,
    )

    frame = _frame(0)
    plain = jpeg_pixels(make_jpeg(frame))
    tagged = jpeg_pixels(make_exif_jpeg(frame, **_FIXTURES[0][1]))
    assert np.array_equal(plain, tagged)


def test_absent_tags_are_none():
    # hand-built APP1 with ONLY an IFD0 orientation entry: every
    # other field (incl. the whole Exif sub-IFD) must surface as None
    from data_pipeline_capstone_project_spark.operators.exif import (
        _SHORT,
        T_ORIENTATION,
        _build_ifd,
    )

    ifd0, data0 = _build_ifd([(T_ORIENTATION, _SHORT, 1, 3)], 8, "<")
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd0 + data0
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    from data_pipeline_capstone_project_spark.operators.jpeg import make_jpeg

    base = make_jpeg(_frame(0))
    m = exif_meta(base[:2] + app1 + base[2:])
    assert m["orientation"] == 3
    assert m["make"] is None and m["exif_width"] is None
    assert m["f_number_num"] is None


def test_jpeg_without_app1_rejected():
    from data_pipeline_capstone_project_spark.operators.jpeg import make_jpeg

    with pytest.raises(ExifError, match="no Exif APP1"):
        exif_meta(make_jpeg(_frame(0)))


def test_malformed_rejected():
    good = make_exif_jpeg(_frame(0), **_FIXTURES[0][1])
    with pytest.raises(ExifError, match="SOI"):
        exif_meta(b"\x00" + good)
    # corrupt the byte-order mark (right after the Exif preamble)
    i = good.index(b"Exif\x00\x00") + 6
    with pytest.raises(ExifError, match="byte-order"):
        exif_meta(good[:i] + b"XX" + good[i + 2:])
    with pytest.raises(ExifError, match="magic"):
        exif_meta(good[:i + 2] + struct.pack("<H", 41) + good[i + 4:])


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 3000), st.integers(0, 255))
def test_bitflip_fuzz_controlled_errors(pos, byte):
    buf = bytearray(make_exif_jpeg(_frame(1), **_FIXTURES[1][1]))
    buf[pos % len(buf)] = byte
    try:
        exif_meta(bytes(buf))
    except (ExifError, UnicodeDecodeError, struct.error):
        pass


def test_exif_query_matches_oracle(spark, sf_dir):
    import pandas as pd

    got = exif_meta_query(spark, sf_dir).toPandas()
    want = duckdb.sql(EXIF_META_ORACLE_SQL).df()
    got = got.sort_values("file_name").reset_index(drop=True)
    want = want.sort_values("file_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("object"), want.astype("object"), check_dtype=False
    )
