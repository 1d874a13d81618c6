"""WebM/Matroska EBML walk: VINT round-trips, unknown-size segment
resolution, float32/float64 Duration, unknown-element skip, fixture
expectations, fuzz hardening, and the Spark query vs its oracle."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.ebml import (
    _FIXTURES,
    WEBM_META_ORACLE_SQL,
    EBMLError,
    _expected_rows,
    _read_vint,
    _write_vint_id,
    _write_vint_size,
    make_webm,
    webm_meta,
    webm_meta_query,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**50))
def test_vint_size_roundtrip(value):
    buf = _write_vint_size(value)
    got, pos, unknown = _read_vint(buf, 0, keep_marker=False)
    assert (got, pos, unknown) == (value, len(buf), False)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**42), st.integers(1, 8))
def test_vint_size_forced_width_roundtrip(value, width):
    if value > (1 << (7 * width)) - 2:
        with pytest.raises(EBMLError):
            _write_vint_size(value, width)
        return
    buf = _write_vint_size(value, width)
    assert len(buf) == width
    got, _, unknown = _read_vint(buf, 0, keep_marker=False)
    assert (got, unknown) == (value, False)


def test_vint_unknown_size_pattern():
    assert _write_vint_size(-1) == b"\xff"
    _, _, unknown = _read_vint(b"\xff", 0, keep_marker=False)
    assert unknown
    # the 2-byte unknown pattern too (0x7F 0xFF)
    _, _, unknown2 = _read_vint(b"\x7f\xff", 0, keep_marker=False)
    assert unknown2


def test_element_ids_keep_marker():
    got, _, _ = _read_vint(_write_vint_id(0x1A45DFA3), 0, keep_marker=True)
    assert got == 0x1A45DFA3


def test_fixture_expectations_hold():
    for (name, kw, _e), want in zip(_FIXTURES, _expected_rows()):
        got = {"file_name": name, **webm_meta(make_webm(**kw))}
        got.pop("muxer")
        assert got == want, name


def test_live_stream_fallback_duration():
    m = webm_meta(make_webm(unknown_size_segment=True, duration_units=None,
                            n_clusters=4))
    assert m["duration_ms"] == 3000
    assert m["n_clusters"] == 4


def test_float32_and_float64_duration_agree():
    a = webm_meta(make_webm(duration_units=7500, float32_duration=True))
    b = webm_meta(make_webm(duration_units=7500, float32_duration=False))
    assert a["duration_ms"] == b["duration_ms"] == 7500


def test_not_ebml_rejected():
    with pytest.raises(EBMLError, match="EBML"):
        webm_meta(b"\x81\x81A")  # valid walk, wrong first element
    with pytest.raises(EBMLError):
        webm_meta(b"\x00\x01\x02\x03" * 8)  # 0x00: VINT length > 8
    with pytest.raises(EBMLError):
        webm_meta(b"")


def test_no_segment_rejected():
    # a valid EBML header alone (strip everything after it)
    full = make_webm()
    _, pos, _ = _read_vint(full, 0, keep_marker=True)
    size, pos, _ = _read_vint(full, pos, keep_marker=False)
    with pytest.raises(EBMLError, match="Segment"):
        webm_meta(full[: pos + size])


def test_unknown_size_on_non_master_rejected():
    # hand-build: EBML header, then a DocType with unknown size
    from data_pipeline_capstone_project_spark.operators.ebml import (
        _DOCTYPE,
        _EBML,
        _element,
        _uint,
    )

    bad = _element(_EBML, _write_vint_id(_DOCTYPE) + b"\xff" + b"webm")
    with pytest.raises(EBMLError):
        webm_meta(bad + _uint(0))


def test_truncated_element_rejected():
    full = make_webm()
    with pytest.raises(EBMLError):
        webm_meta(full[: len(full) - 30])


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_controlled_errors(junk):
    try:
        webm_meta(junk)
    except EBMLError:
        pass


@settings(max_examples=40, deadline=None)
@given(st.integers(0, len(make_webm()) - 1), st.integers(0, 255))
def test_bitflip_fuzz_controlled_errors(pos, byte):
    buf = bytearray(make_webm())
    buf[pos] = byte
    try:
        webm_meta(bytes(buf))
    except (EBMLError, UnicodeDecodeError):
        pass


def test_webm_query_matches_oracle(spark, sf_dir):
    import pandas as pd

    got = webm_meta_query(spark, sf_dir).toPandas()
    want = duckdb.sql(WEBM_META_ORACLE_SQL).df()
    got = got.sort_values("file_name").reset_index(drop=True)
    want = want.sort_values("file_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("object"), want.astype("object"), check_dtype=False
    )
