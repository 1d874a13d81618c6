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


def test_block_census_expectations_hold():
    """Parser rows == construction-derived rows for every census
    fixture (the oracle asserts this too at build time; this test
    keeps the failure local and named)."""
    from data_pipeline_capstone_project_spark.operators.ebml import (
        _CENSUS_FIXTURES,
        _census_expected,
        make_webm,
        webm_block_census,
    )

    want = {
        (r["file_name"], r["cluster_idx"]): r for r in _census_expected()
    }
    for name, kw in _CENSUS_FIXTURES:
        for row in webm_block_census(make_webm(**kw)):
            assert {"file_name": name, **row} == want[(name, row["cluster_idx"])]


def test_block_census_keyframe_and_track_flags():
    """keyframe_every and cycle_tracks change flag VALUES, not sizes:
    byte census identical to the all-keyframe default, keyframe and
    track counts differ."""
    from data_pipeline_capstone_project_spark.operators.ebml import (
        make_webm,
        webm_block_census,
        webm_meta,
    )

    base = make_webm(n_clusters=2, blocks_per_cluster=6, block_size=20,
                     seed=4)
    gop = make_webm(n_clusters=2, blocks_per_cluster=6, block_size=20,
                    seed=4, keyframe_every=3, cycle_tracks=True)
    assert len(base) == len(gop)
    mb, mg = webm_meta(base), webm_meta(gop)
    assert mb["block_bytes"] == mg["block_bytes"]
    cb, cg = webm_block_census(base), webm_block_census(gop)
    assert [c["n_keyframes"] for c in cb] == [6, 6]
    assert [c["n_keyframes"] for c in cg] == [2, 2]
    assert [c["n_tracks"] for c in cb] == [1, 1]
    assert [c["n_tracks"] for c in cg] == [2, 2]
    assert [c["payload_bytes"] for c in cb] == [c["payload_bytes"] for c in cg]


def test_block_census_empty_cluster_and_corrupt_block():
    """A cluster with zero SimpleBlocks yields a zero row; a
    SimpleBlock whose framing is truncated raises EBMLError."""
    import struct as _s

    from data_pipeline_capstone_project_spark.operators.ebml import (
        _CLUSTER,
        _CLUSTER_TIMESTAMP,
        _EBML,
        _DOCTYPE,
        _SEGMENT,
        _SIMPLE_BLOCK,
        _element,
        _uint,
        EBMLError,
        webm_block_census,
    )
    import pytest as _pytest

    ebml = _element(_EBML, _element(_DOCTYPE, b"webm"))
    empty_cluster = _element(_CLUSTER, _element(_CLUSTER_TIMESTAMP, _uint(5)))
    payload = ebml + _element(_SEGMENT, empty_cluster)
    rows = webm_block_census(payload)
    assert rows == [
        {
            "cluster_idx": 0, "cluster_ts": 5, "n_blocks": 0,
            "n_keyframes": 0, "n_frames": 0, "n_laced": 0,
            "n_tracks": 0, "payload_bytes": 0,
            "block_bytes": 0, "min_rel_ts": 0, "max_rel_ts": 0,
        }
    ]
    # SimpleBlock with only a track VINT (no rel-ts/flags): corrupt
    bad_cluster = _element(
        _CLUSTER,
        _element(_CLUSTER_TIMESTAMP, _uint(0))
        + _element(_SIMPLE_BLOCK, b"\x81"),
    )
    with _pytest.raises(EBMLError):
        webm_block_census(ebml + _element(_SEGMENT, bad_cluster))
    # negative relative timestamps surface signed
    neg_cluster = _element(
        _CLUSTER,
        _element(_CLUSTER_TIMESTAMP, _uint(0))
        + _element(_SIMPLE_BLOCK, b"\x81" + _s.pack(">hB", -12, 0x80) + b"xy"),
    )
    rows = webm_block_census(ebml + _element(_SEGMENT, neg_cluster))
    assert rows[0]["min_rel_ts"] == -12 and rows[0]["max_rel_ts"] == -12


def test_lacing_hand_built_streams():
    """Lace parsing pinned against hand-built SimpleBlock bodies:
    Xiph with a 255-spill size, EBML with a negative signed delta,
    fixed-size division - counted and byte-accounted exactly."""
    import struct as _s

    from data_pipeline_capstone_project_spark.operators.ebml import (
        _CLUSTER,
        _CLUSTER_TIMESTAMP,
        _DOCTYPE,
        _EBML,
        _SEGMENT,
        _SIMPLE_BLOCK,
        _element,
        _uint,
        webm_block_census,
    )

    def file_with(body: bytes) -> bytes:
        ebml = _element(_EBML, _element(_DOCTYPE, b"webm"))
        cluster = _element(
            _CLUSTER,
            _element(_CLUSTER_TIMESTAMP, _uint(0))
            + _element(_SIMPLE_BLOCK, body),
        )
        return ebml + _element(_SEGMENT, cluster)

    frame = bytes(range(10))
    # Xiph, 3 frames: sizes 300 (255-spill), 2, last = remainder 5
    body = (
        b"\x81" + _s.pack(">hB", 0, 0x80 | 0x02)
        + bytes((2,)) + b"\xff" + bytes((45,)) + bytes((2,))
        + bytes(300) + frame[:2] + frame[:5]
    )
    (row,) = webm_block_census(file_with(body))
    assert (row["n_frames"], row["n_laced"]) == (3, 1)
    assert row["payload_bytes"] == 300 + 2 + 5

    # EBML, 3 frames: first 9, delta -4 -> 5, last = remainder 3.
    # signed delta -4 at 1 byte: raw = -4 + 63 = 59 -> VINT 0x80|59
    body = (
        b"\x81" + _s.pack(">hB", 0, 0x80 | 0x06)
        + bytes((2,)) + bytes((0x80 | 9,)) + bytes((0x80 | 59,))
        + bytes(9) + bytes(5) + bytes(3)
    )
    (row,) = webm_block_census(file_with(body))
    assert (row["n_frames"], row["n_laced"]) == (3, 1)
    assert row["payload_bytes"] == 9 + 5 + 3

    # fixed, 4 frames of 6
    body = b"\x81" + _s.pack(">hB", 0, 0x04) + bytes((3,)) + bytes(24)
    (row,) = webm_block_census(file_with(body))
    assert (row["n_frames"], row["n_laced"], row["payload_bytes"]) == (4, 1, 24)


def test_lacing_hostile_streams_raise():
    """Corrupt lace headers fail loudly: sizes overrunning the block,
    a fixed-size payload that does not divide, truncated Xiph sizes."""
    import struct as _s

    import pytest as _pytest

    from data_pipeline_capstone_project_spark.operators.ebml import (
        _CLUSTER,
        _CLUSTER_TIMESTAMP,
        _DOCTYPE,
        _EBML,
        _SEGMENT,
        _SIMPLE_BLOCK,
        _element,
        _uint,
        EBMLError,
        webm_block_census,
    )

    def file_with(body: bytes) -> bytes:
        ebml = _element(_EBML, _element(_DOCTYPE, b"webm"))
        cluster = _element(
            _CLUSTER,
            _element(_CLUSTER_TIMESTAMP, _uint(0))
            + _element(_SIMPLE_BLOCK, body),
        )
        return ebml + _element(_SEGMENT, cluster)

    # Xiph size 200 but only 3 payload bytes left
    body = b"\x81" + _s.pack(">hB", 0, 0x02) + bytes((1, 200)) + bytes(3)
    with _pytest.raises(EBMLError, match="overrun"):
        webm_block_census(file_with(body))
    # fixed lacing: 5 payload bytes across 2 frames
    body = b"\x81" + _s.pack(">hB", 0, 0x04) + bytes((1,)) + bytes(5)
    with _pytest.raises(EBMLError, match="divide"):
        webm_block_census(file_with(body))
    # Xiph 255-spill runs off the end of the block
    body = b"\x81" + _s.pack(">hB", 0, 0x02) + bytes((1,)) + b"\xff\xff"
    with _pytest.raises(EBMLError, match="truncated Xiph"):
        webm_block_census(file_with(body))


def test_blockgroup_keyframe_by_reference_absence():
    """Blocks in BlockGroups carry no keyframe flag; the census must
    derive keyframe-ness from the ReferenceBlock's ABSENCE, and a
    BlockGroup without any Block is corrupt."""
    import pytest as _pytest

    from data_pipeline_capstone_project_spark.operators.ebml import (
        _BLOCK_GROUP,
        _CLUSTER,
        _CLUSTER_TIMESTAMP,
        _DOCTYPE,
        _EBML,
        _REFERENCE_BLOCK,
        _SEGMENT,
        _element,
        _uint,
        EBMLError,
        make_webm,
        webm_block_census,
    )

    rows = webm_block_census(
        make_webm(block_groups=True, n_clusters=1, blocks_per_cluster=6,
                  block_size=12, keyframe_every=3, seed=5)
    )
    assert rows[0]["n_blocks"] == 6
    assert rows[0]["n_keyframes"] == 2  # bi 0 and 3
    assert rows[0]["payload_bytes"] == 6 * 12

    # group with a ReferenceBlock but NO Block
    ebml = _element(_EBML, _element(_DOCTYPE, b"webm"))
    bad = _element(
        _CLUSTER,
        _element(_CLUSTER_TIMESTAMP, _uint(0))
        + _element(
            _BLOCK_GROUP,
            _element(_REFERENCE_BLOCK, (-1).to_bytes(1, "big", signed=True)),
        ),
    )
    with _pytest.raises(EBMLError, match="without a Block"):
        webm_block_census(ebml + _element(_SEGMENT, bad))


def test_lacing_roundtrip_property():
    """Hypothesis sweep over make_webm lacing configurations: the
    census frame counts and frame-byte accounting must equal the
    construction arithmetic for every mode/shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_capstone_project_spark.operators.ebml import (
        _lace_sizes,
        make_webm,
        webm_block_census,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.sampled_from(["xiph", "ebml", "fixed"]),
        st.integers(1, 9),
        st.integers(1, 4),
        st.integers(1, 3),
        st.integers(2, 320),
        st.booleans(),
        st.integers(0, 99),
    )
    def run(lacing, fpb, bpc, ncl, bs, groups, seed):
        payload = make_webm(
            lacing=lacing, frames_per_block=fpb, blocks_per_cluster=bpc,
            n_clusters=ncl, block_size=bs, seed=seed,
            block_groups=groups,
        )
        sizes = (
            [bs] * fpb if lacing == "fixed" else _lace_sizes(bs, fpb)
        )
        for row in webm_block_census(payload):
            assert row["n_blocks"] == bpc
            assert row["n_frames"] == bpc * fpb
            assert row["n_laced"] == bpc
            assert row["payload_bytes"] == bpc * sum(sizes)

    run()
