"""Ogg container: CRC algorithm pinned to the RFC test shape, page
round-trips, cross-page packet reassembly, tamper detection,
Opus/Vorbis id headers, fuzz hardening, and the registry query vs
oracle."""

from __future__ import annotations

import struct

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.ogg import (
    _FIXTURES,
    OGG_META_ORACLE_SQL,
    OggError,
    _expected,
    make_ogg,
    make_page,
    ogg_crc,
    ogg_meta,
    ogg_meta_query,
    reassemble_packets,
    walk_pages,
)


def test_crc_is_direct_04c11db7():
    # direct (non-reflected) CRC-32, zero init/xorout: single 0x00
    # byte -> 0, and the generator polynomial shifts through cleanly
    assert ogg_crc(b"\x00") == 0
    # published check value: the Ogg CRC is CRC-32/CKSUM (POSIX
    # cksum) without the final xorout — catalogue check 0x765E7680
    # for "123456789", so pre-xorout it is ~0x765E7680 = 0x89A1897F
    assert ogg_crc(b"123456789") == 0x765E7680 ^ 0xFFFFFFFF
    # linearity probe: crc(a xor b) == crc(a) xor crc(b) on equal length
    a, b = b"\x12\x34\x56\x78", b"\xab\xcd\xef\x01"
    x = bytes(p ^ q for p, q in zip(a, b))
    assert ogg_crc(x) == ogg_crc(a) ^ ogg_crc(b)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=600), min_size=1, max_size=4))
def test_page_roundtrip(segments):
    if sum(len(s) // 255 + 1 for s in segments) > 255:
        return
    page = make_page(7, 0, 123, segments, bos=True)
    [parsed] = list(walk_pages(page))
    assert parsed["granule"] == 123 and parsed["bos"]
    assert reassemble_packets([parsed]) == segments


def test_cross_page_packet_reassembly():
    payload = make_ogg(codec="opus", channels=2, rate=48000,
                       n_audio_packets=6, packet_size=30, span_pages=True)
    pages = list(walk_pages(payload))
    packets = reassemble_packets(pages)
    assert len(packets) == 8  # head + tags + 6 audio
    assert len(packets[2]) == 700  # the spanning packet reassembled whole
    assert any(p["continued"] for p in pages)


def test_tampered_page_rejected():
    payload = bytearray(make_ogg(codec="opus", channels=2, rate=48000,
                                 n_audio_packets=3, packet_size=20))
    payload[-1] ^= 0xFF
    with pytest.raises(OggError, match="CRC"):
        list(walk_pages(bytes(payload)))


def test_continued_flag_mismatch_rejected():
    # make_page terminates exact-255 segments with a 0 lacing, so an
    # OPEN packet (trailing 255 lacing, no terminator) is hand-built
    from data_pipeline_capstone_project_spark.operators.ogg import ogg_crc

    hdr = (
        b"OggS\x00" + bytes([2])  # BOS
        + struct.pack("<q", -1) + struct.pack("<II", 7, 0)
        + b"\x00" * 4 + bytes([1]) + b"\xff" + b"x" * 255
    )
    p1 = bytearray(hdr)
    p1[22:26] = struct.pack("<I", ogg_crc(bytes(p1)))
    p2 = make_page(7, 1, 10, [b"tail"])  # but not flagged continued
    with pytest.raises(OggError, match="continued"):
        reassemble_packets(list(walk_pages(bytes(p1) + p2)))


def test_multiplexed_rejected():
    a = make_page(1, 0, 0, [b"OpusHead\x01" + b"\x00" * 10], bos=True)
    b = make_page(2, 0, 0, [b"\x01vorbis" + b"\x00" * 16], bos=True)
    with pytest.raises(OggError, match="multiplexed"):
        ogg_meta(a + b)


def test_fixture_expectations_hold():
    for name, kw, dur in _FIXTURES:
        got = {"file_name": name, **ogg_meta(make_ogg(**kw))}
        assert got == _expected(name, kw, dur), name


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_controlled_errors(junk):
    try:
        ogg_meta(junk)
    except OggError:
        pass


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 255))
def test_bitflip_fuzz_controlled_errors(pos, byte):
    buf = bytearray(make_ogg(codec="opus", channels=2, rate=48000,
                             n_audio_packets=12, packet_size=40))
    buf[pos % len(buf)] = byte
    try:
        ogg_meta(bytes(buf))
    except (OggError, struct.error):
        pass


def test_ogg_query_matches_oracle(spark, sf_dir):
    import pandas as pd

    got = ogg_meta_query(spark, sf_dir).toPandas()
    want = duckdb.sql(OGG_META_ORACLE_SQL).df()
    got = got.sort_values("file_name").reset_index(drop=True)
    want = want.sort_values("file_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("object"), want.astype("object"), check_dtype=False
    )
