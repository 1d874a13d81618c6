"""FLAC codec properties: bit-exact round trips across every
subframe/decorrelation/residual variant, and the integrity ladder -
header CRC-8, frame CRC-16, STREAMINFO MD5 - each catching the
corruption class it is specified to catch."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_capstone_project_spark.operators.flac import (
    _crc8,
    _crc16,
    _flac_fixtures,
    _read_utf8_number,
    _utf8_number,
    _BitR,
    flac_meta,
    flac_pcm,
    make_flac,
)


def test_fixture_round_trip_bit_exact():
    for name, samples, rate, bps, block, mode, sub in _flac_fixtures():
        payload = make_flac(samples, rate, bps, block, mode, sub)
        assert flac_meta(payload) == (
            samples.shape[1], rate, bps, len(samples)
        ), name
        assert np.array_equal(flac_pcm(payload), samples), name


def test_utf8_coded_numbers_full_range():
    for n in [0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              (1 << 21) - 1, 1 << 21, (1 << 26) - 1, 1 << 26,
              (1 << 31) - 1, 1 << 31, (1 << 36) - 1]:
        assert _read_utf8_number(_BitR(_utf8_number(n))) == n


def test_crc_vectors():
    """Known-answer vectors for the two generator polynomials
    (0x07 for CRC-8, 0x8005 for CRC-16, both init 0)."""
    assert _crc8(b"") == 0
    assert _crc8(b"\x00") == 0
    assert _crc8(b"123456789") == 0xF4  # standard CRC-8/ATM check value
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS check value


def _sample_payload() -> tuple[bytes, np.ndarray]:
    name, samples, rate, bps, block, mode, sub = _flac_fixtures()[0]
    return make_flac(samples, rate, bps, block, mode, sub), samples


def test_frame_crc16_catches_payload_corruption():
    payload, _ = _sample_payload()
    tampered = bytearray(payload)
    tampered[-40] ^= 0x10  # inside the last frame's subframe data
    with pytest.raises(ValueError):
        flac_pcm(bytes(tampered))


def test_header_crc8_catches_header_corruption():
    payload, _ = _sample_payload()
    tampered = bytearray(payload)
    # first frame starts right after the 4+4+34 byte metadata prefix;
    # flip the channel-assignment nibble in its header
    tampered[42 + 3] ^= 0x20
    with pytest.raises(ValueError):
        flac_pcm(bytes(tampered))


def test_streaminfo_md5_catches_metadata_lies():
    """Corrupt the STREAMINFO MD5 itself: frames all decode and CRCs
    pass, so only the end-to-end MD5 check can notice."""
    payload, _ = _sample_payload()
    tampered = bytearray(payload)
    tampered[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        flac_pcm(bytes(tampered))
    # and the check is skippable for forensic reads
    assert flac_pcm(bytes(tampered), verify_md5=False).size


def test_truncated_stream_rejected():
    payload, _ = _sample_payload()
    for cut in (2, 10, 40, len(payload) // 2, len(payload) - 3):
        with pytest.raises(ValueError):
            flac_pcm(payload[:cut])
