"""GIF codec properties: LZW round trips (including the 4096-entry
dictionary reset), interlace de-permutation, palette resolution, and
hostile-dimension rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_pipeline_capstone_project_spark.operators.gif import (
    _gif_fixtures,
    _interlace_order,
    _lzw_decode,
    _lzw_encode,
    gif_frames,
    gif_meta,
    make_gif,
)


def test_lzw_round_trip_through_dictionary_reset():
    rng = np.random.default_rng(7)
    for n, pal in [(1, 4), (255, 8), (50_000, 256), (70_000, 2)]:
        data = rng.integers(0, pal, n).astype(np.uint8).tobytes()
        mc = max(2, (pal - 1).bit_length())
        assert _lzw_decode(_lzw_encode(data, mc), mc, n) == data


def test_interlace_order_is_a_permutation():
    for h in (1, 2, 7, 8, 9, 64):
        order = _interlace_order(h)
        assert sorted(order) == list(range(h))


def test_fixture_round_trip_bit_exact():
    for name, w, h, gpal, frames in _gif_fixtures():
        payload = make_gif(w, h, gpal, frames)
        assert gif_meta(payload) == (w, h)
        decoded = gif_frames(payload)
        assert len(decoded) == len(frames)
        for fr, d in zip(frames, decoded):
            pal = fr.get("palette")
            pal = gpal if pal is None else pal
            assert np.array_equal(d["rgb"], pal[fr["idx"]])
            assert d["delay_cs"] == fr.get("delay_cs")
            assert d["transparent_idx"] == fr.get("transparent")
            assert d["interlaced"] == bool(fr.get("interlace"))
            assert d["local_palette"] == ("palette" in fr)


def test_hostile_frame_dimensions_rejected():
    pal = np.zeros((4, 3), dtype=np.uint8)
    payload = bytearray(
        make_gif(5, 5, pal, [{"idx": np.zeros((5, 5), dtype=np.uint8)}])
    )
    pos = payload.find(b"\x2c")
    payload[pos + 5 : pos + 9] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError):
        gif_frames(bytes(payload))


def test_truncated_color_table_rejected():
    pal = np.zeros((4, 3), dtype=np.uint8)
    payload = make_gif(5, 5, pal, [{"idx": np.zeros((5, 5), dtype=np.uint8)}])
    with pytest.raises(ValueError):
        gif_frames(payload[:16])
