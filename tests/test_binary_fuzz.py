"""Corruption contract for the binary parsers: the multimodal path
feeds them arbitrary store bytes, so a truncated / bit-flipped /
spliced payload must raise a clean ValueError or NotImplementedError
- never an internal IndexError/StopIteration/struct.error and never
an unbounded allocation (the JPEG_MAX_PIXELS guard). Seeded subset of
the 6000-mutation fuzz run recorded in round 5."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from data_pipeline_capstone_project_spark.operators.audio import (
    make_wav,
    wav_meta,
    wav_pcm,
)
from data_pipeline_capstone_project_spark.operators.flac import (
    _lcg_samples,
    flac_meta,
    flac_pcm,
    make_flac,
)
from data_pipeline_capstone_project_spark.operators.mp3 import (
    make_mp3,
    mp3_meta,
    mp3_pcm,
)
from data_pipeline_capstone_project_spark.operators.gif import (
    _lcg_indices,
    _lcg_palette,
    gif_frames,
    gif_meta,
    make_gif,
)
from data_pipeline_capstone_project_spark.operators.images import (
    bmp_meta,
    bmp_pixels,
    make_bmp,
    make_png,
    png_meta,
    png_pixels,
)
from data_pipeline_capstone_project_spark.operators.jpeg import (
    jpeg_meta,
    jpeg_pixels,
    make_jpeg,
)
from data_pipeline_capstone_project_spark.operators.mp4 import (
    make_mjpeg_mp4,
    make_mp4,
    mp4_frames,
    mp4_meta,
)

PARSERS = (
    jpeg_pixels, jpeg_meta, mp4_meta, mp4_frames, wav_meta, wav_pcm,
    png_meta, png_pixels, gif_meta, gif_frames, flac_meta, flac_pcm,
    bmp_meta, bmp_pixels, mp3_meta, mp3_pcm,
)


def _seeds() -> list[bytes]:
    px = np.random.RandomState(0).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    return [
        make_jpeg(px),
        make_jpeg(px, progressive=True),
        make_jpeg(px, subsampling="420", interleave=False),
        make_mp4(320, 240, 1000),
        make_mjpeg_mp4(
            [px, px], fragmented=True, frames_per_frag=1, use_mehd=False
        ),
        make_wav(200),
        make_wav(200, bits=24),
        make_wav(200, bits=32, float_fmt=True),
        make_wav(200, bits=8, g711="ulaw"),
        make_wav(200, bits=4, ima_adpcm=True),
        make_png(np.random.RandomState(1).randint(0, 256, (9, 7, 3)).astype(np.uint8)),
        make_png(
            np.random.RandomState(2).randint(0, 16, (9, 7)).astype(np.uint8),
            color_type=3,
            palette=[(i, i, i) for i in range(16)],
            interlace=True,
        ),
        make_bmp(
            np.random.RandomState(3).randint(0, 256, (6, 9, 3)).astype(np.uint8)
        ),
        make_mp3(12, seed=9, id3v2=b"\0" * 33, id3v1=True),
        make_mp3(9, version=2, channels=1, vbr_indices=[3, 8, 11], seed=10),
        make_flac(
            _lcg_samples(160, 2, 16, seed=5, smooth=True), 8000, 16, 64,
            "mid_side", {"type": "fixed", "order": 2, "part_order": 1},
        ),
        make_flac(
            _lcg_samples(100, 1, 16, seed=6), 16000, 16, 64,
            "independent",
            {"type": "lpc", "order": 2, "coefs": [3, -1], "shift": 2,
             "precision": 5},
        ),
        make_gif(
            11, 7, _lcg_palette(8, 0),
            [
                {"idx": _lcg_indices(7, 11, 8, 0), "delay_cs": 5},
                {
                    "idx": _lcg_indices(5, 8, 4, 1),
                    "left": 2, "top": 1, "interlace": True,
                    "palette": _lcg_palette(4, 1), "transparent": 1,
                },
            ],
        ),
    ]


def test_corrupt_streams_raise_cleanly():
    rng = random.Random(42)
    seeds = _seeds()
    for _ in range(400):
        base = bytearray(rng.choice(seeds))
        op = rng.random()
        if op < 0.4:  # truncate
            data = bytes(base[: rng.randrange(len(base))])
        elif op < 0.8:  # flip bytes
            for _ in range(rng.randrange(1, 8)):
                base[rng.randrange(len(base))] = rng.randrange(256)
            data = bytes(base)
        else:  # splice
            data = bytes(base[: len(base) // 2] + base[: rng.randrange(len(base))])
        for fn in PARSERS:
            try:
                fn(data)
            except (ValueError, NotImplementedError):
                pass  # the contract


def test_hostile_sof_dimensions_rejected():
    """A flipped SOF declaring a 65535x65535 frame must raise before
    allocating ~17 GB of coefficient store."""
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    payload = bytearray(make_jpeg(px))
    sof = payload.find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2)
    payload[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError):
        jpeg_pixels(bytes(payload))
