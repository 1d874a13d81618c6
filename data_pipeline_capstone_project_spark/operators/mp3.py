"""MP3 (MPEG-1/2 Layer III) container metadata - frame-header walk.

The metadata-only sibling of :mod:`.flac` for the lossy format user
uploads actually arrive in: bitrate/samplerate/mode from the first
frame header, frame count + exact duration from walking every frame
(CBR and VBR both - the walk reads each header's own bitrate), ID3v2
prefix (syncsafe size) and ID3v1 tail handled. Sample decode lives
in :mod:`.mp3_l3` (r12): mono MPEG-1 Layer III granule decode with
the documented envelope/seams; ``mp3_pcm`` dispatches into it. The
container layer here is what a curation pipeline filters on
(duration caps, bitrate floors, mono/stereo routing).

Fixture writer emits spec-valid frame sequences (correct sync,
version/layer bits, per-frame bitrate indices, padding bits, LCG
payload bytes) so the walk is exercised against a closed-form oracle
computed from the written geometry - the oracle never runs the
parser.
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: MPEG-1 Layer III bitrate table (kbps), index 1-14
_BITRATES_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
#: MPEG-2/2.5 Layer III
_BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}
#: samples per frame: MPEG-1 Layer III = 1152, MPEG-2/2.5 = 576
_SPF = {3: 1152, 2: 576, 0: 576}


def _frame_len(version: int, bitrate_kbps: int, rate: int, pad: int) -> int:
    coef = 144 if version == 3 else 72
    return coef * bitrate_kbps * 1000 // rate + pad


def make_mp3(
    n_frames: int,
    bitrate_idx: int = 9,
    rate_idx: int = 0,
    version: int = 3,
    channels: int = 2,
    seed: int = 0,
    id3v2: bytes | None = None,
    id3v1: bool = False,
    vbr_indices: list[int] | None = None,
) -> bytes:
    """Spec-valid Layer III frame sequence. ``version``: 3 = MPEG-1,
    2 = MPEG-2. ``vbr_indices`` overrides the bitrate index per frame
    (VBR); padding bit alternates to exercise both frame lengths."""
    mask = (1 << 64) - 1
    state = (seed * 6364136223846793005 + 1442695040888963407) & mask
    out = bytearray()
    if id3v2 is not None:
        size = len(id3v2)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3" + bytes([4, 0, 0]) + ss + id3v2
    rate = _RATES[version][rate_idx]
    for f in range(n_frames):
        bidx = vbr_indices[f % len(vbr_indices)] if vbr_indices else bitrate_idx
        table = _BITRATES_V1 if version == 3 else _BITRATES_V2
        kbps = table[bidx]
        pad = f % 2
        h0 = 0xFF
        h1 = 0xE0 | (version << 3) | (1 << 1) | 1  # sync, version, layer III, no-CRC
        h2 = (bidx << 4) | (rate_idx << 2) | (pad << 1)
        mode = 0 if channels == 2 else 3
        h3 = mode << 6
        flen = _frame_len(version, kbps, rate, pad)
        out += bytes([h0, h1, h2, h3])
        for _ in range(flen - 4):
            state = (state * 6364136223846793005 + 1442695040888963407) & mask
            b = (state >> 33) % 256
            out.append(b if b != 0xFF else 0xFE)  # no fake syncwords
    if id3v1:
        out += b"TAG" + b"\0" * 125
    return bytes(out)


def mp3_meta(payload: bytes) -> dict:
    """Walk every frame: (version, layer, channels, sample_rate,
    n_frames, total_bytes of audio frames, duration_ms exact from
    samples/frame, mean_bitrate_kbps rounded, vbr flag). Corrupt
    streams raise ValueError; non-Layer-III MPEG raises
    NotImplementedError."""
    try:
        return _mp3_meta_impl(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt MP3 stream ({type(e).__name__})") from e


def _mp3_meta_impl(payload: bytes) -> dict:
    # One tag-trimming implementation (ADVICE r13): the meta walk and
    # the decode path must agree on where the frame stream starts
    # (v2.4 footer flag) and when an ID3v1 tail can exist at all.
    payload = strip_id3(payload)
    pos = 0
    end = len(payload)
    n_frames = 0
    audio_bytes = 0
    kbps_sum = 0
    kbps_set: set[int] = set()
    version = rate = channels = None
    while pos < end:
        if pos + 4 > end:
            raise ValueError("trailing garbage after last MP3 frame")
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError("lost MP3 frame sync")
        ver = (b1 >> 3) & 3
        layer = (b1 >> 1) & 3
        if ver == 1:
            raise ValueError("reserved MPEG version")
        if layer != 1:
            raise NotImplementedError("only Layer III supported")
        bidx = (b2 >> 4) & 0xF
        ridx = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        mode = (b3 >> 6) & 3
        if bidx in (0, 15) or ridx == 3:
            raise ValueError("free-format/invalid bitrate or rate index")
        table = _BITRATES_V1 if ver == 3 else _BITRATES_V2
        kbps = table[bidx]
        r = _RATES[ver][ridx]
        ch = 1 if mode == 3 else 2
        if version is None:
            version, rate, channels = ver, r, ch
        elif (ver, r, ch) != (version, rate, channels):
            raise ValueError("mid-stream format change")
        flen = _frame_len(ver, kbps, r, pad)
        if pos + flen > end:
            raise ValueError("truncated final MP3 frame")
        pos += flen
        n_frames += 1
        audio_bytes += flen
        kbps_sum += kbps
        kbps_set.add(kbps)
    if n_frames == 0:
        raise ValueError("no MP3 frames")
    spf = _SPF[version]
    duration_ms = round(n_frames * spf * 1000 / rate)
    return {
        "mpeg_version": {3: 1, 2: 2, 0: 25}[version],
        "channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "audio_bytes": audio_bytes,
        "duration_ms": duration_ms,
        "mean_kbps": round(kbps_sum / n_frames),
        "vbr": len(kbps_set) > 1,
    }


def strip_id3(payload: bytes) -> bytes:
    """Return the bare frame stream: trim an ID3v2 prefix (syncsafe
    size, same arithmetic as the meta walk) and a 128-byte ID3v1
    'TAG' tail. decode_mp3 requires frame sync at byte 0 and walks to
    EOF, so tagged-but-valid streams would otherwise raise a
    misleading 'lost MP3 frame sync' (ADVICE r12, medium)."""
    start = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        ss = payload[6:10]
        if any(b & 0x80 for b in ss):
            raise ValueError("bad ID3v2 syncsafe size")
        start = 10 + ((ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3])
        # ID3v2.4 footer flag (informal spec 3.1): a present footer
        # is 10 bytes NOT counted in the syncsafe size (ADVICE r13).
        if payload[5] & 0x10:
            start += 10
    end = len(payload)
    # ID3v1 tags are fixed 128-byte trailers; a shorter payload cannot
    # carry one, and a negative-index slice would read frame data
    # (ADVICE r13).
    if end - start >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128
    return payload[start:end]


def mp3_pcm(payload: bytes) -> np.ndarray:
    """Layer III sample decode (r12, VERDICT r11 item 5): MPEG-1
    44.1 kHz streams decode through the real granule pipeline in
    :mod:`.mp3_l3` (side info -> scalefactors -> Huffman ->
    requantization -> alias reduction -> IMDCT -> polyphase
    synthesis). ID3v2/ID3v1 tags are stripped before decode (the
    frame walker needs sync at byte 0). Features outside the decode
    envelope - untranscribed Huffman tables, MPEG-2 - raise the
    explicit seam errors documented in mp3_l3's module docstring."""
    mp3_meta(payload)  # container must at least be valid
    from .mp3_l3 import decode_mp3

    return decode_mp3(strip_id3(payload))


# --- registry query --------------------------------------------------------

def _mp3_fixtures() -> list[tuple[str, dict, bytes]]:
    """(name, expected-geometry dict inputs, payload) covering MPEG-1
    and MPEG-2, mono/stereo, CBR and VBR, ID3v2 prefix and ID3v1
    tail."""
    specs = [
        dict(n_frames=40, bitrate_idx=9, rate_idx=0, version=3, channels=2,
             seed=1),
        dict(n_frames=25, bitrate_idx=14, rate_idx=1, version=3, channels=1,
             seed=2, id3v1=True),
        dict(n_frames=60, bitrate_idx=7, rate_idx=2, version=3, channels=2,
             seed=3, id3v2=b"\x00" * 77),
        dict(n_frames=33, bitrate_idx=8, rate_idx=0, version=2, channels=1,
             seed=4),
        dict(n_frames=48, rate_idx=0, version=3, channels=2, seed=5,
             vbr_indices=[5, 9, 12, 14]),
        dict(n_frames=16, bitrate_idx=1, rate_idx=2, version=2, channels=2,
             seed=6, id3v2=b"\xAA" * 300, id3v1=True),
    ]
    return [
        (f"t{i}.mp3", spec, make_mp3(**spec)) for i, spec in enumerate(specs)
    ]


MP3_META_SCHEMA = (
    "track_name string, mpeg_version int, channels int, sample_rate int, "
    "n_frames int, audio_bytes long, duration_ms long, mean_kbps int, "
    "vbr int"
)


def mp3_meta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: frame-walk metadata for the MP3 store
    executor-side (binaryFile -> Arrow mapInPandas, zero exchanges)."""
    # driver-local staging: test scaffolding only (FIXTURES.md §6) -
    # multi-node clusters stage fixtures to shared storage first.
    work = tempfile.mkdtemp(prefix="mp3_store_")
    try:
        for name, _spec, payload in _mp3_fixtures():
            with open(os.path.join(work, name), "wb") as f:
                f.write(payload)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("track_name"),
            F.col("content").alias("payload"),
        )

        def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols = [c.split(" ")[0] for c in MP3_META_SCHEMA.split(", ")]
            for pdf in batches:
                rows = []
                for name, p in zip(pdf["track_name"], pdf["payload"]):
                    m = mp3_meta(p)
                    rows.append(
                        (
                            name, m["mpeg_version"], m["channels"],
                            m["sample_rate"], m["n_frames"], m["audio_bytes"],
                            m["duration_ms"], m["mean_kbps"], int(m["vbr"]),
                        )
                    )
                yield pd.DataFrame(rows, columns=cols)

        out = bin_df.mapInPandas(meta_batches, MP3_META_SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _mp3_oracle() -> str:
    """Closed-form expected rows from the fixture GEOMETRY (frame
    counts, bitrate tables, padding alternation) - independent of the
    parser."""
    rows = []
    for name, spec, _payload in _mp3_fixtures():
        version = spec["version"]
        rate = _RATES[version][spec["rate_idx"]]
        table = _BITRATES_V1 if version == 3 else _BITRATES_V2
        n = spec["n_frames"]
        vbr = spec.get("vbr_indices")
        idxs = [
            (vbr[f % len(vbr)] if vbr else spec["bitrate_idx"])
            for f in range(n)
        ]
        audio = sum(
            _frame_len(version, table[i], rate, f % 2)
            for f, i in enumerate(idxs)
        )
        kbps = [table[i] for i in idxs]
        spf = _SPF[version]
        rows.append(
            "('{}', {}, {}, {}, {}, {}, {}, {}, {})".format(
                name, {3: 1, 2: 2}[version], spec["channels"], rate, n,
                audio, round(n * spf * 1000 / rate),
                round(sum(kbps) / n), int(len(set(kbps)) > 1),
            )
        )
    cols = ", ".join(c.split(" ")[0] for c in MP3_META_SCHEMA.split(", "))
    return f"SELECT {cols} FROM (VALUES {', '.join(rows)}) AS t({cols})"


MP3_META_ORACLE_SQL = _mp3_oracle()
