"""WebM / Matroska container metadata, from the published specs
(RFC 8794 EBML; the Matroska element registry, IETF
draft-ietf-cellar-matroska / matroska.org spec tables).

Reference parity: the reference pipeline ingests user-uploaded media
by extension dispatch (s3Posts-to-ES-lambda walks .mp4/.jpg uploads);
WebM is the other container browsers record and serve (VP8/VP9/AV1 +
Opus/Vorbis), so a media curation engine needs its metadata walk next
to the ISO BMFF one in :mod:`operators.mp4`. Scope mirrors mp4_meta /
mp4_audio_meta: container-level facts - doctype, timestamp scale,
duration, per-track codec/dimensions/audio params, cluster and block
census - with NO attempt to decode VP8/VP9/Opus payloads (the same
honest seam as H.264 sample decode).

What is implemented, all from the RFC:
* VINTs (RFC 8794 §4): element IDs keep their length marker; sizes
  strip it; an all-ones size VINT means "unknown size" (live
  streams), legal only on Segment and Cluster here - resolved as
  rest-of-parent per §6.2.
* Element walk with unsigned-int, float (4/8-byte IEEE 754) and
  UTF-8 readers; unknown element IDs are skipped by size (forward
  compatibility, §5).
* Matroska semantics: Info (TimestampScale default 1,000,000 ns,
  Duration in scale units), Tracks/TrackEntry (TrackType 1=video
  2=audio, CodecID, Video PixelWidth/PixelHeight, Audio
  SamplingFrequency/Channels), Cluster/SimpleBlock census.

Spark side (``webm_meta`` registry query): staged fixture store ->
``binaryFile`` -> Arrow ``mapInPandas`` -> one row per file; zero
exchanges, payloads never on the driver; closed-form VALUES oracle
cross-checked against the parser at oracle-build time (the scheme
every media entry here uses).
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EBMLError(ValueError):
    """Malformed EBML/Matroska stream."""


# --- element IDs (Matroska registry; IDs include the marker bits) ----------

_EBML = 0x1A45DFA3
_EBML_VERSION = 0x4286
_EBML_READ_VERSION = 0x42F7
_DOCTYPE = 0x4282
_DOCTYPE_VERSION = 0x4287
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_MUXING_APP = 0x4D80
_WRITING_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQUENCY = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB

#: IDs whose unknown-size form this walk accepts (RFC 8794 §6.2 allows
#: it on any master element; Matroska profiles it to these in
#: practice - streamed/live files).
_UNKNOWN_SIZE_OK = {_SEGMENT, _CLUSTER}


# --- VINT + element I/O ------------------------------------------------------


def _read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int, bool]:
    """(value, new_pos, is_unknown). ``keep_marker`` for element IDs
    (the ID is the full marked pattern); stripped for sizes. The
    all-ones size pattern is "unknown" (RFC 8794 §4.4)."""
    if pos >= len(buf):
        raise EBMLError("VINT at end of stream")
    first = buf[pos]
    if first == 0:
        raise EBMLError("VINT length > 8")
    length = 9 - first.bit_length()  # leading zeros + 1
    if pos + length > len(buf):
        raise EBMLError("VINT overruns stream")
    raw = int.from_bytes(buf[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length, False
    value = raw - (1 << (7 * length))  # strip the marker bit
    unknown = value == (1 << (7 * length)) - 1
    return value, pos + length, unknown


def _write_vint_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _write_vint_size(size: int, length: int = 0) -> bytes:
    """Size VINT; ``length`` forces a width (0 = minimal). -1 emits
    the 1-byte unknown-size pattern 0xFF."""
    if size == -1:
        return b"\xff"
    if not length:
        length = 1
        while size > (1 << (7 * length)) - 2:  # all-ones is reserved
            length += 1
    if size > (1 << (7 * length)) - 2:
        raise EBMLError(f"size {size} needs more than {length} VINT bytes")
    return (size | (1 << (7 * length))).to_bytes(length, "big")


def _element(eid: int, payload: bytes, size_length: int = 0) -> bytes:
    return _write_vint_id(eid) + _write_vint_size(len(payload), size_length) + payload


def _uint(value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return value.to_bytes(n, "big")


def _walk(buf: bytes, start: int, end: int) -> Iterator[tuple[int, int, int]]:
    """Yield (element_id, payload_start, payload_end) for the children
    of buf[start:end]. Unknown-size children are resolved as
    rest-of-parent (legal only for _UNKNOWN_SIZE_OK)."""
    pos = start
    while pos < end:
        eid, pos, _ = _read_vint(buf, pos, keep_marker=True)
        size, pos, unknown = _read_vint(buf, pos, keep_marker=False)
        if unknown:
            if eid not in _UNKNOWN_SIZE_OK:
                raise EBMLError(f"unknown-size element 0x{eid:x}")
            yield eid, pos, end
            return
        if pos + size > end:
            raise EBMLError(f"element 0x{eid:x} overruns parent")
        yield eid, pos, pos + size
        pos += size


def _as_uint(buf: bytes, a: int, b: int) -> int:
    if b - a > 8:
        raise EBMLError("uint element wider than 8 bytes")
    return int.from_bytes(buf[a:b], "big")


def _as_float(buf: bytes, a: int, b: int) -> float:
    if b - a == 4:
        return struct.unpack(">f", buf[a:b])[0]
    if b - a == 8:
        return struct.unpack(">d", buf[a:b])[0]
    if b - a == 0:
        return 0.0
    raise EBMLError("float element must be 0/4/8 bytes")


# --- metadata walk -----------------------------------------------------------


def webm_meta(payload: bytes) -> dict:
    """EBML bytes -> container metadata dict. First video and first
    audio track win (the Matroska default-track convention for the
    common one-of-each layout); duration_ms comes from Info.Duration
    when present, else from the last cluster timestamp (the live-
    stream fallback, same spirit as mp4's trun-sum)."""
    try:
        return _webm_meta_impl(payload)
    except (IndexError, struct.error) as e:  # pragma: no cover - belt
        raise EBMLError(f"corrupt EBML stream ({type(e).__name__})") from e


def _webm_meta_impl(payload: bytes) -> dict:
    top = list(_walk(payload, 0, len(payload)))
    if not top or top[0][0] != _EBML:
        raise EBMLError("not an EBML stream (no EBML header)")
    doctype = "matroska"  # spec default
    doctype_version = 1
    for eid, a, b in _walk(payload, top[0][1], top[0][2]):
        if eid == _DOCTYPE:
            doctype = payload[a:b].decode("utf-8", errors="strict")
        elif eid == _DOCTYPE_VERSION:
            doctype_version = _as_uint(payload, a, b)
    segment = next(((a, b) for eid, a, b in top if eid == _SEGMENT), None)
    if segment is None:
        raise EBMLError("no Segment element")

    ts_scale = 1_000_000  # ns per timestamp unit (spec default)
    duration_units: float | None = None
    muxer = ""
    video: dict | None = None
    audio: dict | None = None
    n_clusters = n_blocks = 0
    block_bytes = 0
    last_cluster_ts: int | None = None

    for eid, a, b in _walk(payload, segment[0], segment[1]):
        if eid == _INFO:
            for e2, c, d in _walk(payload, a, b):
                if e2 == _TIMESTAMP_SCALE:
                    ts_scale = _as_uint(payload, c, d)
                elif e2 == _DURATION:
                    duration_units = _as_float(payload, c, d)
                elif e2 == _MUXING_APP:
                    muxer = payload[c:d].decode("utf-8", errors="strict")
        elif eid == _TRACKS:
            for e2, c, d in _walk(payload, a, b):
                if e2 != _TRACK_ENTRY:
                    continue
                entry: dict = {"codec": "", "type": 0}
                for e3, g, h in _walk(payload, c, d):
                    if e3 == _TRACK_TYPE:
                        entry["type"] = _as_uint(payload, g, h)
                    elif e3 == _CODEC_ID:
                        entry["codec"] = payload[g:h].decode("utf-8")
                    elif e3 == _VIDEO:
                        for e4, i, j in _walk(payload, g, h):
                            if e4 == _PIXEL_WIDTH:
                                entry["width"] = _as_uint(payload, i, j)
                            elif e4 == _PIXEL_HEIGHT:
                                entry["height"] = _as_uint(payload, i, j)
                    elif e3 == _AUDIO:
                        for e4, i, j in _walk(payload, g, h):
                            if e4 == _SAMPLING_FREQUENCY:
                                entry["rate"] = _as_float(payload, i, j)
                            elif e4 == _CHANNELS:
                                entry["channels"] = _as_uint(payload, i, j)
                if entry["type"] == 1 and video is None:
                    video = entry
                elif entry["type"] == 2 and audio is None:
                    audio = entry
        elif eid == _CLUSTER:
            n_clusters += 1
            for e2, c, d in _walk(payload, a, b):
                if e2 == _CLUSTER_TIMESTAMP:
                    last_cluster_ts = _as_uint(payload, c, d)
                elif e2 == _SIMPLE_BLOCK:
                    n_blocks += 1
                    block_bytes += d - c

    if duration_units is not None:
        duration_ms = round(duration_units * ts_scale / 1_000_000)
    elif last_cluster_ts is not None:
        duration_ms = last_cluster_ts * ts_scale // 1_000_000
    else:
        duration_ms = 0
    return {
        "doctype": doctype,
        "doctype_version": doctype_version,
        "timestamp_scale": ts_scale,
        "duration_ms": duration_ms,
        "muxer": muxer,
        "video_codec": video["codec"] if video else None,
        "width": video.get("width") if video else None,
        "height": video.get("height") if video else None,
        "audio_codec": audio["codec"] if audio else None,
        "sample_rate": int(audio["rate"]) if audio and "rate" in audio else None,
        "channels": audio.get("channels") if audio else None,
        "n_clusters": n_clusters,
        "n_blocks": n_blocks,
        "block_bytes": block_bytes,
    }


# --- fixture writer ----------------------------------------------------------


def _lace_sizes(block_size: int, n_frames: int) -> "list[int]":
    """Deterministic per-frame byte sizes for a laced SimpleBlock -
    construction arithmetic shared by the writer and the fixtures'
    expected-row derivation (never by the parser). The variation
    produces both positive and negative EBML lace deltas."""
    return [
        max(1, block_size + ((k * 3) % 7) - 3) for k in range(n_frames)
    ]


def _write_vint_lace_delta(delta: int) -> bytes:
    """Matroska EBML-lacing SIGNED size delta: value stored as
    delta + (2^(7*len-1) - 1) in an ordinary marked VINT."""
    length = 1
    while abs(delta) > (1 << (7 * length - 1)) - 1:
        length += 1
    return _write_vint_size(delta + (1 << (7 * length - 1)) - 1, length)


def make_webm(
    doctype: str = "webm",
    video_codec: str | None = "V_VP9",
    width: int = 640,
    height: int = 360,
    audio_codec: str | None = "A_OPUS",
    sample_rate: int = 48000,
    channels: int = 2,
    ts_scale: int = 1_000_000,
    duration_units: int | None = 4000,
    n_clusters: int = 2,
    blocks_per_cluster: int = 3,
    block_size: int = 25,
    unknown_size_segment: bool = False,
    float32_duration: bool = False,
    seed: int = 1,
    keyframe_every: int = 1,
    cycle_tracks: bool = False,
    lacing: str | None = None,
    frames_per_block: int = 1,
    block_groups: bool = False,
) -> bytes:
    """Deterministic WebM/Matroska writer covering the parser's
    branches: float32 vs float64 Duration, live-stream layout
    (``unknown_size_segment=True`` + no Duration), video-only /
    audio-only files, non-default TimestampScale, multi-byte VINT
    sizes, and unknown elements to skip (a Void and a CRC-32).
    ``keyframe_every`` sets every k-th block's keyframe flag (0x80)
    within a cluster (1 = all keyframes, the old behavior);
    ``cycle_tracks`` alternates SimpleBlock track numbers across the
    written tracks - both vary VALUES only, never framing sizes, so
    the webm_meta byte census is unaffected.

    ``lacing`` (r11): None, or "xiph" / "ebml" / "fixed" - each
    SimpleBlock then carries ``frames_per_block`` frames behind the
    matching lace header (Matroska §6.2.4.1: frame-count byte, then
    255-spill byte sums for Xiph, an unsigned first size + SIGNED
    VINT deltas for EBML, nothing for fixed-size). Frame sizes come
    from `_lace_sizes` (fixed lacing uses ``block_size`` for every
    frame, as the mode requires).

    ``block_groups`` (r11): emit each block as a BlockGroup holding a
    Block element (keyframe-ness signalled the spec's way: a
    ReferenceBlock child marks a non-keyframe; Block carries no 0x80
    flag bit), instead of SimpleBlocks."""
    ebml = _element(
        _EBML,
        _element(_EBML_VERSION, _uint(1))
        + _element(_EBML_READ_VERSION, _uint(1))
        + _element(_DOCTYPE, doctype.encode())
        + _element(_DOCTYPE_VERSION, _uint(4)),
    )
    info = _element(_TIMESTAMP_SCALE, _uint(ts_scale))
    if duration_units is not None:
        fmt = ">f" if float32_duration else ">d"
        info += _element(_DURATION, struct.pack(fmt, float(duration_units)))
    info += _element(_MUXING_APP, b"dpcs-ebml")
    info += _element(_WRITING_APP, b"dpcs-ebml")
    info = _element(_INFO, info)

    tracks = b""
    track_no = 1
    if video_codec is not None:
        tracks += _element(
            _TRACK_ENTRY,
            _element(_TRACK_NUMBER, _uint(track_no))
            + _element(_TRACK_TYPE, _uint(1))
            + _element(_CODEC_ID, video_codec.encode())
            + _element(
                _VIDEO,
                _element(_PIXEL_WIDTH, _uint(width))
                + _element(_PIXEL_HEIGHT, _uint(height)),
            ),
        )
        track_no += 1
    if audio_codec is not None:
        tracks += _element(
            _TRACK_ENTRY,
            _element(_TRACK_NUMBER, _uint(track_no))
            + _element(_TRACK_TYPE, _uint(2))
            + _element(_CODEC_ID, audio_codec.encode())
            + _element(
                _AUDIO,
                _element(_SAMPLING_FREQUENCY, struct.pack(">d", float(sample_rate)))
                + _element(_CHANNELS, _uint(channels)),
            ),
        )
    tracks = _element(_TRACKS, tracks)

    # Void (0xEC) exercises the unknown-element skip; its payload is
    # LCG filler so skipping by size is load-bearing.
    x = seed * 2 + 1
    filler = bytearray()
    for _ in range(11):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        filler.append((x >> 16) & 0xFF)
    void = _element(0xEC, bytes(filler))

    clusters = b""
    cluster_span = (
        duration_units if duration_units is not None else 4000
    ) // max(n_clusters, 1)
    n_tracks = int(video_codec is not None) + int(audio_codec is not None)
    for ci in range(n_clusters):
        blocks = b""
        for bi in range(blocks_per_cluster):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            track = 1 + (bi % n_tracks if cycle_tracks and n_tracks else 0)
            is_key = bi % keyframe_every == 0
            # Block (inside a BlockGroup) has no keyframe flag bit
            flags = 0x80 if is_key and not block_groups else 0x00
            if lacing is None:
                body = bytes(
                    ((x >> (k % 16)) + 7 * bi + k) & 0xFF
                    for k in range(block_size)
                )
            else:
                sizes = (
                    [block_size] * frames_per_block
                    if lacing == "fixed"
                    else _lace_sizes(block_size, frames_per_block)
                )
                head = bytes((frames_per_block - 1,))
                if lacing == "xiph":
                    flags |= 0x02
                    for s in sizes[:-1]:
                        head += b"\xff" * (s // 255) + bytes((s % 255,))
                elif lacing == "ebml":
                    flags |= 0x06
                    # sizes code for all but the LAST frame - a
                    # single-frame lace has no size fields at all
                    if len(sizes) > 1:
                        head += _write_vint_size(sizes[0])
                        for i in range(1, len(sizes) - 1):
                            head += _write_vint_lace_delta(
                                sizes[i] - sizes[i - 1]
                            )
                elif lacing == "fixed":
                    flags |= 0x04
                else:
                    raise EBMLError(f"unknown lacing {lacing!r}")
                frames = b"".join(
                    bytes(
                        ((x >> (k % 16)) + 7 * bi + 13 * fi + k) & 0xFF
                        for k in range(s)
                    )
                    for fi, s in enumerate(sizes)
                )
                body = head + frames
            # Block/SimpleBlock framing (Matroska §6.2.4): track VINT,
            # 16-bit relative timestamp, flags byte, then data.
            framing = (
                _write_vint_size(track)
                + struct.pack(">hB", bi * 7, flags)
                + body
            )
            if block_groups:
                group = _element(_BLOCK, framing)
                if not is_key:
                    # signed relative timestamp of the reference
                    group += _element(
                        _REFERENCE_BLOCK, (-7).to_bytes(1, "big", signed=True)
                    )
                blocks += _element(_BLOCK_GROUP, group)
            else:
                blocks += _element(_SIMPLE_BLOCK, framing)
        clusters += _element(
            _CLUSTER,
            _element(_CLUSTER_TIMESTAMP, _uint(ci * cluster_span)) + blocks,
        )

    body = info + tracks + void + clusters
    if unknown_size_segment:
        segment = _write_vint_id(_SEGMENT) + b"\xff" + body
    else:
        # 8-byte size VINT: the width real muxers reserve up front.
        segment = _write_vint_id(_SEGMENT) + _write_vint_size(len(body), 8) + body
    return ebml + segment


# --- fixtures + registry query -----------------------------------------------

#: (file name, make_webm kwargs, hand-written expected overrides).
#: Expected rows are derived from the CONSTRUCTION arguments (plus
#: spec arithmetic for duration_ms written out by hand below), never
#: from the parser; `_webm_oracle` asserts parser == expectation over
#: the exact bytes at build time.
_FIXTURES: list[tuple[str, dict, dict]] = [
    (
        "vp9_opus.webm",
        {},
        {"duration_ms": 4000},
    ),
    (
        "vp8_vorbis.webm",
        {"video_codec": "V_VP8", "audio_codec": "A_VORBIS",
         "width": 1280, "height": 720, "sample_rate": 44100,
         "duration_units": 7500, "float32_duration": True,
         "n_clusters": 3, "block_size": 40, "seed": 5},
        {"duration_ms": 7500},
    ),
    (
        "av1_8k.webm",
        {"video_codec": "V_AV1", "audio_codec": None,
         "width": 7680, "height": 4320, "duration_units": 120000,
         "blocks_per_cluster": 5, "seed": 9},
        {"duration_ms": 120000},
    ),
    (
        "opus_only.webm",
        {"video_codec": None, "audio_codec": "A_OPUS", "channels": 1,
         "duration_units": 2500, "n_clusters": 1, "seed": 13},
        {"duration_ms": 2500},
    ),
    (
        # live stream: unknown-size Segment, NO Duration element ->
        # duration falls back to the last cluster timestamp. 4 clusters
        # span 4000/4 = 1000 units each; last starts at 3000 units of
        # 1ms (scale 1e6 ns) -> 3000 ms.
        "live_unknown_size.webm",
        {"unknown_size_segment": True, "duration_units": None,
         "n_clusters": 4, "seed": 21},
        {"duration_ms": 3000},
    ),
    (
        # matroska doctype, 100us timestamp scale: 50000 units ->
        # 50000 * 100000 / 1e6 = 5000 ms; cluster census 2x3.
        "mkv_100us_scale.mkv",
        {"doctype": "matroska", "video_codec": "V_MPEG4/ISO/AVC",
         "audio_codec": "A_AAC", "ts_scale": 100_000,
         "duration_units": 50_000, "seed": 33},
        {"duration_ms": 5000},
    ),
]


def _expected_rows() -> list[dict]:
    rows = []
    for name, kw, extra in _FIXTURES:
        args = dict(
            doctype="webm", video_codec="V_VP9", width=640, height=360,
            audio_codec="A_OPUS", sample_rate=48000, channels=2,
            ts_scale=1_000_000, n_clusters=2, blocks_per_cluster=3,
            block_size=25,
        )
        args.update({k: v for k, v in kw.items() if k in args})
        has_v = args["video_codec"] is not None
        has_a = args["audio_codec"] is not None
        n_blocks = args["n_clusters"] * args["blocks_per_cluster"]
        # SimpleBlock payload = 1-byte track VINT + 3 framing + body
        block_bytes = n_blocks * (4 + args["block_size"])
        rows.append(
            {
                "file_name": name,
                "doctype": args["doctype"],
                "doctype_version": 4,
                "timestamp_scale": args["ts_scale"],
                "duration_ms": extra["duration_ms"],
                "video_codec": args["video_codec"] if has_v else None,
                "width": args["width"] if has_v else None,
                "height": args["height"] if has_v else None,
                "audio_codec": args["audio_codec"] if has_a else None,
                "sample_rate": args["sample_rate"] if has_a else None,
                "channels": args["channels"] if has_a else None,
                "n_clusters": args["n_clusters"],
                "n_blocks": n_blocks,
                "block_bytes": block_bytes,
            }
        )
    return rows


def _stage_webm_store(root: str) -> None:
    for name, kw, _extra in _FIXTURES:
        with open(os.path.join(root, name), "wb") as f:
            f.write(make_webm(**kw))


_SCHEMA = (
    "file_name string, doctype string, doctype_version int, "
    "timestamp_scale bigint, duration_ms bigint, video_codec string, "
    "width int, height int, audio_codec string, sample_rate int, "
    "channels int, n_clusters int, n_blocks int, block_bytes bigint"
)

_COLS = [
    "file_name", "doctype", "doctype_version", "timestamp_scale",
    "duration_ms", "video_codec", "width", "height", "audio_codec",
    "sample_rate", "channels", "n_clusters", "n_blocks", "block_bytes",
]


def webm_meta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: staged WebM/MKV store -> binaryFile ->
    mapInPandas -> one metadata row per file. Zero-shuffle scan;
    payloads stay executor-side (the shape every media entry uses)."""
    work = tempfile.mkdtemp(prefix="webm_store_")
    try:
        _stage_webm_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("content").alias("payload"),
        )

        def parse_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = [
                    {"file_name": name, **webm_meta(bytes(p))}
                    for name, p in zip(pdf["file_name"], pdf["payload"])
                ]
                yield pd.DataFrame(out)[_COLS]

        out = bin_df.mapInPandas(parse_batches, _SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _webm_oracle() -> str:
    rows = []
    for (name, kw, _e), want in zip(_FIXTURES, _expected_rows()):
        got = {"file_name": name, **webm_meta(make_webm(**kw))}
        got.pop("muxer")
        if got != want:
            raise AssertionError(f"{name}: parsed {got!r} != expected {want!r}")

        def lit(v) -> str:
            if v is None:
                return "NULL"
            if isinstance(v, str):
                return f"'{v}'"
            return str(v)

        rows.append("(" + ", ".join(lit(want[c]) for c in _COLS) + ")")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(" + ", ".join(_COLS) + ")"
    )


WEBM_META_ORACLE_SQL = _webm_oracle()


# --- per-cluster SimpleBlock census (VERDICT r8 item 7) ----------------------
#
# Container-level block walk mirroring the h264_nal_census pattern: one
# row per Cluster with block counts, byte sizes, keyframe flags and the
# track/relative-timestamp spread - the indexing statistics a player or
# a streaming packager derives without touching codec payloads (no VP8/
# VP9 bool-coder gamble). Reference stores real video this way
# (s3-to-es_aws.py video originals); at 100 TB the census is the same
# 0-exchange binaryFile -> Arrow mapInPandas scan as every media entry.


def _parse_lacing(
    payload: bytes, flags: int, data0: int, d: int
) -> tuple[int, int]:
    """(n_frames, frame_bytes) for one SimpleBlock whose codec data
    spans [data0, d). Matroska §6.2.4.1 lacing: flag bits 0x06 select
    none/Xiph/fixed/EBML; a laced block leads with a frame-count byte
    and codes every frame size but the last - Xiph as 255-spill byte
    sums, EBML as an unsigned first size then SIGNED VINT deltas
    (value - (2^(7*len-1) - 1)), fixed-size as nothing (the payload
    must divide evenly). frame_bytes excludes the lace header."""
    mode = (flags >> 1) & 3
    if mode == 0:
        return 1, d - data0
    i = data0
    if i >= d:
        raise EBMLError("laced SimpleBlock missing frame count")
    nf = payload[i] + 1
    i += 1
    sizes: list[int] = []
    if mode == 1:  # Xiph
        for _ in range(nf - 1):
            s = 0
            while True:
                if i >= d:
                    raise EBMLError("truncated Xiph lace sizes")
                b = payload[i]
                i += 1
                s += b
                if b != 255:
                    break
            sizes.append(s)
    elif mode == 3:  # EBML
        if nf > 1:
            v, i2, unknown = _read_vint(payload, i, keep_marker=False)
            if unknown or i2 > d:
                raise EBMLError("corrupt EBML lace first size")
            sizes.append(v)
            i = i2
            for _ in range(nf - 2):
                v, i2, unknown = _read_vint(payload, i, keep_marker=False)
                if unknown or i2 > d:
                    raise EBMLError("corrupt EBML lace delta")
                delta = v - ((1 << (7 * (i2 - i) - 1)) - 1)
                sizes.append(sizes[-1] + delta)
                i = i2
    else:  # mode == 2: fixed-size
        rem = d - i
        if nf == 0 or rem % nf:
            raise EBMLError("fixed lacing payload does not divide")
        sizes = [rem // nf] * (nf - 1)
    last = (d - i) - sum(sizes)
    if last < 0 or any(s < 0 for s in sizes):
        raise EBMLError("lace sizes overrun the SimpleBlock")
    return nf, sum(sizes) + last


def _block_stats(
    payload: bytes, c: int, d: int
) -> tuple[int, int, int, int, int]:
    """(track, rel_ts, flags, n_frames, frame_bytes) for one
    Block/SimpleBlock payload spanning [c, d) - the shared §6.2.4
    framing: track VINT (size-style encoding), 16-bit signed BE
    relative timestamp, flags byte, lace header, codec data."""
    track, pos, unknown = _read_vint(payload, c, keep_marker=False)
    # the track VINT must end inside the element body with
    # >= 3 bytes left for rel-ts + flags; `pos + 3 > d`
    # also rejects a VINT that itself crossed d (pos > d)
    if unknown or pos + 3 > d:
        raise EBMLError("corrupt SimpleBlock framing")
    (rel,) = struct.unpack(">h", payload[pos : pos + 2])
    flags = payload[pos + 2]
    nf, frame_bytes = _parse_lacing(payload, flags, pos + 3, d)
    return track, rel, flags, nf, frame_bytes


def webm_block_census(payload: bytes) -> list[dict]:
    """One dict per Cluster: (cluster_idx, cluster_ts, n_blocks,
    n_keyframes, n_frames, n_laced, n_tracks, payload_bytes,
    block_bytes, min_rel_ts, max_rel_ts). SimpleBlock framing per
    Matroska §6.2.4: track VINT (size-style encoding), 16-bit signed
    BE relative timestamp, flags byte (bit 0x80 = keyframe, bits
    0x06 = lacing), then codec data - parsed here without decoding
    the data. r11: laced blocks report their true frame count and
    ``payload_bytes`` counts FRAME bytes (lace headers excluded), so
    the census matches what a demuxer would hand the codec; Blocks
    inside BlockGroups (the layout real muxers use when frames carry
    references) census identically, with keyframe-ness derived the
    spec's way - a group with NO ReferenceBlock is a keyframe - and
    ``block_bytes`` counting the Block element's payload (the group
    wrapper and its non-Block children are structure, not media)."""
    top = list(_walk(payload, 0, len(payload)))
    if not top or top[0][0] != _EBML:
        raise EBMLError("not an EBML stream (no EBML header)")
    segment = next(((a, b) for eid, a, b in top if eid == _SEGMENT), None)
    if segment is None:
        raise EBMLError("no Segment element")
    out: list[dict] = []
    idx = 0
    for eid, a, b in _walk(payload, segment[0], segment[1]):
        if eid != _CLUSTER:
            continue
        ts = 0
        n_blocks = n_key = n_frames = n_laced = 0
        payload_bytes = block_bytes = 0
        tracks: set[int] = set()
        min_rel: int | None = None
        max_rel: int | None = None
        for e2, c, d in _walk(payload, a, b):
            if e2 == _CLUSTER_TIMESTAMP:
                ts = _as_uint(payload, c, d)
            elif e2 in (_SIMPLE_BLOCK, _BLOCK_GROUP):
                if e2 == _BLOCK_GROUP:
                    blk_span = None
                    has_ref = False
                    for e3, g, hh in _walk(payload, c, d):
                        if e3 == _BLOCK:
                            blk_span = (g, hh)
                        elif e3 == _REFERENCE_BLOCK:
                            has_ref = True
                    if blk_span is None:
                        raise EBMLError("BlockGroup without a Block")
                    bc, bd = blk_span
                    track, rel, flags, nf, frame_bytes = _block_stats(
                        payload, bc, bd
                    )
                    # §6.2.3: keyframe iff the group has no
                    # ReferenceBlock (Block has no keyframe flag bit)
                    is_key = not has_ref
                else:
                    bc, bd = c, d
                    track, rel, flags, nf, frame_bytes = _block_stats(
                        payload, c, d
                    )
                    is_key = (flags & 0x80) != 0
                n_blocks += 1
                n_key += is_key
                n_frames += nf
                n_laced += (flags & 0x06) != 0
                tracks.add(track)
                block_bytes += bd - bc
                payload_bytes += frame_bytes
                min_rel = rel if min_rel is None else min(min_rel, rel)
                max_rel = rel if max_rel is None else max(max_rel, rel)
        out.append(
            {
                "cluster_idx": idx,
                "cluster_ts": ts,
                "n_blocks": n_blocks,
                "n_keyframes": n_key,
                "n_frames": n_frames,
                "n_laced": n_laced,
                "n_tracks": len(tracks),
                "payload_bytes": payload_bytes,
                "block_bytes": block_bytes,
                "min_rel_ts": 0 if min_rel is None else min_rel,
                "max_rel_ts": 0 if max_rel is None else max_rel,
            }
        )
        idx += 1
    return out


#: census fixture family: keyframe cadence and track cycling vary per
#: file; expected rows derive from CONSTRUCTION args, never the parser
_CENSUS_FIXTURES: list[tuple[str, dict]] = [
    ("c_all_key.webm", {"n_clusters": 2, "blocks_per_cluster": 3,
                        "block_size": 25, "seed": 3}),
    ("c_gop2.webm", {"n_clusters": 3, "blocks_per_cluster": 4,
                     "block_size": 31, "keyframe_every": 2, "seed": 7,
                     "duration_units": 6000}),
    ("c_gop3_cycle.webm", {"n_clusters": 2, "blocks_per_cluster": 6,
                           "block_size": 18, "keyframe_every": 3,
                           "cycle_tracks": True, "seed": 11}),
    ("c_video_only.webm", {"video_codec": "V_AV1", "audio_codec": None,
                           "n_clusters": 4, "blocks_per_cluster": 2,
                           "block_size": 52, "keyframe_every": 2,
                           "cycle_tracks": True, "seed": 19,
                           "duration_units": 8000}),
    ("c_live.webm", {"unknown_size_segment": True,
                     "duration_units": None, "n_clusters": 3,
                     "blocks_per_cluster": 5, "block_size": 9,
                     "keyframe_every": 5, "cycle_tracks": True,
                     "seed": 23}),
    # r11 lacing family: Xiph (incl. a 255-spill size), EBML with
    # positive AND negative signed deltas, and fixed-size
    ("c_xiph_lace.webm", {"lacing": "xiph", "frames_per_block": 3,
                          "n_clusters": 2, "blocks_per_cluster": 2,
                          "block_size": 21, "keyframe_every": 2,
                          "seed": 29}),
    ("c_xiph_spill.webm", {"lacing": "xiph", "frames_per_block": 2,
                           "n_clusters": 1, "blocks_per_cluster": 2,
                           "block_size": 300, "seed": 31,
                           "duration_units": 2000}),
    ("c_ebml_lace.webm", {"lacing": "ebml", "frames_per_block": 5,
                          "n_clusters": 2, "blocks_per_cluster": 3,
                          "block_size": 40, "cycle_tracks": True,
                          "seed": 37}),
    ("c_fixed_lace.webm", {"lacing": "fixed", "frames_per_block": 4,
                           "n_clusters": 2, "blocks_per_cluster": 2,
                           "block_size": 17, "keyframe_every": 2,
                           "seed": 41}),
    # r11 BlockGroup family: keyframes via ReferenceBlock ABSENCE
    # (no 0x80 bit on Block), alone and combined with EBML lacing
    ("c_blockgroups.webm", {"block_groups": True, "keyframe_every": 3,
                            "blocks_per_cluster": 4, "block_size": 23,
                            "n_clusters": 2, "seed": 43}),
    ("c_group_lace.webm", {"block_groups": True, "lacing": "ebml",
                           "frames_per_block": 3,
                           "blocks_per_cluster": 2, "block_size": 30,
                           "n_clusters": 2, "keyframe_every": 2,
                           "cycle_tracks": True, "seed": 47}),
]

_CENSUS_COLS = [
    "file_name", "cluster_idx", "cluster_ts", "n_blocks", "n_keyframes",
    "n_frames", "n_laced", "n_tracks", "payload_bytes", "block_bytes",
    "min_rel_ts", "max_rel_ts",
]

_CENSUS_SCHEMA = (
    "file_name string, cluster_idx int, cluster_ts bigint, n_blocks int, "
    "n_keyframes int, n_frames int, n_laced int, n_tracks int, "
    "payload_bytes bigint, block_bytes bigint, min_rel_ts int, "
    "max_rel_ts int"
)


def _census_expected() -> list[dict]:
    rows = []
    for name, kw in _CENSUS_FIXTURES:
        args = dict(
            video_codec="V_VP9", audio_codec="A_OPUS", n_clusters=2,
            blocks_per_cluster=3, block_size=25, keyframe_every=1,
            cycle_tracks=False, duration_units=4000, lacing=None,
            frames_per_block=1,
        )
        args.update({k: v for k, v in kw.items() if k in args})
        bpc = args["blocks_per_cluster"]
        n_tracks_file = int(args["video_codec"] is not None) + int(
            args["audio_codec"] is not None
        )
        ke = args["keyframe_every"]
        n_key = len([b for b in range(bpc) if b % ke == 0])
        distinct_tracks = (
            len({1 + (b % n_tracks_file) for b in range(bpc)})
            if args["cycle_tracks"] and n_tracks_file
            else 1
        )
        span = (
            args["duration_units"] if args["duration_units"] is not None
            else 4000
        ) // max(args["n_clusters"], 1)
        # spec arithmetic for the laced layouts (construction args
        # only - the writer's size rules re-derived by hand): frame
        # bytes per block, lace header bytes per block
        lac, fpb, bs = args["lacing"], args["frames_per_block"], args["block_size"]
        if lac is None:
            frames_per_blk, frame_bytes, head_bytes = 1, bs, 0
        else:
            sizes = [bs] * fpb if lac == "fixed" else _lace_sizes(bs, fpb)
            frames_per_blk = fpb
            frame_bytes = sum(sizes)
            if lac == "xiph":
                head_bytes = 1 + sum(s // 255 + 1 for s in sizes[:-1])
            elif lac == "ebml":
                def _ulen(v):  # minimal marked-VINT width
                    n = 1
                    while v > (1 << (7 * n)) - 2:
                        n += 1
                    return n

                def _dlen(dv):  # minimal signed lace-delta width
                    n = 1
                    while abs(dv) > (1 << (7 * n - 1)) - 1:
                        n += 1
                    return n

                head_bytes = 1 if len(sizes) == 1 else (
                    1 + _ulen(sizes[0]) + sum(
                        _dlen(sizes[i] - sizes[i - 1])
                        for i in range(1, len(sizes) - 1)
                    )
                )
            else:  # fixed
                head_bytes = 1
        for ci in range(args["n_clusters"]):
            rows.append(
                {
                    "file_name": name,
                    "cluster_idx": ci,
                    "cluster_ts": ci * span,
                    "n_blocks": bpc,
                    "n_keyframes": n_key,
                    "n_frames": bpc * frames_per_blk,
                    "n_laced": bpc if lac is not None else 0,
                    "n_tracks": distinct_tracks,
                    "payload_bytes": bpc * frame_bytes,
                    # element size = frame bytes + lace header + 1
                    # track VINT + 2 rel-ts + 1 flags
                    "block_bytes": bpc * (frame_bytes + head_bytes + 4),
                    "min_rel_ts": 0,
                    "max_rel_ts": 7 * (bpc - 1),
                }
            )
    return rows


def webm_block_census_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: staged census store -> binaryFile ->
    mapInPandas -> one row per (file, cluster). Zero-shuffle scan,
    payloads never leave the executor."""
    work = tempfile.mkdtemp(prefix="webm_census_")
    try:
        for name, kw in _CENSUS_FIXTURES:
            with open(os.path.join(work, name), "wb") as f:
                f.write(make_webm(**kw))
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("content").alias("payload"),
        )

        def parse_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = [
                    {"file_name": name, **row}
                    for name, p in zip(pdf["file_name"], pdf["payload"])
                    for row in webm_block_census(bytes(p))
                ]
                yield pd.DataFrame(out)[_CENSUS_COLS]

        out = bin_df.mapInPandas(parse_batches, _CENSUS_SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _census_oracle() -> str:
    by_key = {}
    for name, kw in _CENSUS_FIXTURES:
        for row in webm_block_census(make_webm(**kw)):
            by_key[(name, row["cluster_idx"])] = {"file_name": name, **row}
    rows = []
    for want in _census_expected():
        got = by_key.get((want["file_name"], want["cluster_idx"]))
        if got != want:
            raise AssertionError(
                f"{want['file_name']}#{want['cluster_idx']}: parsed "
                f"{got!r} != expected {want!r}"
            )
        rows.append(
            "("
            + ", ".join(
                f"'{want[c]}'" if isinstance(want[c], str) else str(want[c])
                for c in _CENSUS_COLS
            )
            + ")"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(" + ", ".join(_CENSUS_COLS) + ")"
    )


WEBM_BLOCK_CENSUS_ORACLE_SQL = _census_oracle()
