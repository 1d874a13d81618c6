"""SRT / WebVTT subtitle parsing and caption-frame alignment.

Reference parity: the reference pipeline ingests Instagram video
posts with their caption text side by side (s3Posts-to-ES-lambda
indexes media + caption into ES); the timed-text generalization of
that pairing is the subtitle track, and a video-text training
pipeline needs (a) the cue parse and (b) the cue<->frame time
alignment that turns (video, captions) into (frame span, text) pairs.

Two registry entries:

* ``subtitle_parse`` - per-file cue statistics over a staged store of
  deterministic ``.srt`` / ``.vtt`` fixtures: cue count, speech span,
  overlap count, gap structure, text volume. Parsers are written from
  the published formats (SubRip's de-facto grammar; WebVTT, W3C TR):
  SRT ``HH:MM:SS,mmm`` commas vs VTT ``HH:MM:SS.mmm`` dots with
  optional hours, VTT header/NOTE/STYLE blocks, cue identifiers, cue
  settings after the arrow, styling-tag stripping for text metrics,
  BOM and CRLF tolerance.
* ``caption_frame_align`` - Spark-side interval join: sampled frame
  timestamps (the `frame_sample` shape) against cue windows
  ``[start_ms, end_ms)`` with the video id as the EQUI key and the
  range as a post-join residual, then a per-cue aggregate. Same plan
  discipline as `interval_join`: the equi key keeps Catalyst on a
  hash/sort-merge join (no BroadcastNestedLoopJoin); a corpus with no
  usable equi key would first bin timestamps to bucket keys. The
  DuckDB oracle re-runs the JOIN ITSELF over VALUES literals of the
  hand-authored cue tuples and generated frame grid, so the Spark
  join semantics - not just the row shapes - are what is gated.

Fixture cues are HAND-AUTHORED tuples rendered to SRT/VTT text by the
writers below; the parsers must recover the tuples exactly (asserted
at oracle-build time and in tests), so writer and parser cross-check
each other and all expected values derive from the tuples by plain
arithmetic, never from the parsers.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SubtitleError(ValueError):
    """Malformed SRT/VTT input."""


# --- timestamp helpers -------------------------------------------------------


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


_TS_RE = re.compile(r"^(?:(\d{1,2}):)?(\d{2}):(\d{2})([.,])(\d{3})$")


def _parse_ts(tok: str, sep: str) -> int:
    m = _TS_RE.match(tok)
    if not m or m.group(4) != sep:
        raise SubtitleError(f"bad timestamp {tok!r}")
    h = int(m.group(1) or 0)
    mm, ss, frac = int(m.group(2)), int(m.group(3)), int(m.group(5))
    if mm > 59 or ss > 59:
        raise SubtitleError(f"minutes/seconds out of range in {tok!r}")
    return ((h * 60 + mm) * 60 + ss) * 1000 + frac


_TAG_RE = re.compile(r"<[^>]*>")


# --- SRT ----------------------------------------------------------------------


def make_srt(cues: list[tuple[int, int, str]], crlf: bool = False,
             bom: bool = False) -> str:
    """Render (start_ms, end_ms, text) cues as SubRip text. ``text``
    may contain embedded newlines (multi-line cues)."""
    blocks = [
        f"{i}\n{_fmt_ts(a, ',')} --> {_fmt_ts(b, ',')}\n{text}"
        for i, (a, b, text) in enumerate(cues, start=1)
    ]
    out = "\n\n".join(blocks) + "\n"
    if crlf:
        out = out.replace("\n", "\r\n")
    return ("﻿" if bom else "") + out


def parse_srt(text: str) -> list[tuple[int, int, str]]:
    """SubRip text -> [(start_ms, end_ms, cue text)]. Indices are
    validated to be ascending integers; blank lines separate cues."""
    text = text.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    cues: list[tuple[int, int, str]] = []
    blocks = [b for b in re.split(r"\n\n+", text.strip("\n")) if b.strip()]
    for b in blocks:
        lines = b.split("\n")
        if len(lines) < 2:
            raise SubtitleError(f"cue block too short: {b!r}")
        head = lines[0].strip()
        # str.isdigit() accepts non-ASCII digits like '¹' that int() rejects;
        # the contract is SubtitleError on any junk, so gate on ASCII digits.
        if not (head.isascii() and head.isdigit()):
            raise SubtitleError(f"missing cue index: {lines[0]!r}")
        idx = int(head)
        if idx != len(cues) + 1:
            raise SubtitleError(f"cue index {idx} out of order")
        parts = lines[1].split()
        if len(parts) < 3 or parts[1] != "-->":
            raise SubtitleError(f"bad timing line: {lines[1]!r}")
        a, b_ = _parse_ts(parts[0], ","), _parse_ts(parts[2], ",")
        if b_ <= a:
            raise SubtitleError(f"cue {idx}: end {b_} <= start {a}")
        cues.append((a, b_, "\n".join(lines[2:])))
    return cues


# --- WebVTT -------------------------------------------------------------------


def make_vtt(cues: list[tuple[int, int, str]], note: str | None = None,
             idents: bool = False, settings: str | None = None,
             short_ts: bool = False) -> str:
    """Render cues as WebVTT: header, optional NOTE block, optional
    cue identifiers, optional cue settings after the arrow;
    ``short_ts`` uses the hour-less MM:SS.mmm form (legal when
    start < 1 h)."""

    def ts(ms: int) -> str:
        full = _fmt_ts(ms, ".")
        return full[3:] if short_ts and ms < 3_600_000 else full

    blocks = []
    for i, (a, b, text) in enumerate(cues, start=1):
        head = f"cue-{i}\n" if idents else ""
        tail = f" {settings}" if settings else ""
        blocks.append(f"{head}{ts(a)} --> {ts(b)}{tail}\n{text}")
    body = "\n\n".join(blocks)
    note_block = f"\nNOTE\n{note}\n" if note else ""
    return f"WEBVTT\n{note_block}\n{body}\n"


def parse_vtt(text: str) -> list[tuple[int, int, str]]:
    """WebVTT text -> [(start_ms, end_ms, cue text)]. NOTE/STYLE/
    REGION blocks are skipped; cue identifiers and cue settings are
    accepted and dropped; timestamps accept both H:MM:SS.mmm and
    MM:SS.mmm forms per the W3C grammar."""
    text = text.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    if not text.startswith("WEBVTT"):
        raise SubtitleError("missing WEBVTT header")
    blocks = [b for b in re.split(r"\n\n+", text.strip("\n")) if b.strip()]
    cues: list[tuple[int, int, str]] = []
    for b in blocks[0 if "\n" in blocks[0] and "-->" in blocks[0] else 1:]:
        lines = b.split("\n")
        if lines[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        ti = 0 if "-->" in lines[0] else 1
        if ti >= len(lines) or "-->" not in lines[ti]:
            raise SubtitleError(f"cue without timing line: {b!r}")
        parts = lines[ti].split()
        if len(parts) < 3 or parts[1] != "-->":
            raise SubtitleError(f"bad timing line: {lines[ti]!r}")
        a, b_ = _parse_ts(parts[0], "."), _parse_ts(parts[2], ".")
        if b_ <= a:
            raise SubtitleError(f"cue end {b_} <= start {a}")
        cues.append((a, b_, "\n".join(lines[ti + 1:])))
    return cues


# --- per-file statistics ------------------------------------------------------


def cue_stats(cues: list[tuple[int, int, str]]) -> dict:
    """Plain arithmetic over cue tuples (shared by the parser path and
    the expected-value path - the DATA reaching it differs: parsed
    bytes vs hand-authored tuples)."""
    n = len(cues)
    total = sum(b - a for a, b, _ in cues)
    span = max(b for _, b, _ in cues) - min(a for a, _, _ in cues) if n else 0
    overlaps = sum(
        1 for (_, b1, _), (a2, _, _) in zip(cues, cues[1:]) if a2 < b1
    )
    gaps = [a2 - b1 for (_, b1, _), (a2, _, _) in zip(cues, cues[1:])]
    clean = [_TAG_RE.sub("", t) for _, _, t in cues]
    return {
        "n_cues": n,
        "speech_ms": total,
        "span_ms": span,
        "n_overlaps": overlaps,
        "max_gap_ms": max([g for g in gaps if g > 0], default=0),
        "chars": sum(len(t.replace("\n", " ")) for t in clean),
        "words": sum(len(t.split()) for t in clean),
    }


# --- fixtures ------------------------------------------------------------------

#: Hand-authored cue tables per video. Texts include multi-line cues
#: and VTT styling tags (stripped for char/word metrics).
_CUE_TABLES: dict[str, list[tuple[int, int, str]]] = {
    "vid0": [
        (0, 2000, "hello world"),
        (2500, 4500, "two lines\nof caption"),
        (5000, 9000, "a longer closing remark"),
    ],
    "vid1": [
        (1000, 3000, "<i>styled</i> opening"),
        (2500, 6000, "overlapping cue"),  # overlaps the previous
        (6000, 6400, "tail"),
    ],
    "vid2": [
        (0, 1200, "uno"),
        (10_000, 12_000, "big gap before this"),
        (12_000, 15_500, "dos tres"),
        (15_500, 61_000, "minute-crossing cue"),
    ],
    "vid3": [
        (3_599_000, 3_601_000, "hour boundary"),
        (3_605_000, 3_612_345, "past the hour"),
    ],
}

#: (file name, video id, format, writer kwargs, parser). Formats per
#: video: vid0 ships as BOTH srt and vtt (cross-format agreement),
#: vid1 SRT with CRLF+BOM, vid2 VTT with NOTE + idents + settings +
#: hour-less timestamps, vid3 VTT with full timestamps.
_SUB_FILES: list[tuple[str, str, str, dict]] = [
    ("vid0.srt", "vid0", "srt", {}),
    ("vid0.vtt", "vid0", "vtt", {}),
    ("vid1.srt", "vid1", "srt", {"crlf": True, "bom": True}),
    ("vid2.vtt", "vid2", "vtt",
     {"note": "auto-generated captions", "idents": True,
      "settings": "line:0 position:50%", "short_ts": True}),
    ("vid3.vtt", "vid3", "vtt", {}),
]


def _render(fmt: str, cues, kw: dict) -> str:
    return make_srt(cues, **kw) if fmt == "srt" else make_vtt(cues, **kw)


def parse_subtitles(name: str, text: str) -> list[tuple[int, int, str]]:
    if name.endswith(".srt"):
        return parse_srt(text)
    if name.endswith(".vtt"):
        return parse_vtt(text)
    raise SubtitleError(f"unknown subtitle extension: {name}")


def _stage_subtitle_store(root: str) -> None:
    for name, vid, fmt, kw in _SUB_FILES:
        with open(os.path.join(root, name), "w", encoding="utf-8") as f:
            f.write(_render(fmt, _CUE_TABLES[vid], kw))


_STATS_COLS = [
    "file_name", "video_id", "format", "n_cues", "speech_ms", "span_ms",
    "n_overlaps", "max_gap_ms", "chars", "words",
]

_STATS_SCHEMA = (
    "file_name string, video_id string, format string, n_cues int, "
    "speech_ms bigint, span_ms bigint, n_overlaps int, max_gap_ms bigint, "
    "chars int, words int"
)


def subtitle_parse_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: staged .srt/.vtt store -> binaryFile ->
    mapInPandas parse -> one stats row per file. Zero-shuffle scan,
    same shape as every media-store entry."""
    work = tempfile.mkdtemp(prefix="subs_store_")
    try:
        _stage_subtitle_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("content").alias("payload"),
        )

        def parse_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for name, p in zip(pdf["file_name"], pdf["payload"]):
                    cues = parse_subtitles(name, bytes(p).decode("utf-8"))
                    out.append(
                        {
                            "file_name": name,
                            "video_id": name.rsplit(".", 1)[0],
                            "format": name.rsplit(".", 1)[1],
                            **cue_stats(cues),
                        }
                    )
                yield pd.DataFrame(out)[_STATS_COLS]

        out = bin_df.mapInPandas(parse_batches, _STATS_SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _subtitle_parse_oracle() -> str:
    rows = []
    for name, vid, fmt, kw in _SUB_FILES:
        cues = _CUE_TABLES[vid]
        parsed = parse_subtitles(name, _render(fmt, cues, kw))
        if parsed != cues:
            raise AssertionError(f"{name}: parse round-trip drifted")
        want = {"file_name": name, "video_id": vid, "format": fmt,
                **cue_stats(cues)}
        rows.append(
            "(" + ", ".join(
                f"'{want[c]}'" if isinstance(want[c], str) else str(want[c])
                for c in _STATS_COLS
            ) + ")"
        )
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS t(" + ", ".join(_STATS_COLS) + ")"
    )


SUBTITLE_PARSE_ORACLE_SQL = _subtitle_parse_oracle()


# --- caption-frame alignment ---------------------------------------------------

#: Deterministic frame-sampling grid per video: (period_ms, n_frames).
#: vid3's grid starts at its first cue's hour so the join has hits.
_FRAME_GRIDS: dict[str, tuple[int, int, int]] = {
    # (start_ms, period_ms, n_frames)
    "vid0": (0, 400, 30),
    "vid1": (0, 250, 32),
    "vid2": (0, 1000, 70),
    "vid3": (3_598_000, 500, 40),
}


def _frame_rows() -> list[tuple[str, int, int]]:
    return [
        (vid, i, start + i * period)
        for vid, (start, period, n) in _FRAME_GRIDS.items()
        for i in range(n)
    ]


def _cue_rows() -> list[tuple[str, int, int, int]]:
    return [
        (vid, idx, a, b)
        for vid, cues in _CUE_TABLES.items()
        for idx, (a, b, _t) in enumerate(cues, start=1)
    ]


_ALIGN_COLS = [
    "video_id", "cue_idx", "start_ms", "end_ms", "n_frames",
    "first_frame", "last_frame",
]


def caption_frame_align_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Align sampled frames to caption cues: frames with
    ``start_ms <= frame_ts < end_ms`` attach to the cue; per cue,
    count frames and record the first/last frame index (the span a
    vision-language pair extractor would cut). Cues that trap no
    frame survive with n_frames=0 (left join) - they are the audit
    trail for under-sampled speech.

    Scale shape: equi key (video_id) + range residual -> hash join,
    never a nested-loop; per-video frame and cue counts are bounded
    (seconds x fps and cue density), so residual fan-out is bounded
    per key. At corpus scale both sides partition by video_id and the
    join is shuffle-local; a keyless variant would bin frame_ts to
    cue-sized buckets first (see interval_join's docstring)."""
    cues = spark.createDataFrame(
        _cue_rows(), "video_id string, cue_idx int, start_ms long, end_ms long"
    )
    frames = spark.createDataFrame(
        _frame_rows(), "video_id string, frame_idx int, frame_ts long"
    )
    hits = cues.join(
        frames,
        (cues["video_id"] == frames["video_id"])
        & (frames["frame_ts"] >= cues["start_ms"])
        & (frames["frame_ts"] < cues["end_ms"]),
        "left",
    )
    return (
        hits.groupBy(
            cues["video_id"], "cue_idx", "start_ms", "end_ms"
        )
        .agg(
            F.count("frame_idx").alias("n_frames"),
            F.min("frame_idx").alias("first_frame"),
            F.max("frame_idx").alias("last_frame"),
        )
        .orderBy("video_id", "cue_idx")
    )


def _align_oracle() -> str:
    cue_vals = ", ".join(
        f"('{v}', {i}, {a}, {b})" for v, i, a, b in _cue_rows()
    )
    frame_vals = ", ".join(
        f"('{v}', {i}, {ts})" for v, i, ts in _frame_rows()
    )
    return f"""
WITH cues(video_id, cue_idx, start_ms, end_ms) AS (VALUES {cue_vals}),
     frames(video_id, frame_idx, frame_ts) AS (VALUES {frame_vals})
SELECT c.video_id, c.cue_idx, c.start_ms, c.end_ms,
       COUNT(f.frame_idx) AS n_frames,
       MIN(f.frame_idx) AS first_frame,
       MAX(f.frame_idx) AS last_frame
FROM cues c
LEFT JOIN frames f
  ON f.video_id = c.video_id
 AND f.frame_ts >= c.start_ms AND f.frame_ts < c.end_ms
GROUP BY c.video_id, c.cue_idx, c.start_ms, c.end_ms
ORDER BY c.video_id, c.cue_idx
"""


CAPTION_FRAME_ALIGN_ORACLE_SQL = _align_oracle()
