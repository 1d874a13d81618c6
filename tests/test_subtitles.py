"""SRT/WebVTT parsing: writer<->parser round-trips across format
quirks (CRLF, BOM, NOTE blocks, cue identifiers, settings, hour-less
timestamps), stats arithmetic, malformed-input hardening, and both
registry queries against their oracles - including the alignment
oracle's join being re-run by DuckDB, not just compared by rows."""

from __future__ import annotations

import duckdb
import pytest

# quick smoke lane (VERDICT r13 item 8): this file is part of the
# ~1-minute `-m quick` subset; the full suite stays the snapshot gate
pytestmark = pytest.mark.quick
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.subtitles import (
    _CUE_TABLES,
    _SUB_FILES,
    CAPTION_FRAME_ALIGN_ORACLE_SQL,
    SUBTITLE_PARSE_ORACLE_SQL,
    SubtitleError,
    _render,
    caption_frame_align_query,
    cue_stats,
    make_srt,
    make_vtt,
    parse_srt,
    parse_vtt,
    subtitle_parse_query,
)


@st.composite
def cue_lists(draw):
    n = draw(st.integers(1, 8))
    cues = []
    t = 0
    for _ in range(n):
        t += draw(st.integers(0, 5000))
        dur = draw(st.integers(1, 8000))
        text = draw(
            st.text(
                st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"),
                    whitelist_characters=" ",
                ),
                min_size=1,
                max_size=30,
            ).map(str.strip).filter(bool)
        )
        cues.append((t, t + dur, text))
        t += dur
    return cues


@settings(max_examples=80, deadline=None)
@given(cue_lists(), st.booleans(), st.booleans())
def test_srt_roundtrip(cues, crlf, bom):
    assert parse_srt(make_srt(cues, crlf=crlf, bom=bom)) == cues


@settings(max_examples=80, deadline=None)
@given(cue_lists(), st.booleans(), st.booleans())
def test_vtt_roundtrip(cues, idents, short):
    rendered = make_vtt(cues, idents=idents, short_ts=short,
                        note="n" if idents else None)
    assert parse_vtt(rendered) == cues


def test_fixture_roundtrips_exact():
    for name, vid, fmt, kw in _SUB_FILES:
        parser = parse_srt if fmt == "srt" else parse_vtt
        assert parser(_render(fmt, _CUE_TABLES[vid], kw)) == _CUE_TABLES[vid], name


def test_multiline_cue_survives():
    cues = [(0, 1000, "line one\nline two\nline three")]
    assert parse_srt(make_srt(cues)) == cues
    assert parse_vtt(make_vtt(cues)) == cues


def test_stats_tag_stripping_and_overlaps():
    s = cue_stats([(0, 1000, "<b>two words</b>"), (500, 900, "x")])
    assert s["chars"] == 9 + 1
    assert s["words"] == 3
    assert s["n_overlaps"] == 1
    assert s["speech_ms"] == 1400


def test_malformed_srt_rejected():
    with pytest.raises(SubtitleError, match="out of order"):
        parse_srt("2\n00:00:00,000 --> 00:00:01,000\nx\n")
    with pytest.raises(SubtitleError, match="bad timing"):
        parse_srt("1\n00:00:00,000 -> 00:00:01,000\nx\n")
    with pytest.raises(SubtitleError, match="bad timestamp"):
        parse_srt("1\n00:00:00.000 --> 00:00:01,000\nx\n")  # dot in SRT
    with pytest.raises(SubtitleError, match="end .* <= start"):
        parse_srt("1\n00:00:02,000 --> 00:00:01,000\nx\n")
    with pytest.raises(SubtitleError, match="out of range"):
        parse_srt("1\n00:77:00,000 --> 00:78:01,000\nx\n")


def test_unicode_digit_index_rejected():
    # '¹'.isdigit() is True but int('¹') raises; must be SubtitleError,
    # not a leaked ValueError (hypothesis-found regression, round 12).
    with pytest.raises(SubtitleError, match="missing cue index"):
        parse_srt("¹\n0")
    with pytest.raises(SubtitleError, match="missing cue index"):
        parse_srt("١\n00:00:00,000 --> 00:00:01,000\nx\n")


def test_malformed_vtt_rejected():
    with pytest.raises(SubtitleError, match="WEBVTT"):
        parse_vtt("1\n00:00:00.000 --> 00:00:01.000\nx\n")
    with pytest.raises(SubtitleError, match="bad timestamp"):
        parse_vtt("WEBVTT\n\n00:00:00,000 --> 00:00:01.000\nx\n")  # comma


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=200))
def test_fuzz_controlled_errors(junk):
    for parser in (parse_srt, parse_vtt):
        try:
            parser(junk)
        except SubtitleError:
            pass


def test_subtitle_parse_query_matches_oracle(spark, sf_dir):
    import pandas as pd

    got = subtitle_parse_query(spark, sf_dir).toPandas()
    want = duckdb.sql(SUBTITLE_PARSE_ORACLE_SQL).df()
    got = got.sort_values("file_name").reset_index(drop=True)
    want = want.sort_values("file_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("object"), want.astype("object"), check_dtype=False
    )


def test_caption_frame_align_matches_oracle_join(spark, sf_dir):
    import pandas as pd

    got = caption_frame_align_query(spark, sf_dir).toPandas()
    want = duckdb.sql(CAPTION_FRAME_ALIGN_ORACLE_SQL).df()
    pd.testing.assert_frame_equal(
        got.astype("object"), want.astype("object"), check_dtype=False
    )


def test_caption_frame_align_plan_is_hash_join_not_nlj(spark, sf_dir):
    plan = caption_frame_align_query(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_zero_frame_cues_survive_left_join(spark, sf_dir):
    df = caption_frame_align_query(spark, sf_dir).toPandas()
    row = df[(df.video_id == "vid2") & (df.cue_idx == 4)].iloc[0]
    # vid2 grid is 1s-period frames 0..69s; cue 4 spans 15.5s..61s
    assert row["n_frames"] == 45
    zero = df[df["n_frames"] == 0]
    assert (zero["first_frame"].isna()).all()
