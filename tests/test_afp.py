"""audio_fingerprint_dedup: AFP twins, gain invariance, end-to-end."""

from __future__ import annotations

import numpy as np

from data_pipeline_capstone_project_spark.operators.afp import (
    FRAME_LEN,
    FRAMES,
    HAMMING_T,
    N_SAMPLES,
    _afp_scalar,
    _alaw_expand,
    _bands_of,
    _encode,
    _fixture_specs,
    _scalar_fp,
    afp64,
    audio_fingerprint_dedup_query,
    audio_fingerprint_oracle,
)
from data_pipeline_capstone_project_spark.operators.audio import (
    _ALAW_TABLE,
    wav_pcm,
)


def _signed(uh: int) -> int:
    return uh - (1 << 64) if uh >= (1 << 63) else uh


def test_twins_agree_on_every_fixture():
    """numpy-from-decoded-bytes == pure-python-from-formula, across
    all five encode paths (pcm16, pcm24, extensible, float32,
    a-law)."""
    from data_pipeline_capstone_project_spark.operators.flac import (
        flac_pcm,
    )

    from data_pipeline_capstone_project_spark.operators.mp3_l3 import (
        CODEC_DELAY,
        decode_mp3,
    )

    for name, fn, enc in _fixture_specs():
        raw = _encode(fn, enc)
        if enc == "mp3":
            pcm = decode_mp3(raw)[CODEC_DELAY : CODEC_DELAY + N_SAMPLES]
        elif enc == "mp3tag":  # ID3-wrapped: strip, then as "mp3"
            from data_pipeline_capstone_project_spark.operators.mp3 import (
                strip_id3,
            )

            pcm = decode_mp3(strip_id3(raw))[
                CODEC_DELAY : CODEC_DELAY + N_SAMPLES
            ]
        elif enc in ("mp3sr", "mp3is"):  # stereo transcodes: channel 0
            pcm = decode_mp3(raw)[
                CODEC_DELAY : CODEC_DELAY + N_SAMPLES, 0
            ]
        elif enc == "mp3scfsi":  # scalefactor-reuse layout, mono
            pcm = decode_mp3(raw)[CODEC_DELAY : CODEC_DELAY + N_SAMPLES]
        else:
            pcm = (flac_pcm(raw) if raw[:4] == b"fLaC" else wav_pcm(raw))[
                :, 0
            ]
        assert afp64(pcm) == _signed(_scalar_fp(name, fn, enc)), name


def test_afp_gain_invariance_random():
    """Positive integer gain never changes the fingerprint (the
    defining AFP property) - random signals, exact arithmetic."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        s = rng.integers(-8000, 8000, size=N_SAMPLES, dtype=np.int64)
        g = int(rng.integers(2, 200))
        assert afp64(s) == afp64(g * s)


def test_afp_detects_content_change():
    rng = np.random.default_rng(11)
    s = rng.integers(-8000, 8000, size=N_SAMPLES, dtype=np.int64)
    edited = s.copy()
    edited[: N_SAMPLES // 2] = rng.integers(
        -8000, 8000, size=N_SAMPLES // 2, dtype=np.int64
    )
    assert afp64(s) != afp64(edited)


def test_splice_confined_to_band0():
    """A one-frame edit flips bits only in frame-pairs 2..3 - all
    inside band 0 - so bands 1..3 stay identical (the LSH recall
    guarantee the fixtures rely on)."""
    rng = np.random.default_rng(13)
    s = rng.integers(-8000, 8000, size=N_SAMPLES, dtype=np.int64)
    edited = s.copy()
    edited[3 * FRAME_LEN : 4 * FRAME_LEN] = rng.integers(
        -8000, 8000, size=FRAME_LEN, dtype=np.int64
    )

    def u(h: int) -> int:
        return h + (1 << 64) if h < 0 else h

    ba, bb = _bands_of(u(afp64(s))), _bands_of(u(afp64(edited)))
    assert ba[1:] == bb[1:]


def test_alaw_twin_matches_production_table():
    """The oracle's independent from-the-spec a-law expansion equals
    the production table on all 256 bytes."""
    assert [_alaw_expand(b) for b in range(256)] == list(_ALAW_TABLE)


def test_oracle_has_every_verdict_class():
    sql = audio_fingerprint_oracle()
    assert ", 0, true)" in sql  # gain / bit-depth / container dups
    assert ", 1, true)" in sql  # the splice near-dup
    assert "false)" in sql  # band-sharing pair rejected by verify
    assert "t2_loud_hires" in sql  # gain+remaster combined still H=0


def test_end_to_end_matches_oracle(spark, sf_dir):
    import duckdb

    out = audio_fingerprint_dedup_query(spark, sf_dir).toPandas()
    exp = duckdb.sql(audio_fingerprint_oracle()).df()
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df[["clip_a", "clip_b", "hamming", "dup"]].itertuples(index=False))
    )
    assert key(out) == key(exp)
    assert (out["dup"] == (out["hamming"] <= HAMMING_T)).all()
