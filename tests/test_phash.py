"""image_phash_dedup: dHash twins, LSH banding, end-to-end verdicts."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_capstone_project_spark.operators.gif import gif_frames
from data_pipeline_capstone_project_spark.operators.images import (
    bmp_pixels,
    png_pixels,
)
from data_pipeline_capstone_project_spark.operators.phash import (
    HAMMING_T,
    PH_H,
    PH_W,
    _bands_of,
    _dhash_scalar,
    _encode,
    _fixture_specs,
    dhash64,
    image_phash_dedup_query,
    image_phash_oracle,
)


def _signed(uh: int) -> int:
    return uh - (1 << 64) if uh >= (1 << 63) else uh


def test_twins_agree_on_every_fixture():
    """numpy-from-decoded-bytes == pure-python-from-formula, across
    all five encode paths (truecolor/interlaced/gray PNG, 24-bit and
    RLE8 BMP)."""
    for name, fn, enc in _fixture_specs():
        raw = _encode(fn, enc)
        px = (
            bmp_pixels(raw) if raw[:2] == b"BM"
            else gif_frames(raw)[0]["rgb"] if raw[:3] == b"GIF"
            else png_pixels(raw)
        )
        assert dhash64(px) == _signed(_dhash_scalar(fn)), name


def test_dhash_brightness_invariance_random():
    """Uniform +d on every channel never changes the hash (the
    defining dHash property) - random textures, exact integer luma."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        px = rng.integers(0, 200, size=(PH_H, PH_W, 3), dtype=np.uint8)
        d = int(rng.integers(1, 40))
        assert dhash64(px) == dhash64(px + np.uint8(d))


def test_dhash_detects_content_change():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 200, size=(PH_H, PH_W, 3), dtype=np.uint8)
    edited = px.copy()
    edited[:16] = 255  # white top half
    assert dhash64(px) != dhash64(edited)


def test_bands_cover_the_hash():
    uh = 0xA5E4741B0EAE2ABF
    bands = _bands_of(uh)
    assert bands == [0xA5E4, 0x741B, 0x0EAE, 0x2ABF]
    rebuilt = 0
    for b in bands:
        rebuilt = (rebuilt << 16) | b
    assert rebuilt == uh


def test_oracle_has_every_verdict_class():
    sql = image_phash_oracle()
    assert ", 0, true)" in sql  # exact / brightness / format dups
    assert ", 3, true)" in sql  # the spot near-dup
    assert "false)" in sql  # band-sharing pair rejected by verify
    # the inverse checker never pairs with ANYTHING; the GIF re-encode
    # of the same checker pairs with the original at Hamming 0
    assert "c2_checker_inv" not in sql
    assert "('c1_checker.png', 'c3_gifcopy.gif', 0, true)" in sql


def test_end_to_end_matches_oracle(spark, sf_dir):
    import duckdb

    out = image_phash_dedup_query(spark, sf_dir).toPandas()
    exp = duckdb.sql(image_phash_oracle()).df()
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df[["img_a", "img_b", "hamming", "dup"]].itertuples(index=False))
    )
    assert key(out) == key(exp)
    # at threshold, every hamming<=T row is dup and vice versa
    assert (out["dup"] == (out["hamming"] <= HAMMING_T)).all()
