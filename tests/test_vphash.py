"""video_phash_dedup: decode+hash twins, codec-level dup classes."""

from __future__ import annotations

import numpy as np

from data_pipeline_capstone_project_spark.operators.h264_decode import (
    build_fixture_mp4,
    decode_frames,
    simulate_stream,
)
from data_pipeline_capstone_project_spark.operators.phash import (
    HAMMING_T,
    PH_H,
    PH_W,
    _dhash_scalar,
)
from data_pipeline_capstone_project_spark.operators.vphash import (
    _full_spec,
    _sim_fingerprint,
    _uniform_lres,
    video_dhash,
    video_fixture_specs,
    video_phash_dedup_query,
    video_phash_oracle,
)


def _signed(uh: int) -> int:
    return uh - (1 << 64) if uh >= (1 << 63) else uh


def test_twins_agree_on_every_fixture():
    """bit-level decode + numpy hash == plane simulator + scalar hash
    on every video, incl. the P-frame variants."""
    for spec in video_fixture_specs():
        frames = decode_frames(build_fixture_mp4(_full_spec(spec)))
        got = video_dhash(frames[-1]["luma"])
        assert got == _signed(_sim_fingerprint(spec)), spec["name"]


def test_display_crop_is_the_hash_geometry():
    spec = _full_spec(video_fixture_specs()[0])
    frame = decode_frames(build_fixture_mp4(spec))[0]
    assert frame["luma"].shape == (PH_H, PH_W)


def test_uniform_residual_is_exactly_uniform():
    """The brightness variant's P frame adds the SAME constant to
    every pixel - the codec-level property the Hamming-0 class rests
    on (QP 28, lone DC level 2 -> +8)."""
    specs = {s["name"]: s for s in video_fixture_specs()}
    base = simulate_stream(_full_spec(specs["a1_base.mp4"]))[-1][0]
    bright = simulate_stream(_full_spec(specs["a3_bright.mp4"]))[-1][0]
    delta = bright.astype(int) - base.astype(int)
    assert np.unique(delta).tolist() == [8]


def test_uniform_lres_is_dc_only():
    lres = _uniform_lres()
    assert set(lres) == set(range(16))
    assert all(v[1:] == [0] * 15 for v in lres.values())


def test_gray_stack_passthrough():
    """Integer Rec.601 luma of (v,v,v) is exactly v, so video_dhash
    hashes the luma plane itself."""
    rng = np.random.default_rng(5)
    luma = rng.integers(0, 256, size=(PH_H, PH_W), dtype=np.uint8)
    fn = lambda x, y: (int(luma[y, x]),) * 3  # noqa: E731
    assert video_dhash(luma) == _signed(_dhash_scalar(fn))


def test_oracle_has_every_verdict_class():
    sql = video_phash_oracle()
    assert ", 0, true)" in sql  # remux + codec-brightness dups
    assert ", 1, true)" in sql  # the one-cell P-residual spot
    assert "false)" in sql  # heavy edit: candidate, verify-rejected
    assert "a2_remux" in sql and "b2_bright" in sql


def test_end_to_end_matches_oracle(spark, sf_dir):
    import duckdb

    out = video_phash_dedup_query(spark, sf_dir).toPandas()
    exp = duckdb.sql(video_phash_oracle()).df()
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df[["vid_a", "vid_b", "hamming", "dup"]].itertuples(index=False))
    )
    assert key(out) == key(exp)
    assert (out["dup"] == (out["hamming"] <= HAMMING_T)).all()


# --- video_scene_cuts ----------------------------------------------------


def test_scene_cut_twins_agree():
    """Per-frame fingerprints from bit-decode+numpy == simulator+
    scalar, on every scene fixture."""
    from data_pipeline_capstone_project_spark.operators.vphash import (
        _cut_stats,
        scene_fixture_specs,
    )

    for spec in scene_fixture_specs():
        frames = decode_frames(build_fixture_mp4(_full_spec(spec)))
        sims = simulate_stream(_full_spec(spec))
        got = [video_dhash(f["luma"]) for f in frames]
        want = []
        for lu, _cb, _cr in sims:
            plane = lu[:PH_H, :PH_W]
            want.append(
                _signed(_dhash_scalar(lambda x, y: (int(plane[y, x]),) * 3))
            )
        assert got == want, spec["name"]
        assert _cut_stats(got) == _cut_stats(want)


def test_scene_cut_shot_structure():
    from data_pipeline_capstone_project_spark.operators.vphash import (
        video_scene_cuts_oracle,
    )
    import duckdb

    df = duckdb.sql(video_scene_cuts_oracle()).df().set_index("vid_name")
    assert df.loc["m1_shotchange.mp4", "n_cuts"] == 1
    assert df.loc["m4_slideshow.mp4", "n_cuts"] == 3
    assert df.loc["m5_graded.mp4", "n_cuts"] == 0
    assert df.loc["m5_graded.mp4", "max_hamming"] == 1


def test_scene_cuts_end_to_end(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.vphash import (
        video_scene_cuts_oracle,
        video_scene_cuts_query,
    )
    import duckdb

    out = video_scene_cuts_query(spark, sf_dir).toPandas()
    exp = duckdb.sql(video_scene_cuts_oracle()).df()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))  # noqa: E731
    assert key(out) == key(exp)
