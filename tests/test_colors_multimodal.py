from __future__ import annotations

import json
import re

from data_pipeline_capstone_project_spark.operators.colors import color_palette_query
from data_pipeline_capstone_project_spark.operators.multimodal import (
    multimodal_meta_query,
)

HEX_RE = re.compile(r"^#[0-9a-f]{6}$")


def test_color_palette_properties(spark, sf_dir):
    """Shape contract from the reference's data dictionary
    (README.md:280-325): 6 colors, percentages sum ~1, hex matches
    the rgb components."""
    rows = color_palette_query(spark, sf_dir).collect()
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("user_id < 20")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(rows) == n_users
    for r in rows:
        colors = json.loads(r["colors"])
        assert len(colors) == 6
        assert abs(sum(c["percentage"] for c in colors) - 1.0) < 0.01
        # ranked by share, descending
        pcts = [c["percentage"] for c in colors]
        assert pcts == sorted(pcts, reverse=True)
        for c in colors:
            assert HEX_RE.match(c["hex"])
            assert c["hex"] == f"#{c['red']:02x}{c['green']:02x}{c['blue']:02x}"
            assert all(0 <= c[ch] <= 255 for ch in ("red", "green", "blue"))


def test_color_palette_deterministic(spark, sf_dir):
    a = {r["igId"]: r["colors"] for r in color_palette_query(spark, sf_dir).collect()}
    b = {r["igId"]: r["colors"] for r in color_palette_query(spark, sf_dir).collect()}
    assert a == b


def test_multimodal_meta_matches_payload(spark, sf_dir):
    docs = {r["doc_id"]: r for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    for r in multimodal_meta_query(spark, sf_dir).collect():
        assert r["n_bytes"] == docs[r["doc_id"]]["n_chars"]
        assert r["thumb_bytes"] == min(64, r["n_bytes"])
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert r["fmt"].startswith("fake/")


def test_fixture_family_kmeans_exactness():
    """The closed-form oracle's load-bearing claim: for every image
    count m in [1, MAX_IMAGES_PER_USER], the quantile-spread init over
    the COUNTS_BY_SUM_RANK pixel population starts one center on each
    distinct HSV point and Lloyd returns the exact optimum (counts =
    m * COUNTS_BY_SUM_RANK, centers = the points), regardless of pixel
    order. Sweeps several users x all m."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.colors import (
        COUNTS_BY_SUM_RANK,
        MAX_IMAGES_PER_USER,
        _bgr2hsv_8u,
        _kmeans,
        _user_colors6,
    )

    rng = np.random.RandomState(7)
    for user in (0, 3, 11, 19):
        cols = np.array(_user_colors6(user), dtype=np.float64)
        hsv = _bgr2hsv_8u(cols)  # pipeline feeds (r,g,b) order
        order = np.argsort(hsv.sum(axis=1))
        for m in range(1, MAX_IMAGES_PER_USER + 1):
            px = np.concatenate(
                [
                    np.tile(hsv[ci], (COUNTS_BY_SUM_RANK[rank] * m, 1))
                    for rank, ci in enumerate(order)
                ]
            )
            px = px[rng.permutation(len(px))]
            centers, labels = _kmeans(px, 6)
            counts = sorted(np.bincount(labels, minlength=6).tolist())
            assert counts == sorted(c * m for c in COUNTS_BY_SUM_RANK), (
                f"user {user} m {m}: counts {counts}"
            )
            assert set(map(tuple, centers.tolist())) == set(
                map(tuple, hsv.tolist())
            ), f"user {user} m {m}: centers drifted"


def test_expected_palette_matches_operator(spark, sf_dir):
    """End-to-end: the operator's emitted JSON equals the closed-form
    expected_palette_json for every user present."""
    import json as _json

    from data_pipeline_capstone_project_spark.operators.colors import (
        expected_palette_json,
    )

    for r in color_palette_query(spark, sf_dir).collect():
        assert _json.loads(r["colors"]) == _json.loads(
            expected_palette_json(int(r["igId"]))
        )


def test_racing_restarts_match_full_restarts_on_adversarial_blobs():
    """The sklearn-parity property VERDICT r7 #6 asked for: on
    adversarial multi-modal pixel populations (extremely unequal blob
    masses, a near-duplicate blob pair, and a tiny remote blob - the
    family where a subsampled restart race COULD pick a worse optimum
    than sklearn-style n_init full restarts), the racing default must
    stay within 1.25x of KMEANS_FULL_RESTARTS inertia. Before the
    farthest-first race candidate existed this failed at up to 15x
    (the remote 3-point blob never got an initial center and Lloyd
    cannot migrate one post-hoc); with it the measured worst case over
    this family is ~1.15x."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.colors import _kmeans

    def inertia(px, centers, labels):
        return float(((px - centers[labels]) ** 2).sum())

    worst = 0.0
    for trial in range(30):
        r = np.random.RandomState(100 + trial)
        masses = [4000, 1500, 400, 80, 12, 3]
        r.shuffle(masses)
        cents = r.uniform(0, 255, (6, 3))
        cents[1] = cents[0] + r.uniform(-12, 12, 3)  # near-duplicate pair
        cents[5] = np.clip(cents[5] * 0.1 + 240, 0, 255)  # remote tiny blob
        px = np.clip(
            np.concatenate(
                [c + r.normal(0, 2.0, (m, 3)) for c, m in zip(cents, masses)]
            ),
            0,
            255,
        )
        px = px[r.permutation(len(px))]
        c_race, l_race = _kmeans(px, 6, full_restarts=False)
        c_full, l_full = _kmeans(px, 6, full_restarts=True)
        ratio = inertia(px, c_race, l_race) / inertia(px, c_full, l_full)
        worst = max(worst, ratio)
    assert worst <= 1.25, f"racing init lost {worst:.2f}x inertia vs full restarts"
