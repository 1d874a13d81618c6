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
