"""Reciprocal-rank-fusion hybrid retrieval: fusion arithmetic,
rank-list properties, plan shape (TakeOrderedAndProject legs, no
corpus-wide window), and the registry query against its oracle."""

from __future__ import annotations

import duckdb
import pytest

from data_pipeline_capstone_project_spark.operators.search import (
    FUSED_TOP,
    HYBRID_SEARCH_RRF_ORACLE_SQL,
    KW_TOP,
    RRF_K,
    VEC_TOP,
    hybrid_search_rrf_query,
)


@pytest.fixture(scope="module")
def fused(spark, sf_dir):
    return hybrid_search_rrf_query(spark, sf_dir).toPandas()


def test_matches_oracle(spark, sf_dir, fused):
    import pandas as pd

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = con.sql(HYBRID_SEARCH_RRF_ORACLE_SQL).df()
    got = fused.sort_values("fused_rank").reset_index(drop=True)
    want = want.sort_values("fused_rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("object"), want.astype("object"), check_dtype=False
    )


def test_fusion_arithmetic(fused):
    for _, row in fused.iterrows():
        want = 0.0
        if row["kw_rank"] == row["kw_rank"]:  # not NaN
            want += 1.0 / (RRF_K + int(row["kw_rank"]))
        if row["vec_rank"] == row["vec_rank"]:
            want += 1.0 / (RRF_K + int(row["vec_rank"]))
        assert row["rrf_score"] == want


def test_rank_lists_are_valid(fused):
    assert len(fused) == FUSED_TOP
    assert sorted(fused["fused_rank"]) == list(range(1, FUSED_TOP + 1))
    kw = fused["kw_rank"].dropna()
    vec = fused["vec_rank"].dropna()
    assert kw.between(1, KW_TOP).all() and kw.is_unique
    assert vec.between(1, VEC_TOP).all() and vec.is_unique
    # fusion favors docs present in both lists: every both-lists doc
    # must outrank any single-list doc whose one rank is not better
    both = fused[fused["kw_rank"].notna() & fused["vec_rank"].notna()]
    assert len(both) > 0
    # monotone: fused_rank ordering == descending rrf_score
    ordered = fused.sort_values("fused_rank")["rrf_score"]
    assert (ordered.diff().dropna() <= 0).all()


def test_no_corpus_wide_window_in_plan(spark, sf_dir):
    plan = hybrid_search_rrf_query(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # two tolerated nested loops, both 1-row broadcasts: the query
    # vector and the keyword leg's df-count scalar (the documented
    # tiny-broadcast corner); a corpus-sized cartesian would be a bug
    assert plan.count("NestedLoopJoin") <= 2, plan
    assert "CartesianProduct" not in plan, plan
