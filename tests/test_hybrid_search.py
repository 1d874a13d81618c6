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


# --- BM25 -------------------------------------------------------------------


def test_ln_int_bit_exact_across_engines(spark):
    """The BM25 oracle's load-bearing claim: the deterministic
    range-reduced series-ln produces BIT-IDENTICAL doubles on Spark
    and DuckDB for every integer argument, and stays within 1e-10 of
    the true ln."""
    import math
    import struct

    import duckdb

    from data_pipeline_capstone_project_spark.operators.search import (
        _ln_int_steps,
    )

    hi = 20000

    def render(dialect):
        ctes, prev = "", "nums"
        for i, (name, expr) in enumerate(_ln_int_steps("n", "lnn", dialect)):
            ctes += f", s{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
            prev = f"s{i}"
        return (
            f"WITH nums AS (SELECT CAST(x AS BIGINT) AS n FROM rng){ctes} "
            f"SELECT n, lnn FROM {prev} ORDER BY n"
        )

    con = duckdb.connect()
    con.sql(f"CREATE TABLE rng AS SELECT unnest(range(1, {hi + 1})) AS x")
    duck = con.sql(render("duck")).fetchall()
    spark.range(1, hi + 1).toDF("x").createOrReplaceTempView("rng")
    sp = spark.sql(render("spark")).collect()
    assert len(duck) == len(sp) == hi
    from data_pipeline_capstone_project_spark.operators.search import (
        ln_int_py,
    )

    for (n, l_duck), row in zip(duck, sp):
        assert struct.pack("d", l_duck) == struct.pack("d", row["lnn"]), n
        # the Python twin the Spark plan actually injects as literals
        assert struct.pack("d", l_duck) == struct.pack("d", ln_int_py(n)), n
        assert abs(l_duck - math.log(n)) < 1e-10, (n, l_duck)


def test_bm25_matches_textbook_formula(spark, sf_dir):
    """Cross-check the whole pipeline against an independent pandas
    implementation using math.log (tolerance covers only the series
    truncation, < 1e-9 relative)."""
    import math

    from data_pipeline_capstone_project_spark.operators.search import (
        QUERY_TERMS,
        bm25_search_query,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = {r["doc_id"]: r["text"].split() for r in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {
        q: sum(1 for t in toks.values() if q in t) for q in QUERY_TERMS
    }
    got = {r["doc_id"]: r for r in bm25_search_query(spark, sf_dir).collect()}
    n_checked = 0
    for doc_id, words in toks.items():
        score = 0.0
        for q in QUERY_TERMS:
            tf = words.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            score += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(words) / avgdl))
        if score > 0:
            r = got.pop(doc_id)
            assert abs(r["score"] - score) <= 1e-9 * max(1.0, score), doc_id
            assert [r[f"tf_{q}"] for q in QUERY_TERMS] == [
                words.count(q) for q in QUERY_TERMS
            ]
            n_checked += 1
    assert not got  # no extra rows
    assert n_checked > 0
