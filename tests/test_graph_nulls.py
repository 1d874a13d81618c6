"""Tests for fixed-point PageRank, null semantics, and the Q18-shape
aggregate-then-enrich query."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.graph import (
    BASE,
    pagerank_query,
)
from data_pipeline_capstone_project_spark.operators.relational import (
    null_semantics_query,
)
from data_pipeline_capstone_project_spark.operators.tpch import (
    Q18_QTY_THRESHOLD,
    big_spenders_query,
)


def test_pagerank_ranks_above_base_and_suppliers_dominate(spark, sf_dir):
    """In the symmetric purchase graph every node has an in-edge, so
    every rank sits strictly above the (1-d) base; the 100 suppliers
    aggregate the rank of ~15x more customers, so the top of the
    ranking must be all-supplier."""
    df = pagerank_query(spark, sf_dir).cache()
    try:
        assert df.filter(F.col("rank_scaled") <= BASE).count() == 0
        top = df.orderBy(F.desc("rank_scaled")).limit(10).collect()
        assert all(r["node"] % 2 == 1 for r in top)  # odd = supplier
    finally:
        df.unpersist()


def test_pagerank_deterministic_across_runs(spark, sf_dir):
    """Two independent executions must agree bit-for-bit (the
    fixed-point design's whole claim)."""
    a = {r["node"]: r["rank_scaled"] for r in pagerank_query(spark, sf_dir).collect()}
    b = {r["node"]: r["rank_scaled"] for r in pagerank_query(spark, sf_dir).collect()}
    assert a == b


def test_null_semantics_keeps_null_group(spark, sf_dir):
    df = null_semantics_query(spark, sf_dir).cache()
    try:
        null_group = df.filter(F.col("brand").isNull())
        assert null_group.count() == 1, "null-safe join must keep the NULL group"
        # count(col) skips nulls, count(*) does not.
        assert df.filter(F.col("n_priced") > F.col("n_rows")).count() == 0
    finally:
        df.unpersist()


def test_big_spenders_all_above_threshold(spark, sf_dir):
    df = big_spenders_query(spark, sf_dir)
    assert df.filter(F.col("sum_qty") <= Q18_QTY_THRESHOLD).count() == 0
    # Aggregate must run before the joins: the plan's first
    # HashAggregate consumes the lineitem scan, not a join output.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan


def test_bfs_distances_bipartite_parity(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.graph import (
        bfs_distances_query,
    )

    rows = bfs_distances_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the trade graph is bipartite: customers sit at even hop
        # distances from the customer seed set, suppliers at odd
        assert r.dist % 2 == r.node % 2, r  # even node = customer
        assert 0 <= r.dist <= 4
    # seeds themselves are present at distance 0
    assert any(r.dist == 0 for r in rows)
