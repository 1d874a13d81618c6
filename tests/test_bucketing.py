"""Bucketed co-located join: the no-shuffle scale path.

At 100 TB the dominant cost of a repeated big-big equi-join is the
shuffle of both sides. Writing both tables bucketed by the join key
(``bucketBy`` + ``sortBy``) makes the join a zero-exchange sort-merge:
each task reads matching bucket files from both sides. This is the
engine's answer to the reference's Redshift DISTKEY co-location
(``create_redshift_tables.py`` KEY-distribution implied by the
id-keyed staging tables).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.sources.readers import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    """orders and customer written bucketed by the join key."""
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    for name, df, key in (
        ("b_orders", orders, "o_custkey"),
        ("b_customer", customer, "c_custkey"),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    yield "b_orders", "b_customer"
    for name in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Both sides bucketed on the join key -> sort-merge join with zero
    Exchange operators in the physical plan."""
    t_orders, t_customer = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_orders).join(
            spark.table(t_customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    """Co-location is a physical property only - results identical to
    the unbucketed join."""
    t_orders, t_customer = bucketed_tables
    bucketed_n = (
        spark.table(t_orders)
        .join(spark.table(t_customer), F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    plain_n = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert bucketed_n == plain_n > 0


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the layout: partial
    and final agg collapse into one stage, no Exchange."""
    t_orders, _ = bucketed_tables
    agg = spark.table(t_orders).groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
