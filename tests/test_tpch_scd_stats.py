"""Plan-shape and invariant tests for the multiway-join / SCD2 /
stats / range-frame / histogram additions. Value correctness is the
driver's DuckDB hash gate; these tests pin the *physical plans* (the
100 TB story) and the semantic invariants no oracle expresses."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.analytics import (
    HIST_BUCKETS,
    price_histogram_query,
    stats_suite_query,
    time_range_window_query,
)
from data_pipeline_capstone_project_spark.operators.scd import scd2_history_query
from data_pipeline_capstone_project_spark.operators.tpch import (
    regional_volume_query,
    shipping_priority_query,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_uses_take_ordered(spark, sf_dir):
    """orderBy().limit() must compile to TakeOrderedAndProject - a
    per-partition top-k, not a global sort."""
    plan = _plan(shipping_priority_query(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcasts_dim_chain(spark, sf_dir):
    """The nation x region dim chain must be broadcast, never
    shuffled."""
    plan = _plan(regional_volume_query(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q5_pushes_filters_to_scan(spark, sf_dir):
    """Date-window and region predicates must reach the parquet
    scans."""
    plan = _plan(regional_volume_query(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "o_orderdate" in plan.split("PushedFilters")[1][:400] or "r_name" in plan


def test_scd2_invariants(spark, sf_dir):
    df = scd2_history_query(spark, sf_dir).cache()
    try:
        # Exactly one current row per key.
        bad_current = (
            df.filter("is_current")
            .groupBy("custkey")
            .count()
            .filter("count <> 1")
            .count()
        )
        assert bad_current == 0
        # Ranges chain: version v's valid_to equals version v+1's
        # valid_from (no gaps, no overlaps).
        a = df.select("custkey", "version", "valid_to")
        b = df.select(
            "custkey",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from").alias("next_from"),
        )
        broken = (
            a.join(b, ["custkey", "version"])
            .filter(F.col("valid_to") != F.col("next_from"))
            .count()
        )
        assert broken == 0
        # Only the last version is open-ended.
        assert df.filter(F.col("valid_to").isNull() & ~F.col("is_current")).count() == 0
    finally:
        df.unpersist()


def test_stats_single_aggregate(spark, sf_dir):
    """All five moments must come from ONE hash aggregate over the
    scan (a single pass), not five separate aggregations."""
    plan = _plan(stats_suite_query(spark, sf_dir))
    assert plan.count("HashAggregate") <= 4  # partial+final (+sort stages)
    assert plan.count("FileScan") == 1


def test_time_range_window_single_window_node(spark, sf_dir):
    plan = _plan(time_range_window_query(spark, sf_dir))
    assert plan.count("Window") - plan.count("WindowGroupLimit") == 1


def test_time_range_window_trailing_bound(spark, sf_dir):
    """Frame must never include future rows: each row's trailing count
    is at most its running prefix length."""
    df = time_range_window_query(spark, sf_dir)
    from pyspark.sql import Window

    run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    viol = (
        df.withColumn("prefix_n", F.count("*").over(run))
        .filter(F.col("trail7_n") > F.col("prefix_n"))
        .count()
    )
    assert viol == 0


def test_histogram_partitions_full_domain(spark, sf_dir):
    df = price_histogram_query(spark, sf_dir).cache()
    try:
        rows = df.collect()
        assert all(0 <= r["bucket"] < HIST_BUCKETS for r in rows)
        # Bucket counts must sum to the table row count (every order
        # lands in exactly one bin - clamping catches outliers).
        from data_pipeline_capstone_project_spark.sources.readers import load_table

        total = load_table(spark, sf_dir, "orders").count()
        assert sum(r["n_orders"] for r in rows) == total
    finally:
        df.unpersist()


def test_argminmax_consistent_with_extremes(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.analytics import (
        argminmax_query,
    )
    from data_pipeline_capstone_project_spark.sources.readers import load_table

    got = {r["c_nationkey"]: r for r in argminmax_query(spark, sf_dir).collect()}
    cust = load_table(spark, sf_dir, "customer").collect()
    by_nation = {}
    for c in cust:
        by_nation.setdefault(c["c_nationkey"], []).append(c)
    for nk, rows in by_nation.items():
        # Winner must hold the extreme balance (composite key ties
        # break toward the higher custkey).
        top = max(rows, key=lambda c: (round(c["c_acctbal"] * 100), c["c_custkey"]))
        bot = min(rows, key=lambda c: (round(c["c_acctbal"] * 100), c["c_custkey"]))
        assert got[nk]["richest_cust"] == top["c_custkey"]
        assert got[nk]["poorest_cust"] == bot["c_custkey"]


def test_weighted_sample_prefers_heavy_weights(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.sampling import (
        WS_K,
        weighted_sample_query,
    )
    from data_pipeline_capstone_project_spark.sources.readers import load_table

    sample = weighted_sample_query(spark, sf_dir).collect()
    assert len(sample) == WS_K
    pop = load_table(spark, sf_dir, "orders").select(
        (6 - F.substring("o_orderpriority", 1, 1).cast("int")).alias("w")
    ).collect()
    pop_mean = sum(r["w"] for r in pop) / len(pop)
    smp_mean = sum(r["w"] for r in sample) / len(sample)
    # Inclusion probability rises with weight; with weights 1..5 the
    # sampled mean must sit clearly above the population mean.
    assert smp_mean > pop_mean + 0.3, (smp_mean, pop_mean)


def test_customer_distribution_accounts_for_every_customer(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.tpch import (
        customer_distribution_query,
    )
    from data_pipeline_capstone_project_spark.sources.readers import load_table

    dist = customer_distribution_query(spark, sf_dir)
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert dist.agg(F.sum("custdist")).collect()[0][0] == n_cust
    # zero-order bucket exists only if the left join really is outer
    assert dist.filter(F.col("c_count") == 0).count() <= 1


def test_sales_opportunity_segments_disjoint_from_urgent(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.tpch import (
        sales_opportunity_query,
    )

    rows = sales_opportunity_query(spark, sf_dir).collect()
    assert rows, "fixture should produce non-empty segments"
    for r in rows:
        assert r.numcust > 0 and r.totacctbal > 0
