"""Scan-efficiency guarantees (SURVEY §4 O2, README scale design).

At 100 TB the scan IS the query cost; these tests pin the three
mechanisms that keep it proportional to the question asked - partition
pruning, predicate pushdown, column pruning - by asserting on the
physical plan and the actual files read, so a refactor that silently
breaks them fails CI."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.sources.readers import load_table

import pytest
# quick smoke lane (VERDICT r13 item 8): this file is part of the
# ~1-minute `-m quick` subset; the full suite stays the snapshot gate
pytestmark = pytest.mark.quick



def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_reads_one_partition(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    events.write.partitionBy("day").parquet(out)
    n_days = len([d for d in os.listdir(out) if d.startswith("day=")])
    assert n_days > 1
    one_day = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    # the equality must appear as a PartitionFilter on the scan (the
    # pruning contract; inputFiles() is pre-pruning so can't be used)
    plan = _plan(one_day)
    assert "PartitionFilters" in plan and "2024-01-05" in plan.split(
        "PartitionFilters", 1
    )[1].splitlines()[0]
    read = one_day.select(F.input_file_name().alias("f")).distinct().collect()
    assert read and all("day=2024-01-05" in r["f"] for r in read)


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_orderdate" not in read_schema and "o_custkey" not in read_schema


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Spark's runtime bloom-filter join pruning: a selective filter
    on the dim side injects might_contain(bloom(dim_keys)) into the
    fact scan, so the shuffle only carries fact rows that can possibly
    match. Fires on shuffle joins only (broadcast joins already skip
    the shuffle), hence the thresholds; at real scale the 10 GB
    application-side default threshold is met naturally."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
