"""Z-order layout planner: Morton-code correctness, zone-map sanity,
and the actual point of the exercise - two-dimensional data-skipping
beats a single-column sort on the neglected dimension."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_capstone_project_spark.operators.layout import (
    N_FILES,
    Z_BITS,
    morton_col,
    skipping_fraction,
    zorder_layout_query,
    zorder_plan,
    zorder_repartition,
)
from data_pipeline_capstone_project_spark.sources.readers import load_table


def _morton_ref(a: int, b: int, bits: int = Z_BITS) -> int:
    out = 0
    for k in range(bits):
        out |= ((a >> k) & 1) << (2 * k)
        out |= ((b >> k) & 1) << (2 * k + 1)
    return out


def test_morton_col_matches_reference(spark):
    pairs = [(a, b) for a in (0, 1, 5, 37, 200, 255) for b in (0, 3, 128, 255)]
    df = spark.createDataFrame(pairs, "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", morton_col(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton_ref(a, b)


def test_zone_map_sanity(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    total = orders.count()
    plan = zorder_layout_query(spark, sf_dir).collect()
    assert len(plan) == N_FILES
    assert sum(r["n_rows"] for r in plan) == total
    for r in plan:
        assert 0 <= r["a_min"] <= r["a_max"] < (1 << Z_BITS)
        assert 0 <= r["b_min"] <= r["b_max"] < (1 << Z_BITS)


def test_zorder_beats_single_column_sort_on_second_dim(spark, sf_dir):
    """A dim_a-sorted layout prunes perfectly on dim_a but reads ~all
    files for a dim_b predicate; the Z-ordered layout must cut the
    dim_b read fraction by at least 2x while keeping dim_a bounded."""
    orders = load_table(spark, sf_dir, "orders")
    z_rows = zorder_plan(
        orders, "o_orderkey", "o_custkey", "o_orderdate"
    ).collect()

    n_buckets = 1 << Z_BITS
    wa = Window.orderBy("o_custkey", "o_orderkey")
    wb = Window.orderBy("o_orderdate", "o_orderkey")
    bucketed = orders.select(
        (F.ntile(n_buckets).over(wa) - 1).alias("bucket_a"),
        (F.ntile(n_buckets).over(wb) - 1).alias("bucket_b"),
    )
    linear_rows = (
        bucketed.withColumn(
            "file_id",
            F.ntile(N_FILES).over(Window.orderBy("bucket_a", "bucket_b")),
        )
        .groupBy("file_id")
        .agg(
            F.min("bucket_a").alias("a_min"), F.max("bucket_a").alias("a_max"),
            F.min("bucket_b").alias("b_min"), F.max("bucket_b").alias("b_max"),
        )
        .collect()
    )

    lin_a = skipping_fraction(linear_rows, "a")
    lin_b = skipping_fraction(linear_rows, "b")
    z_a = skipping_fraction(z_rows, "a")
    z_b = skipping_fraction(z_rows, "b")
    assert lin_b > 0.9  # the sorted layout shreds the second dim
    assert z_b < lin_b / 2
    assert z_a < 0.5  # and dim_a stays far from a full scan


def test_repartition_path_produces_disjoint_zval_ranges(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_day", F.unix_date(F.to_date("o_orderdate"))
    )
    parts = (
        zorder_repartition(orders, "o_custkey", "o_day", n_files=8)
        .select("zval", F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert 1 < len(parts) <= 8
    for prev, cur in zip(parts, parts[1:]):
        assert prev["hi"] <= cur["lo"]  # range partitioning: disjoint
