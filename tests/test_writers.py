"""Sink roundtrips (SURVEY §2.2 K2/K3/K5/K6)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.sources.readers import (
    load_table,
    read_csv,
)
from data_pipeline_capstone_project_spark.sources.writers import (
    insert_overwrite_table,
    save_as_table,
    write_csv,
    write_parquet_overwrite,
)


def test_parquet_overwrite_roundtrip_partitioned(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_pq")
    orders = load_table(spark, sf_dir, "orders")
    write_parquet_overwrite(
        orders, out, partition_by=["o_orderstatus"], target_files=4
    )
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition layout exists -> pruning/retention path works
    assert glob.glob(os.path.join(out, "o_orderstatus=*"))
    # overwrite really replaces (K6 truncate-then-load)
    write_parquet_overwrite(orders.limit(10), out, target_files=1)
    assert spark.read.parquet(out).count() == 10


def test_csv_single_file_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "agg_csv")
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    write_csv(agg, out)
    files = glob.glob(os.path.join(out, "part-*.csv"))
    assert len(files) == 1  # the reference's one-S3-object contract
    back = read_csv(spark, out, schema=agg.schema)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in agg.collect()
    }


def test_insert_overwrite_table(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    save_as_table(orders, "t_fact", str(tmp_path / "t_fact"))
    assert spark.table("t_fact").count() == orders.count()
    insert_overwrite_table(orders.limit(5), "t_fact")
    assert spark.table("t_fact").count() == 5
    spark.sql("DROP TABLE IF EXISTS t_fact")


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    from data_pipeline_capstone_project_spark.sources.writers import compact

    out = str(tmp_path / "fragmented")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(37).write.parquet(out)  # simulate micro-batch litter
    before = len(glob.glob(os.path.join(out, "*.parquet")))
    assert before >= 37
    rows_before = spark.read.parquet(out).count()
    n = compact(spark, out, target_file_mb=256)
    after = len(glob.glob(os.path.join(out, "*.parquet")))
    assert after == n == 1  # sf0.001 orders << 256 MB
    assert spark.read.parquet(out).count() == rows_before


def test_clustered_write_enables_rowgroup_skipping(spark, sf_dir, tmp_path):
    """After write_clustered on l_shipdate, parquet footer min/max
    ranges must be narrow and file ranges disjoint - the physical
    property row-group/file skipping depends on. Unsorted baseline:
    every file spans ~the full date range, nothing skippable."""
    import pyarrow.parquet as pq

    from data_pipeline_capstone_project_spark.sources.writers import (
        write_clustered,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    clustered = str(tmp_path / "clustered")
    baseline = str(tmp_path / "baseline")
    write_clustered(li, clustered, ["l_shipdate"], n_files=8)
    li.repartition(8).write.parquet(baseline)

    def file_ranges(path):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "l_shipdate"
            )
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            out.append((lo, hi))
        return sorted(out)

    cl = file_ranges(clustered)
    bl = file_ranges(baseline)
    total = max(hi for _, hi in bl) - min(lo for lo, _ in bl)

    # clustered files: disjoint ranges (file skipping works)
    assert all(cl[i][1] <= cl[i + 1][0] for i in range(len(cl) - 1))
    # each clustered file covers a small slice; unsorted files span ~all
    assert max(hi - lo for lo, hi in cl) < total * 0.4
    assert min(hi - lo for lo, hi in bl) > total * 0.6

    # end-to-end: a narrow range filter over the clustered layout must
    # actually read fewer files than exist (input_file_name count)
    cut_lo, cut_hi = cl[0][1], cl[1][1]  # spans ~1 file's range
    got = (
        spark.read.parquet(clustered)
        .filter((F.col("l_shipdate") > cut_lo) & (F.col("l_shipdate") <= cut_hi))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert got <= 2


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered layout: a selective range filter on EITHER column
    touches a minority of files. 1-D clustered baseline: filters on
    the sort key skip, filters on the other column read every file -
    the gap z-ordering exists to close."""
    from data_pipeline_capstone_project_spark.sources.writers import (
        write_clustered,
        write_zordered,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    zpath, cpath = str(tmp_path / "z"), str(tmp_path / "c")
    write_zordered(li, zpath, "l_orderkey", "l_suppkey", n_files=8)
    write_clustered(li, cpath, ["l_orderkey"], n_files=8)

    bounds = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    ok_hi = bounds[0] + (bounds[1] - bounds[0]) // 8
    sk_hi = bounds[2] + (bounds[3] - bounds[2]) // 8

    def files_read(path, cond):
        return (
            spark.read.parquet(path)
            .filter(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    # ~1/8 range on each dimension
    z_by_order = files_read(zpath, F.col("l_orderkey") <= ok_hi)
    z_by_supp = files_read(zpath, F.col("l_suppkey") <= sk_hi)
    c_by_order = files_read(cpath, F.col("l_orderkey") <= ok_hi)
    c_by_supp = files_read(cpath, F.col("l_suppkey") <= sk_hi)

    assert c_by_order <= 2          # 1-D layout: its own key skips
    assert c_by_supp == 8           # ...but the other column reads all
    assert z_by_order <= 4          # z-order: both dimensions skip
    assert z_by_supp <= 4


def test_orc_roundtrip_preserves_schema_and_values(spark, sf_dir, tmp_path):
    from data_pipeline_capstone_project_spark.sources.writers import write_orc

    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0
