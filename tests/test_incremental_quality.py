"""Tests for incremental aggregate maintenance, observe-based quality
metrics, and the ORC / text sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.incremental import (
    incremental_agg_query,
    merge_states,
    partial_state,
)
from data_pipeline_capstone_project_spark.operators.quality import observed_write
from data_pipeline_capstone_project_spark.sources.readers import load_table
from data_pipeline_capstone_project_spark.sources.writers import (
    write_orc,
    write_text_lines,
)


def test_incremental_equals_full_recompute(spark, sf_dir):
    """Merged partial states must be exactly a full recompute - the
    algebraic-aggregate contract, checked inside Spark (the oracle
    checks it against DuckDB too)."""
    events = load_table(spark, sf_dir, "events")
    full = partial_state(events)
    inc = incremental_agg_query(spark, sf_dir)
    assert inc.join(full, "user_id").count() == full.count() == inc.count()
    m = (
        inc.alias("i")
        .join(full.alias("f"), "user_id")
        .filter(
            (F.col("i.n") != F.col("f.n"))
            | (F.col("i.sum_value") != F.col("f.sum_dec").cast("double"))
        )
        .count()
    )
    assert m == 0


def test_merge_states_associative(spark, sf_dir):
    """(a ⊕ b) ⊕ c == a ⊕ (b ⊕ c): the property that lets batches
    merge in any order (out-of-order backfills included)."""
    events = load_table(spark, sf_dir, "events")
    a = partial_state(events.filter(F.dayofmonth("ts") <= 10))
    b = partial_state(events.filter((F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)))
    c = partial_state(events.filter(F.dayofmonth("ts") > 20))
    left = merge_states(merge_states(a, b), c)
    right = merge_states(a, merge_states(b, c))
    diff = left.exceptAll(right).count() + right.exceptAll(left).count()
    assert diff == 0


def test_observed_write_single_pass_metrics(spark, sf_dir):
    """Metrics observed during one noop pass must equal independently
    computed gates."""
    orders = load_table(spark, sf_dir, "orders")
    got = observed_write(
        orders,
        {
            "rows": F.count(F.lit(1)),
            "null_priority": F.count(F.lit(1)) - F.count("o_orderpriority"),
            "max_price": F.max("o_totalprice"),
        },
    )
    assert got["rows"] == orders.count()
    assert got["null_priority"] == orders.filter(
        F.col("o_orderpriority").isNull()
    ).count()
    assert got["max_price"] == orders.agg(F.max("o_totalprice")).collect()[0][0]


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_text_sink_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_txt")
    write_text_lines(src, "r_name", path)
    back = spark.read.text(path)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["r_name"] for r in src.collect()
    )
