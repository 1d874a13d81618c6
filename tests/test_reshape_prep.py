"""Property and plan-shape tests for the reshaping and data-prep
operators (doc_chunking, pii_redaction, event_unpivot, gap_fill,
global_row_ids). Value-level correctness is carried by the DuckDB
oracles; these tests pin the invariants and the physical plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.prep import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    doc_chunking_query,
    pii_redaction_query,
)
from data_pipeline_capstone_project_spark.operators.reshape import (
    event_unpivot_query,
    gap_fill_query,
    global_row_ids_query,
)


def test_doc_chunking_covers_every_token(spark, sf_dir):
    chunks = doc_chunking_query(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.max(F.col("start") + F.col("chunk_tokens")).alias("covered"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_tokens").alias("max_chunk"),
        F.min("start").alias("first_start"),
    )
    j = per_doc.join(docs, "doc_id")
    # Full coverage: the furthest chunk end reaches the token count;
    # chunk sizes are capped; every doc starts at offset 0; the chunk
    # count is exactly ceil(n/stride).
    assert j.filter(F.col("covered") != F.col("n_tokens")).count() == 0
    assert j.filter(F.col("max_chunk") > CHUNK_TOKENS).count() == 0
    assert j.filter(F.col("first_start") != 0).count() == 0
    expected = F.ceil(F.col("n_tokens") / CHUNK_STRIDE)
    assert j.filter(F.col("n_chunks") != expected).count() == 0


def test_doc_chunking_no_shuffle(spark, sf_dir):
    plan = doc_chunking_query(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan -> generate -> project only
    assert "Generate explode" in plan


def test_pii_redaction_is_clean(spark, sf_dir):
    out = pii_redaction_query(spark, sf_dir)
    # Every doc got exactly one injected URL/email/phone. n_phones is
    # counted AFTER replacement (it counts <PHONE> placeholders), so
    # == 1 also proves the redaction itself fired exactly once.
    assert out.filter("n_urls != 1 or n_emails != 1 or n_phones != 1").count() == 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert out.count() == docs


def test_event_unpivot_is_one_scan_expand(spark, sf_dir):
    df = event_unpivot_query(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # melt is Expand, not a union of selects
    assert "Expand" in plan
    rows = df.collect()
    flags = {r["l_returnflag"] for r in rows}
    measures = {r["measure"] for r in rows}
    assert len(rows) == len(flags) * len(measures)
    assert measures == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}


def test_gap_fill_contiguous_and_filled(spark, sf_dir):
    out = gap_fill_query(spark, sf_dir).cache()
    try:
        # The spine is gap-free: per key, row count == day span.
        spans = out.groupBy("o_custkey").agg(
            F.count("*").alias("n"),
            (F.datediff(F.max("d"), F.min("d")) + 1).alias("span"),
        )
        assert spans.filter("n != span").count() == 0
        # Forward fill: non-null everywhere (spines start at a value),
        # and gap rows carry no orders.
        assert out.filter("filled_total IS NULL").count() == 0
        assert out.filter("is_gap AND n_orders != 0").count() == 0
        assert out.filter("NOT is_gap AND day_total IS NULL").count() == 0
    finally:
        out.unpersist()


def test_global_row_ids_contiguous_no_global_window(spark, sf_dir):
    out = global_row_ids_query(spark, sf_dir).cache()
    try:
        n = out.count()
        agg = out.agg(
            F.min("rid"), F.max("rid"), F.countDistinct("rid")
        ).first()
        assert tuple(agg) == (1, n, n)  # exact permutation of 1..n
        # Monotone with the key: sampling adjacent pairs via self-join
        # on rid+1 must preserve key order.
        a, b = out.alias("a"), out.alias("b")
        pairs = a.join(b, F.col("a.rid") + 1 == F.col("b.rid"))
        assert pairs.filter(F.col("a.o_orderkey") >= F.col("b.o_orderkey")).count() == 0
    finally:
        out.unpersist()
    # Plan shape: the big-side window partitions by bucket (parallel),
    # never an empty-partition global window over the fact table; the
    # offsets join is a broadcast.
    plan = global_row_ids_query(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "windowspecdefinition(bucket" in plan
