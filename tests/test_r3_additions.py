"""Tests for the round-3 additions: six TPC-H shapes, two curation
filters, and distributed KMeans.

Correctness is oracle-gated in the registry; these tests pin the
invariants and plan shapes the oracle can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- TPC-H shapes -----------------------------------------------------------


def test_order_priority_is_semi_join(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.tpch import (
        order_priority_query,
    )

    df = order_priority_query(spark, sf_dir)
    # EXISTS must plan as a semi join (dedup inside the join), never a
    # distinct over an inner join
    assert "LeftSemi" in _plan(df)
    rows = df.collect()
    assert all(r.order_count > 0 for r in rows)


def test_volume_shipping_single_fact_pass(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.tpch import (
        volume_shipping_query,
    )

    df = volume_shipping_query(spark, sf_dir)
    # both trade directions come from ONE pass over lineitem (the two
    # nation scans are the 25-row broadcast dims - fine)
    plan = _plan(df)
    assert plan.count("FileScan parquet [l_orderkey") == 1
    assert plan.count("FileScan parquet") <= 6
    rows = {(r.supp_nation, r.cust_nation) for r in df.collect()}
    # no same-nation rows ever
    assert all(a != b for a, b in rows)


def test_top_supplier_exact_decimal_tie_handling(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.tpch import (
        top_supplier_query,
    )

    rows = top_supplier_query(spark, sf_dir).collect()
    assert len(rows) >= 1
    # all returned rows share the identical (exact) max revenue
    assert len({r.total_revenue for r in rows}) == 1


def test_returned_items_is_top20_after_agg(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.tpch import (
        returned_items_query,
    )

    df = returned_items_query(spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= 20
    # customer dim join happens AFTER the limit: the wide c_name column
    # must not appear below TakeOrderedAndProject in the plan
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


# --- curation filters -------------------------------------------------------


def test_corpus_dup_ngrams_bounds(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        corpus_dup_ngrams_query,
    )

    df = corpus_dup_ngrams_query(spark, sf_dir)
    rows = df.collect()
    assert all(0 <= r.dup_frac <= 1 for r in rows)
    assert all(r.n_dup_grams <= r.n_grams for r in rows)
    # every document appears exactly once
    assert len({r.doc_id for r in rows}) == len(rows)


def test_corpus_dup_ngrams_detects_planted_duplicates(spark, tmp_path):
    from data_pipeline_capstone_project_spark.operators.curation import (
        corpus_dup_ngrams_query,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base, "en", "web", len(base)),
            (2, base + " extra tail words one two three", "en", "web", 1),
            (3, "totally different words with no shared gram span here ok", "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "planted")
    docs.write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in corpus_dup_ngrams_query(spark, d).collect()}
    assert out[1].dup_frac == 1.0  # doc1 fully contained in doc2
    assert out[2].n_dup_grams > 0 and out[2].dup_frac < 1.0
    assert out[3].n_dup_grams == 0


def test_lm_rarity_orders_common_below_rare(spark, tmp_path):
    from data_pipeline_capstone_project_spark.operators.curation import (
        lm_rarity_query,
    )

    # doc1 repeats the corpus's dominant token; doc2 is all-unique
    docs = spark.createDataFrame(
        [
            (1, "the the the the the the the the", "en", "web", 1),
            (2, "qzx wvu plm okn ijb uhv ygc tfx", "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "rarity")
    docs.write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in lm_rarity_query(spark, d).collect()}
    assert out[1].mean_ipf < out[2].mean_ipf
    # the dominant-token doc scores near N/c = 16/8 = 2
    assert abs(out[1].mean_ipf - 2.0) < 1e-6


# --- distributed KMeans -----------------------------------------------------


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.kmeans import (
        K,
        kmeans_lloyd_query,
    )

    df = kmeans_lloyd_query(spark, sf_dir)
    rows = df.collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    clusters = {r.cluster for r in rows}
    assert clusters <= set(range(K)) and len(clusters) >= 2
    assert all(r.dist >= 0 for r in rows)


def test_kmeans_iterations_do_not_increase_cost(spark, sf_dir):
    """Lloyd's invariant: total within-cluster distance after the
    second assignment is <= after the first (monotone descent) -- a
    correctness property the row-level oracle comparison can't see."""
    from data_pipeline_capstone_project_spark.operators import kmeans as km

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vectors = emb.select("vec_id", km._quant(F.col("embedding")).alias("q"))
    c0 = vectors.filter(F.col("vec_id") < km.K).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("q").alias("c")
    )
    a1 = km._assign(vectors, c0)
    cost1 = a1.agg(F.sum("dist")).first()[0]
    c1 = km._update(a1)
    a2 = km._assign(vectors, c1)
    cost2 = a2.agg(F.sum("dist")).first()[0]
    assert cost2 <= cost1


def test_kmeans_assignment_is_broadcast_not_window(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.kmeans import (
        kmeans_lloyd_query,
    )

    plan = _plan(kmeans_lloyd_query(spark, sf_dir))
    # argmin via min-struct aggregation, never a per-vector sort window
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_semantic_dedup_canonicals_survive(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.kmeans import (
        semantic_dedup_query,
    )

    rows = semantic_dedup_query(spark, sf_dir).collect()
    by_id = {r.vec_id: r for r in rows}
    assert any(not r.keep for r in rows)  # fixture plants near-dups
    for r in rows:
        # keep <=> self-canonical; dropped vectors point to a LOWER id
        # in the SAME cluster (the canonical may itself be dropped in
        # a chain a~b~c without a~c - the pairwise rule, not CC)
        assert r.keep == (r.canonical_id == r.vec_id)
        if not r.keep:
            assert r.canonical_id < r.vec_id
            assert by_id[r.canonical_id].cluster == r.cluster


def test_curation_funnel_consistency(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        curation_funnel_query,
    )

    rows = curation_funnel_query(spark, sf_dir).collect()
    reasons = {r.first_fail for r in rows}
    # the funnel must actually exercise more than one stage
    assert "kept" in reasons and len(reasons) >= 3
    for r in rows:
        assert r.final_keep == (r.first_fail == "kept")
        if r.first_fail == "kept":
            assert r.gopher_pass and r.rep_pass and r.dedup_keep and r.decontam_pass


# --- custom Python data source ----------------------------------------------


def test_api_source_partitions_fan_out(spark):
    from data_pipeline_capstone_project_spark.sources.api_source import (
        API_PARTITIONS,
        API_ROWS,
        register_social_api,
    )

    register_social_api(spark)
    posts = spark.read.format("social_api").load()
    # executors fetch pages in parallel: one task per InputPartition
    assert posts.rdd.getNumPartitions() == API_PARTITIONS
    assert posts.count() == API_ROWS
    # post_id is globally unique across partitions (no page overlap)
    assert posts.select("post_id").distinct().count() == API_ROWS


def test_api_source_honors_options(spark):
    from data_pipeline_capstone_project_spark.sources.api_source import (
        register_social_api,
    )

    register_social_api(spark)
    posts = (
        spark.read.format("social_api")
        .option("rows", "100")
        .option("partitions", "3")
        .load()
    )
    assert posts.count() == 100
    assert posts.rdd.getNumPartitions() == 3


def test_streaming_api_ingest_is_incremental(spark, tmp_path):
    """Epoch 2 must consume ONLY pages beyond the committed offset:
    after a first run over the full corpus, a rerun with the same
    checkpoint adds zero rows."""
    import glob

    from data_pipeline_capstone_project_spark.streaming.api_stream import (
        _register_stream_source,
    )
    from data_pipeline_capstone_project_spark.sources.api_source import _SCHEMA

    _register_stream_source(spark)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run(rows):
        q = (
            spark.readStream.format("social_api_stream")
            .option("rows", str(rows))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(_SCHEMA).parquet(sink).count()

    assert run(500) == 500
    assert run(500) == 500  # restart, no new pages: nothing re-fetched
    assert run(800) == 800  # growth: only pages 500..800 consumed
