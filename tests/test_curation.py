"""Corpus-curation operators: decontamination, Gopher quality rules,
sequence packing, dedup resolution."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_capstone_project_spark.operators.curation import (
    BENCH_MOD,
    PACK_CTX,
    decontamination_query,
    dedup_resolution_query,
    gopher_quality_query,
    sequence_packing_query,
)
from data_pipeline_capstone_project_spark.sources.readers import load_table


def test_decontamination_excludes_benchmark_and_flags_consistently(spark, sf_dir):
    df = decontamination_query(spark, sf_dir).cache()
    assert df.filter(F.col("doc_id") % BENCH_MOD == 0).count() == 0
    assert df.filter(F.col("contaminated") != (F.col("n_leaked_grams") > 0)).count() == 0
    n_train = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % BENCH_MOD != 0
    ).count()
    assert df.count() == n_train
    df.unpersist()


def test_gopher_pass_is_conjunction_of_rules(spark, sf_dir):
    df = gopher_quality_query(spark, sf_dir)
    recomputed = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("n_stopwords") >= 2)
    )
    assert df.filter(F.col("gopher_pass") != recomputed).count() == 0


def test_sequence_packing_offsets_contiguous_per_shard(spark, sf_dir):
    df = sequence_packing_query(spark, sf_dir).cache()
    # each doc's offset equals the previous doc's offset + tokens
    w = Window.partitionBy("source").orderBy("doc_id")
    gaps = df.withColumn(
        "prev_end", F.lag(F.col("tok_offset") + F.col("n_tokens"), 1, 0).over(w)
    ).filter(F.col("tok_offset") != F.col("prev_end"))
    assert gaps.count() == 0
    # sequence span is consistent with the offsets
    bad = df.filter(
        (F.col("first_seq") != F.floor(F.col("tok_offset") / PACK_CTX))
        | (F.col("last_seq") < F.col("first_seq"))
    )
    assert bad.count() == 0
    df.unpersist()


def test_repetition_metrics_bounded(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        repetition_filter_query,
    )

    df = repetition_filter_query(spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    assert df.count() == docs.count()
    assert df.filter((F.col("top_g2_frac") < 0) | (F.col("top_g2_frac") > 1)).count() == 0
    assert df.filter((F.col("dup_g3_frac") < 0) | (F.col("dup_g3_frac") > 1)).count() == 0
    df.unpersist()


def test_source_mixture_weights_normalized(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        source_mixture_query,
    )

    rows = source_mixture_query(spark, sf_dir).collect()
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-9
    # temperature < 1 flattens: the max source's weight share must not
    # exceed its raw share ordering-wise... (T=0.5 sharpens: squares);
    # verify the exact power relation instead
    tot2 = sum(r.n_tokens**2 for r in rows)
    for r in rows:
        assert abs(r.mix_weight - r.n_tokens**2 / tot2) < 1e-12


def test_dedup_resolution_one_keeper_per_cluster(spark, sf_dir):
    df = dedup_resolution_query(spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    assert df.count() == docs.count()
    per_cluster = df.groupBy("cluster_id").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep")
    )
    assert per_cluster.filter(F.col("n_keep") != 1).count() == 0
    # the canonical doc is at least as long as every cluster member
    lens = docs.select("doc_id", "n_chars")
    member = df.join(lens, "doc_id")
    canon_len = (
        df.filter("keep")
        .join(lens, "doc_id")
        .select(F.col("cluster_id"), F.col("n_chars").alias("canon_chars"))
    )
    assert (
        member.join(canon_len, "cluster_id")
        .filter(F.col("n_chars") > F.col("canon_chars"))
        .count()
        == 0
    )
    df.unpersist()


def test_importance_resampling_prefers_target_lang(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        DSIR_TARGET_LANG,
        importance_resampling_query,
    )

    rows = importance_resampling_query(spark, sf_dir).collect()
    assert rows
    # the hashed-ngram ratio model must pull the selection toward the
    # target domain: a strict majority of selected docs are target-lang
    tgt = sum(1 for r in rows if r.lang == DSIR_TARGET_LANG)
    assert tgt > len(rows) / 2
    ws = [r.dsir_weight for r in rows]
    assert ws == sorted(ws, reverse=True)


def test_importance_resampling_topk_never_global_sorts(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        importance_resampling_query,
    )

    plan = (
        importance_resampling_query(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # selection is per-partition top-K, and the 128-bucket model joins
    # broadcast - no global sort, no shuffled model join
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
