"""Invariant tests for leakage_safe_split and adaptive_quality_filter.

The oracle sweep checks exact value parity with DuckDB; these tests
check the *semantic contracts* the oracle cannot see: no near-dup
pair straddles a split, the split partitions the corpus, and the
adaptive filter prunes (at most) the bottom decile per language.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.clustering import (
    leakage_safe_split_query,
)
from data_pipeline_capstone_project_spark.operators.curation import (
    ADAPTIVE_QUALITY_DROP_PCT,
    adaptive_quality_filter_query,
)
from data_pipeline_capstone_project_spark.operators.dedup import dedup_minhash_query
from data_pipeline_capstone_project_spark.sources.readers import load_table


def test_leakage_safe_split_partitions_corpus(spark, sf_dir):
    split = leakage_safe_split_query(spark, sf_dir).cache()
    n_docs = load_table(spark, sf_dir, "documents").count()
    # every document exactly once
    assert split.count() == n_docs
    assert split.select("doc_id").distinct().count() == n_docs
    # only the three split labels
    labels = {r["split"] for r in split.select("split").distinct().collect()}
    assert labels <= {"train", "validation", "test"}
    # train is the dominant partition (80/10/10 target; generous band
    # because assignment is cluster-level, not doc-level)
    frac = split.where(F.col("split") == "train").count() / n_docs
    assert 0.6 < frac < 0.95
    split.unpersist()


def test_leakage_safe_split_no_pair_straddles(spark, sf_dir):
    split = leakage_safe_split_query(spark, sf_dir)
    pairs = dedup_minhash_query(spark, sf_dir)
    straddling = (
        pairs.join(
            split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddling == 0


def test_adaptive_quality_filter_per_lang_decile(spark, sf_dir):
    kept = adaptive_quality_filter_query(spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    per_lang_total = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang_kept = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, total in per_lang_total.items():
        k = per_lang_kept.get(lang, 0)
        # drops at most the bottom decile (plus the percent_rank==0 row
        # boundary), never a larger share of any single language
        assert k >= int(total * (1 - ADAPTIVE_QUALITY_DROP_PCT)) - 1, lang
        assert k <= total
    # the kept set respects the threshold column it emits
    assert kept.where(F.col("quality_pct") < ADAPTIVE_QUALITY_DROP_PCT).count() == 0
    kept.unpersist()


def test_quantile_rollup_brackets_exact_percentiles(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.analytics import (
        QR_WIDTH,
        quantile_rollup_query,
    )

    import math

    est = {r["event_type"]: r for r in quantile_rollup_query(spark, sf_dir).collect()}
    vals: dict[str, list[float]] = {}
    for r in load_table(spark, sf_dir, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for et, row in est.items():
        xs = sorted(vals[et])
        for q in (0.5, 0.95, 0.99):
            # the histogram returns the lower bound of the bin holding
            # the DISCRETE quantile (the ceil(q*n)-th order statistic)
            disc = xs[math.ceil(q * len(xs)) - 1]
            lo = row[f"p{int(q * 100)}_lo"]
            assert lo <= disc < lo + QR_WIDTH, (et, q, lo, disc)


def test_anomaly_mad_contract(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.analytics import (
        anomaly_mad_query,
    )

    out = anomaly_mad_query(spark, sf_dir).cache()
    # every event classified exactly once
    assert out.count() == load_table(spark, sf_dir, "events").count()
    # flagged events really deviate; unflagged really don't (k=3)
    bad = out.where(
        (F.col("is_anomaly") & (F.abs(F.col("value") - F.col("med")) <= 3 * F.col("mad")))
        | (~F.col("is_anomaly") & (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")))
    ).count()
    assert bad == 0
    out.unpersist()


def test_bigram_lm_score_orders_scrambled_text(spark, sf_dir):
    """A fluency score must separate natural-order bigrams from
    scrambled ones: corpus documents (which share bigrams with the
    training slice) should on average surprise the LM less than the
    theoretical backoff ceiling, and every score is non-negative."""
    from data_pipeline_capstone_project_spark.operators.curation import (
        LM_EVAL_MOD,
        bigram_lm_score_query,
    )

    out = bigram_lm_score_query(spark, sf_dir).cache()
    rows = out.collect()
    assert all(r["doc_id"] % LM_EVAL_MOD == 0 for r in rows)
    assert all(r["mean_surprise"] >= 0.0 for r in rows)
    scored = [r for r in rows if r["n_bigrams"] > 0]
    assert scored, "eval slice must contain scoreable documents"
    # sanity: an in-domain corpus averages far below the OOV ceiling
    # (surprise ~ N per OOV bigram); shared bigrams keep it small
    avg = sum(r["mean_surprise"] for r in scored) / len(scored)
    assert avg < 1_000_000, avg
    out.unpersist()


def test_cross_corpus_overlap_matrix(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        cross_corpus_overlap_query,
    )

    out = cross_corpus_overlap_query(spark, sf_dir).cache()
    rows = out.collect()
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    # at most (|S| choose 2) unordered pairs, each listed once
    assert len(rows) <= n_sources * (n_sources - 1) // 2
    assert len({(r["source_a"], r["source_b"]) for r in rows}) == len(rows)
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["n_shared"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_shared"]
        assert abs(r["jaccard"] - r["n_shared"] / union) < 1e-12
        assert 0.0 < r["jaccard"] <= 1.0
    out.unpersist()


def test_bpe_train_merge_semantics(spark, sf_dir):
    """Pin the BPE contract: ranks are 1..K, pair counts are non-
    increasing in rank (each merge removes the most frequent pair),
    and the greedy merge fold matches hand-computed cases."""
    from pyspark.sql import functions as SF

    from data_pipeline_capstone_project_spark.operators.bpe import (
        N_MERGES,
        _merge_fold,
        bpe_train_query,
    )

    rules = bpe_train_query(spark, sf_dir).collect()
    assert [r["merge_rank"] for r in rules] == list(range(1, N_MERGES + 1))
    counts = [r["pair_count"] for r in rules]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # merged symbols are concatenations of existing symbols
    for r in rules:
        assert r["left_sym"] and r["right_sym"]

    # fold semantics: greedy leftmost non-overlapping
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["b", "a", "b", "a"],), (["a", "b"],)],
        "syms array<string>",
    )
    got = [
        r["m"]
        for r in df.select(_merge_fold(SF.col("syms"), "a", "a").alias("m")).collect()
    ]
    assert got[0] == ["aa", "a"]
    got2 = [
        r["m"]
        for r in df.select(_merge_fold(SF.col("syms"), "b", "a").alias("m")).collect()
    ]
    assert got2[1] == ["ba", "ba"]
    assert got2[2] == ["a", "b"]


def test_bpe_fold_exhaustive_vs_reference(spark):
    """Exhaustively compare the Spark merge fold against a Python
    reference for EVERY sequence of length <= 5 over {a, b} and every
    pair - the full space where greedy/overlap edge cases live."""
    from itertools import product

    from pyspark.sql import functions as SF

    from data_pipeline_capstone_project_spark.operators.bpe import _merge_fold

    def ref_merge(syms, l, r):
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    cases = [
        list(seq)
        for n in range(0, 6)
        for seq in product("ab", repeat=n)
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, syms array<string>"
    )
    for l, r in [("a", "b"), ("a", "a"), ("b", "a"), ("b", "b")]:
        got = {
            row["i"]: row["m"]
            for row in df.select(
                "i", _merge_fold(SF.col("syms"), l, r).alias("m")
            ).collect()
        }
        for i, case in enumerate(cases):
            assert got[i] == ref_merge(case, l, r), (case, l, r, got[i])


def test_streaming_quantile_store_matches_batch(spark, sf_dir):
    """The incremental histogram's extracted quantiles must equal the
    batch quantile_rollup result exactly - the mergeability contract."""
    from data_pipeline_capstone_project_spark.operators.analytics import (
        quantile_rollup_query,
    )
    from data_pipeline_capstone_project_spark.streaming.quantile_stream import (
        streaming_quantile_query,
    )

    batch = {
        r["event_type"]: (r["p50_lo"], r["p95_lo"], r["p99_lo"])
        for r in quantile_rollup_query(spark, sf_dir).collect()
    }
    stream = {
        r["event_type"]: (r["p50_lo"], r["p95_lo"], r["p99_lo"])
        for r in streaming_quantile_query(spark, sf_dir).collect()
    }
    assert stream == batch


def test_quantile_store_promote_is_crash_safe(spark, tmp_path):
    """The store promote protocol (demote live version to .old ->
    promote .tmp -> drop .old) must survive a crash at any point with
    a complete (data, epoch-marker) pair recoverable: simulate the
    worst interruption - old store demoted, new store not yet promoted
    - and check _recover restores the prior epoch, discarding the
    half-written tmp, so the replayed batch merges exactly once."""
    import os
    import shutil

    from data_pipeline_capstone_project_spark.streaming.quantile_stream import (
        _applied_epoch,
        _store,
        histogram_merge_batch,
    )

    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [("click", 1.0), ("click", 2.5), ("view", 9.0)], "event_type string, value double"
    )
    histogram_merge_batch(spark, batch, store, epoch_id=0)
    assert _applied_epoch(store) == 0
    epoch0_rows = sorted(map(tuple, _store(spark, store).collect()))

    # crash window: store demoted to .old, tmp half-written, no store
    os.replace(store, store + ".old")
    os.makedirs(store + ".tmp")
    with open(os.path.join(store + ".tmp", "partial"), "w") as fh:
        fh.write("garbage")

    # any reader recovers the complete epoch-0 pair
    assert _applied_epoch(store) == 0
    assert sorted(map(tuple, _store(spark, store).collect())) == epoch0_rows
    assert not os.path.isdir(store + ".old")
    assert not os.path.isdir(store + ".tmp")

    # the replayed epoch (same id) is skipped; the next epoch merges
    histogram_merge_batch(spark, batch, store, epoch_id=0)
    total0 = (
        _store(spark, store).groupBy().sum("cnt").collect()[0][0]
    )
    assert total0 == 3  # not double-counted
    histogram_merge_batch(spark, batch, store, epoch_id=1)
    assert _applied_epoch(store) == 1
    total1 = _store(spark, store).groupBy().sum("cnt").collect()[0][0]
    assert total1 == 6
    shutil.rmtree(str(tmp_path), ignore_errors=True)
