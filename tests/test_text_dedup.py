from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.dedup import (
    EMB_DUP_THRESHOLD,
    dedup_embedding_query,
    dedup_exact_query,
    dedup_minhash_query,
    dedup_ngram_query,
)
from data_pipeline_capstone_project_spark.operators.similarity import (
    TOP_K,
    similarity_ivf_query,
    similarity_topk_query,
)
from data_pipeline_capstone_project_spark.operators.text import (
    fingerprint_query,
    text_stats_query,
)


def test_minhash_results_subset_of_exact_jaccard(spark, sf_dir):
    """LSH can only miss pairs (probabilistic recall), never invent
    them: every verified LSH pair must appear in the exact all-pairs
    result with the same jaccard."""
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup_ngram_query(spark, sf_dir).collect()}
    lsh = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup_minhash_query(spark, sf_dir).collect()}
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(exact[k] - v) < 1e-12
    # 8 bands x 2 rows at j >= 0.5 -> expected recall >= ~90%; the
    # fixed md5 hash family makes the outcome deterministic, so this
    # does not flake.
    if exact:
        assert len(lsh) >= 0.8 * len(exact)


def test_exact_dedup_partitions_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    groups = dedup_exact_query(spark, sf_dir)
    assert groups.agg(F.sum("dup_count")).collect()[0][0] == docs.count()
    assert groups.filter("keep_doc_id IS NULL").count() == 0


def test_fingerprint_deterministic_and_distinct(spark, sf_dir):
    fp1 = {r["doc_id"]: (r["md5_fp"], r["roll_fp"]) for r in fingerprint_query(spark, sf_dir).collect()}
    fp2 = {r["doc_id"]: (r["md5_fp"], r["roll_fp"]) for r in fingerprint_query(spark, sf_dir).collect()}
    assert fp1 == fp2
    # md5 distinct <=> texts distinct (all distinct in testdata)
    assert len({v[0] for v in fp1.values()}) == len(fp1)


def test_embedding_dedup_pairs_verified(spark, sf_dir):
    """Every emitted pair is exact-verified: ordered ids, cosine at or
    above the dedup threshold and within [-1, 1]."""
    rows = dedup_embedding_query(spark, sf_dir).collect()
    assert rows, "synthetic corpus contains >= 1 near-dup pair at the threshold"
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert EMB_DUP_THRESHOLD <= r["cosine"] <= 1.0


def test_ivf_is_recall_bounded_subset_of_exact(spark, sf_dir):
    """IVF(nprobe=1) scores must agree with brute force wherever the
    same (query, neighbor) pair appears, and per-query IVF never
    returns a cosine above the exact top-1 (it searches a subset)."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity_topk_query(spark, sf_dir).collect()
    }
    best = {}
    for (q, _n), c in exact.items():
        best[q] = max(best.get(q, -2.0), c)
    ivf = similarity_ivf_query(spark, sf_dir).collect()
    assert ivf
    for r in ivf:
        assert r["rn"] <= TOP_K
        assert r["query_id"] != r["neighbor_id"]
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(exact[key] - r["cosine"]) < 1e-12
        assert r["cosine"] <= best[r["query_id"]] + 1e-12


def test_text_stats_ranges(spark, sf_dir):
    rows = text_stats_query(spark, sf_dir).collect()
    for r in rows:
        assert r["n_tokens"] > 0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["quality_score"] <= 1.0


def test_connected_components_chains_merge(spark):
    """A~B, B~C must land in one cluster even though A,C never pair
    directly; disjoint edges stay separate; canonical = component min."""
    from data_pipeline_capstone_project_spark.operators.clustering import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_star_cc_matches_propagation_and_handles_deep_chains(spark):
    """large-star/small-star must (a) agree with min-label propagation
    on an ordinary graph and (b) solve a 512-node path graph - diameter
    511, where propagation capped at MAX_ROUNDS=20 CANNOT converge -
    within its O(log^2 n) round budget."""
    from data_pipeline_capstone_project_spark.operators.clustering import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20), (5, 1)],
        "doc_a long, doc_b long",
    )
    prop = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    star = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_star(pairs).collect()
    }
    assert star == prop

    n = 512
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    ).coalesce(4)
    labels = connected_components_star(chain, max_rounds=12).collect()
    assert len(labels) == n
    assert {r["cluster_id"] for r in labels} == {1}


def test_quantized_search_recall_vs_exact(spark, sf_dir):
    """Int8 quantization + rerank must recover nearly all of the
    exact top-5: per-vector max-abs scaling keeps quantized cosine
    within rounding of true cosine, and RERANK=4k gives the exact
    pass room to fix ordering. Gate at >= 90% overall recall."""
    from data_pipeline_capstone_project_spark.operators.similarity import (
        similarity_quantized_query,
        similarity_topk_query,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity_topk_query(spark, sf_dir).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity_quantized_query(spark, sf_dir).collect()
    }
    assert len(quant & exact) / len(exact) >= 0.9


def test_bloom_dedup_contract(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.dedup import (
        bloom_dedup_query,
    )

    rows = bloom_dedup_query(spark, sf_dir).collect()
    assert rows
    # the Bloom guarantee: NO false negatives - every true duplicate
    # must be flagged maybe-duplicate by the filter
    assert all(r.bloom_hit for r in rows if r.true_dup)


def test_bloom_dedup_broadcasts_filter(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.dedup import (
        bloom_dedup_query,
    )

    plan = (
        bloom_dedup_query(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both the <=4096-row filter and the distinct-signature set join
    # broadcast: the probe side never shuffles against history
    assert plan.count("BroadcastHashJoin") >= 2


def test_substring_dedup_known_span(spark, tmp_path):
    """A hand-built corpus with one duplicated 8-word span: the first
    occurrence (lowest doc_id, position) survives, the later one is
    cut, and untouched documents pass through byte-identical."""
    from data_pipeline_capstone_project_spark.operators import dedup as D

    span = "a b c d e f g h"  # exactly SUBSTR_K words
    rows = [
        (1, f"{span} x y"),
        (2, f"q w {span} z"),
        (3, "totally unrelated words with no duplicate run here"),
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    import unittest.mock as mock

    with mock.patch.object(
        D, "load_table", lambda sp, d, t: sp.read.parquet(src)
    ):
        out = {
            r.doc_id: r for r in D.substring_dedup_query(spark, "ignored").collect()
        }
    assert out[1].n_removed == 0 and out[1].cleaned_text == f"{span} x y"
    assert out[2].cleaned_text == "q w z" and out[2].n_removed == 8
    assert out[3].n_removed == 0


def test_substring_dedup_counts_consistent(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.dedup import (
        substring_dedup_query,
    )

    rows = substring_dedup_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        kept = len(r.cleaned_text.split()) if r.cleaned_text else 0
        assert r.n_tokens - r.n_removed == kept
        assert 0 <= r.n_removed <= r.n_tokens


def test_dedup_eval_is_single_row_and_sound(spark, sf_dir):
    """The banding evaluation must agree with the operators it
    evaluates: tp <= min(n_true, n_cand), and recall == 1 exactly when
    every true pair collides in some band."""
    from data_pipeline_capstone_project_spark.operators.dedup import (
        dedup_eval_query,
    )

    [r] = dedup_eval_query(spark, sf_dir).collect()
    assert r.tp <= min(r.n_true, r.n_cand)
    assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0


def test_prefix_filter_join_equals_naive(spark, sf_dir):
    """AllPairs prefix filtering is an optimization, not an
    approximation: pair-for-pair identical to the inverted-index
    plan."""
    from data_pipeline_capstone_project_spark.operators.dedup import (
        dedup_ngram_query,
        similarity_join_exact_query,
    )

    naive = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_query(spark, sf_dir).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in similarity_join_exact_query(spark, sf_dir).collect()
    }
    assert naive == pref


def test_threshold_sweep_summary_consistent_with_pairs(spark, sf_dir):
    """The r9 cluster-summary default against its pair-grain twin:
    same n_pairs/n_docs_affected per threshold, cluster stats obey
    the component identities (docs - clusters = dupes removed;
    max cluster <= docs; clusters <= pairs when pairs exist; stats
    are monotone non-increasing in the threshold)."""
    from data_pipeline_capstone_project_spark.operators.dedup import (
        dedup_threshold_sweep_pairs_query,
        dedup_threshold_sweep_query,
    )

    summary = {
        r["threshold"]: r
        for r in dedup_threshold_sweep_query(spark, sf_dir).collect()
    }
    pairs = {
        r["threshold"]: r
        for r in dedup_threshold_sweep_pairs_query(spark, sf_dir).collect()
    }
    assert set(summary) == set(pairs)
    prev = None
    for t in sorted(summary):
        s, p = summary[t], pairs[t]
        assert s["n_pairs"] == p["n_pairs"]
        assert s["n_docs_affected"] == p["n_docs_affected"]
        assert s["n_dupes_removed"] == s["n_docs_affected"] - s["n_clusters"]
        assert s["max_cluster_size"] <= s["n_docs_affected"]
        if s["n_pairs"]:
            assert 1 <= s["n_clusters"] <= s["n_pairs"] + 1
            assert s["max_cluster_size"] >= 2
        else:
            assert s["n_clusters"] == 0 == s["max_cluster_size"]
        if prev is not None:
            for k in ("n_pairs", "n_docs_affected"):
                assert s[k] <= prev[k]
        prev = s
    # the fixture corpus actually exercises the clustering at the
    # loosest cutoff
    loosest = summary[min(summary)]
    assert loosest["n_clusters"] > 0
