"""Candidate-budget guard for the quadratic exact-pair diagnostics
(VERDICT r11 item 2): a hot-shingle corpus - the vocabulary-saturation
case measured at sf5 (1.18e9 candidates) - must make the guard fire
BEFORE the candidate join is scheduled, and registry scale_class tags
must be queryable and complete."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.dedup import (
    CandidateBudgetError,
    _prefix_candidates,
    shingles_of_docs,
)


def _hot_corpus(spark, n_docs: int):
    """Every doc shares the same 6-word text: every shingle's prefix
    document frequency is n_docs, so the candidate bound is
    ~C(n_docs, 2) per prefix shingle - the adversarial saturated
    case."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta").alias("text"),
    )


def test_budget_guard_fires_on_hot_shingles(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CANDIDATE_BUDGET", "100")
    sh = shingles_of_docs(_hot_corpus(spark, 40)).localCheckpoint(eager=True)
    # 40 docs x shared shingles => bound >= C(40,2) = 780 > 100
    with pytest.raises(CandidateBudgetError) as exc:
        _prefix_candidates(sh, 0.3, check_budget=True)
    msg = str(exc.value)
    assert "budget" in msg and "diagnostic-quadratic" in msg
    # the message carries the skew evidence: the hottest prefix df
    assert "40" in msg


def test_budget_guard_passes_under_budget(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CANDIDATE_BUDGET", "1000000")
    sh = shingles_of_docs(_hot_corpus(spark, 10)).localCheckpoint(eager=True)
    cands = _prefix_candidates(sh, 0.5, check_budget=True)
    # identical docs are all true pairs: candidates must cover them
    assert cands.distinct().count() == 45  # C(10,2)


def test_guard_wired_into_registry_diagnostics(spark, monkeypatch):
    """The three budgeted registry entries go through the guard: with
    a zero budget even sf0.001 refuses to schedule."""
    from data_pipeline_capstone_project_spark.registry import QUERIES

    monkeypatch.setenv("SPARK_GRAFT_CANDIDATE_BUDGET", "0")
    for name in (
        "similarity_join_exact",
        "dedup_threshold_sweep",
        "dedup_threshold_sweep_pairs",
    ):
        with pytest.raises(CandidateBudgetError):
            # the guard runs eagerly at plan-build time
            QUERIES[name](spark, "/root/testdata/sf0.001")


def test_scale_classes_complete_and_valid():
    from data_pipeline_capstone_project_spark.registry import (
        QUERIES,
        SCALE_CLASS_VALUES,
        SCALE_CLASSES,
        scale_class,
    )

    assert set(SCALE_CLASSES) == set(QUERIES)
    assert set(SCALE_CLASSES.values()) <= set(SCALE_CLASS_VALUES)
    for name in (
        "dedup_threshold_sweep",
        "dedup_threshold_sweep_pairs",
        "similarity_join_exact",
    ):
        assert scale_class(name) == "diagnostic-quadratic"
    assert scale_class("dedup_minhash_lsh") == "lsh"
    with pytest.raises(KeyError):
        scale_class("no_such_entry")
