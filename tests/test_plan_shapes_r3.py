"""Plan-shape regression guards for the round-3 rewrites.

Each test pins the property that made the rewrite fast - not the full
plan string (brittle), just the shape facts that matter at 100 TB.
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_simhash_has_no_distinct_and_no_scan_side_signature(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.dedup import (
        dedup_simhash_query,
    )

    plan = _plan(dedup_simhash_query(spark, sf_dir))
    # first-matching-block uniqueness replaced the distinct(): no
    # aggregate above the join
    assert "HashAggregate" not in plan
    # the lineage barrier keeps the signature expression out of scan
    # filters (the isnotnull-pushdown substitution pathology)
    for line in plan.split("\n"):
        if "FileScan" in line or "Filter (" in line:
            assert "aggregate(" not in line and "md5(" not in line, line[:200]


def test_interval_join_never_streams_pairs(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.asof import (
        interval_join_query,
    )

    plan = _plan(interval_join_query(spark, sf_dir))
    # the decomposable-aggregate rewrite must keep the range predicate
    # out of the join: no nested-loop, no non-equi residual stream
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_embedding_dedup_is_grouped_map(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.dedup import (
        dedup_embedding_query,
    )

    plan = _plan(dedup_embedding_query(spark, sf_dir))
    # verification is the per-bucket pandas UDF - candidate pairs must
    # never appear as a join
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_decontamination_single_gram_projection(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        decontamination_query,
    )

    plan = _plan(decontamination_query(spark, sf_dir))
    # both branches read the checkpointed gram relation: the md5 gram
    # projection must appear at most once in the executed plan
    assert plan.count("conv(substring(md5(") <= 1


def test_gopher_quality_zero_shuffle(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        gopher_quality_query,
    )

    assert "Exchange" not in _plan(gopher_quality_query(spark, sf_dir))


def test_repetition_filter_zero_shuffle(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.curation import (
        repetition_filter_query,
    )

    # the per-doc mode is sort+fold inside the scan projection - the
    # explode + re-aggregation form this replaced cost two exchanges
    assert "Exchange" not in _plan(repetition_filter_query(spark, sf_dir))
