"""Invariant and plan-shape tests for behavioral analytics, feature
hashing, fuzzy matching, and subquery decorrelation."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.behavioral import (
    cohort_retention_query,
    funnel_query,
    rolling_distinct_query,
)
from data_pipeline_capstone_project_spark.operators.features import (
    FUZZY_MAX_DIST,
    N_FEATURE_BUCKETS,
    feature_hashing_query,
    fuzzy_match_query,
)
from data_pipeline_capstone_project_spark.operators.relational import (
    above_customer_avg_query,
)
from data_pipeline_capstone_project_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_monotone(spark, sf_dir):
    rows = {r["stage_idx"]: r["n_users"] for r in funnel_query(spark, sf_dir).collect()}
    assert rows[1] >= rows[2] >= rows[3]


def test_rolling_distinct_dominates_daily(spark, sf_dir):
    """The 7-day distinct count can never be below that day's own
    distinct count."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n_day"))
    )
    rolled = rolling_distinct_query(spark, sf_dir)
    viol = (
        rolled.join(daily, "day")
        .filter(F.col("n_users_7d") < F.col("n_day"))
        .count()
    )
    assert viol == 0


def test_cohort_retention_offsets_nonnegative(spark, sf_dir):
    df = cohort_retention_query(spark, sf_dir)
    assert df.filter("week_offset < 0").count() == 0
    # Offset 0 of each cohort is its largest week (everyone is active
    # in the week of their first event).
    from pyspark.sql.window import Window

    w = Window.partitionBy("cohort_week")
    viol = (
        df.withColumn("mx", F.max("n_users").over(w))
        .filter((F.col("week_offset") == 0) & (F.col("n_users") != F.col("mx")))
        .count()
    )
    assert viol == 0


def test_feature_hashing_is_map_side_only(spark, sf_dir):
    """The hashing trick must not shuffle: no Exchange in the plan."""
    df = feature_hashing_query(spark, sf_dir)
    assert "Exchange" not in _plan(df)
    stats = df.agg(
        F.min("brand_bucket"), F.max("brand_bucket"),
        F.min("type_bucket"), F.max("type_bucket"),
    ).collect()[0]
    assert 0 <= stats[0] and stats[1] < N_FEATURE_BUCKETS
    assert 0 <= stats[2] and stats[3] < N_FEATURE_BUCKETS


def test_feature_hashing_deterministic(spark, sf_dir):
    """Same input value -> same bucket across the whole table (the
    property that makes hashed features reproducible)."""
    df = feature_hashing_query(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (
        df.join(part, "p_partkey")
        .groupBy("p_brand")
        .agg(F.count_distinct("brand_bucket").alias("n"))
    )
    assert per_brand.filter("n > 1").count() == 0


def test_fuzzy_match_no_cartesian(spark, sf_dir):
    """Blocking must make this an equi-join, never a cartesian/BNLJ."""
    plan = _plan(fuzzy_match_query(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_match_bounds(spark, sf_dir):
    rows = fuzzy_match_query(spark, sf_dir).collect()
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert 1 <= r["dist"] <= FUZZY_MAX_DIST
        assert r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0]


def test_above_customer_avg_single_shuffle(spark, sf_dir):
    """Decorrelation means ONE scan and ONE exchange (the window
    shuffle) - not a self-join."""
    plan = _plan(above_customer_avg_query(spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") == 1


def test_random_projection_matches_numpy(spark, sf_dir):
    """Projected coordinates must equal an independent numpy
    evaluation of <emb, plane> * scale (1e-9 tolerance: numpy may sum
    in a different order than the plan's pinned left-fold).

    Note a distance-preservation test is NOT meaningful on this data:
    the synthetic embeddings' pairwise distances concentrate (CV ~6%),
    below the k=8 JL distortion, so correlation with original
    distances is statistically weak by construction."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.similarity import (
        RP_DIMS,
        RP_SCALE,
        _RP_PLANES,
        random_projection_query,
    )

    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").limit(20).collect()
    }
    proj = {
        r["vec_id"]: [r[f"p{j}"] for j in range(RP_DIMS)]
        for r in random_projection_query(spark, sf_dir).collect()
    }
    planes = np.array(_RP_PLANES, dtype=np.float64)
    for vid, x in orig.items():
        expected = planes @ x * RP_SCALE
        got = np.array(proj[vid])
        assert np.allclose(got, expected, atol=1e-9), vid


def test_random_projection_map_only(spark, sf_dir):
    from data_pipeline_capstone_project_spark.operators.similarity import (
        random_projection_query,
    )

    assert "Exchange" not in _plan(random_projection_query(spark, sf_dir))
