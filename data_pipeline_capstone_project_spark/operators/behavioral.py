"""Behavioral / product-analytics operators over the events table:
sliding-window distinct users, sequential funnel, cohort retention.

The reference's analytics stop at per-user rolling averages
(``get_elastic_data.py:61-92``); these are the next three questions
any events store gets asked. All are expressed as single declarative
plans (no driver-side loops) with DuckDB oracles.

Scale notes common to all three: every operator shuffles on
``user_id`` (or the derived day key) only; the events table at 100 TB
would be date-partitioned, so the day-grain pre-aggregations prune to
the scanned window and the per-user joins co-partition across stages -
AQE reuses the exchange where the key chain is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

ROLLING_DAYS = 7


def rolling_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per trailing 7-day window, one row per observed
    day. COUNT(DISTINCT) cannot ride a sliding frame, and rescanning
    the table per window end is O(windows) passes; the scale-correct
    shape is: (1) dedupe to (day, user) pairs - one shuffle that also
    collapses the data to ~days x users rows; (2) fan each pair out to
    the <=7 window-ends it contributes to (narrow explode, no
    shuffle); (3) count distinct per window end. The fan-out factor is
    the window length, paid on the *deduped* data, not the raw
    events."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct()
    contrib = pairs.select(
        F.explode(F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1))).alias("k"),
        "day",
        "user_id",
    ).select(F.date_add("day", F.col("k")).alias("win_day"), "user_id")
    observed = contrib.join(
        F.broadcast(days.withColumnRenamed("day", "win_day")), "win_day", "semi"
    )
    return (
        observed.groupBy("win_day")
        .agg(F.count_distinct("user_id").alias("n_users_7d"))
        .select(
            F.date_format("win_day", "yyyy-MM-dd").alias("day"), "n_users_7d"
        )
        .orderBy("day")
    )


ROLLING_DISTINCT_ORACLE_SQL = f"""
WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
     d AS (SELECT DISTINCT day FROM p)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       count(DISTINCT p.user_id) AS n_users_7d
FROM d JOIN p ON p.day BETWEEN d.day - {ROLLING_DAYS - 1} AND d.day
GROUP BY d.day
ORDER BY day
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: first 'view', then the first 'click'
    at-or-after it, then the first 'purchase' at-or-after that.
    Per-stage user counts (monotonically non-increasing).

    ONE scan + ONE wide shuffle: the per-user groupBy collects the
    sorted candidate timestamps of the later stages as arrays, and the
    stage chain resolves with array expressions (array_min of the
    filtered tail) - the join-cascade formulation of the same funnel
    costs 3 scans and 8 exchanges (measured by tools/audit_plans.py).
    Per-user state is the stage-2/3 candidate lists, bounded by that
    user's click/purchase volume; for pathological single-user volumes
    swap stage 2/3 back to conditional-min join passes."""
    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .filter(F.col("event_type").isin(*FUNNEL_STAGES))
    )
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))).alias("t1"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == FUNNEL_STAGES[1], F.col("ts")))
        ).alias("cs"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == FUNNEL_STAGES[2], F.col("ts")))
        ).alias("ps"),
    )
    resolved = per_user.withColumn(
        "t2", F.array_min(F.filter(F.col("cs"), lambda x: x >= F.col("t1")))
    ).withColumn(
        "t3", F.array_min(F.filter(F.col("ps"), lambda x: x >= F.col("t2")))
    )
    counts = resolved.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    return counts.select(
        F.expr(
            f"stack(3, 1, '{FUNNEL_STAGES[0]}', n1, 2, '{FUNNEL_STAGES[1]}', n2,"
            f" 3, '{FUNNEL_STAGES[2]}', n3) AS (stage_idx, stage, n_users)"
        )
    ).orderBy("stage_idx")


FUNNEL_ORACLE_SQL = f"""
WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id),
     t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts >= t1.t1
            GROUP BY e.user_id),
     t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN t2 ON e.user_id = t2.user_id
            WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts >= t2.t2
            GROUP BY e.user_id)
SELECT 1 AS stage_idx, '{FUNNEL_STAGES[0]}' AS stage, count(*) AS n_users FROM t1
UNION ALL
SELECT 2, '{FUNNEL_STAGES[1]}', count(*) FROM t2
UNION ALL
SELECT 3, '{FUNNEL_STAGES[2]}', count(*) FROM t3
ORDER BY stage_idx
"""


def cohort_retention_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each later week, how many were active. The
    triangle every growth dashboard draws.

    Two aggregations and one join, all keyed on user_id; the
    (user, week) activity set is deduped *before* the join so the join
    input is bounded by users x weeks, not raw events."""
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count("*").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_ORACLE_SQL = """
WITH first AS (SELECT user_id,
                      CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
               FROM events GROUP BY user_id),
     activity AS (SELECT DISTINCT user_id,
                         CAST(date_trunc('week', ts) AS DATE) AS week
                  FROM events)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS INTEGER) AS week_offset,
       count(*) AS n_users
FROM activity JOIN first USING (user_id)
GROUP BY cohort_week, week
ORDER BY cohort_week, week_offset
"""
