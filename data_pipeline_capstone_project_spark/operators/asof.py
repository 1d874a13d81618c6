"""As-of (point-in-time) enrichment (SURVEY J4).

The reference's spec: posts from Basic-connection accounts lack
follower counts, so the pipeline must "bring the sources together"
(``README.md:147``) - each post should carry the follower count from
the latest user-stats row at or before the post's timestamp (the
Lambda's ``-1`` sentinel, ``s3-to-es_aws.py:185-189``, is the hole this
fills).

Spark lacks a native as-of join. The scale-correct composition here is
the union-window pattern, NOT a join:

    union(left tagged, right tagged)
      -> window partitionBy(key) orderBy(ts, tiebreak)
      -> last(right_value, ignorenulls=True) rowsBetween(-inf, 0)
      -> filter to left rows

One shuffle on the key, linear scan per key, no range-explosion - a
join-based as-of (equi-join on key + filter ts_r <= ts_l + argmax)
materializes |posts| x |stats-per-user| intermediate rows, which at
100 TB is the difference between a working plan and an OOM. Within one
table the pattern degenerates to a single window, as below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table


def asof_enrich(
    df: DataFrame,
    key_col: str,
    ts_cols: list[Column],
    signal: Column,
    out_col: str,
) -> DataFrame:
    """Carry the last non-null ``signal`` (at-or-before, in ``ts_cols``
    total order) forward within each key partition."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*ts_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(signal, ignorenulls=True).over(w))


def asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each non-signup event enriched with the value of the user's
    latest signup event at or before it (signup≅daily stats row,
    value≅followers_count)."""
    events = load_table(spark, sf_dir, "events")
    enriched = asof_enrich(
        events,
        "user_id",
        [F.col("ts").asc(), F.col("event_id").asc()],
        F.when(F.col("event_type") == "signup", F.col("value")),
        "followers_asof",
    )
    return enriched.filter(F.col("event_type") != "signup").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "followers_asof",
    )


ASOF_ORACLE_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, followers_asof
FROM (
  SELECT *, last_value(CASE WHEN event_type = 'signup' THEN value END
                       IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS followers_asof
  FROM events
) WHERE event_type <> 'signup'
"""


def interval_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (the time-window attribution the reference's
    60-day ES range filter gestures at, generalized): every event is
    attributed to the order windows [o_orderdate, o_orderdate + 6d] of
    the same user, and windows are aggregated.

    Scale shape: the join carries an EQUI key (user) plus a range
    residual, so Catalyst plans a hash/sort-merge join on the key with
    the BETWEEN as a post-join filter - NO BroadcastNestedLoopJoin.
    A pure range join (no equi key) must first be binned to a bucket
    key (floor(ts / bucket)) to regain equi-join shape; that pattern is
    what `width`-bucketed band joins in the percentile operator use.
    Day-partitioned storage additionally prunes the scan to the window
    span at 100 TB.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("day"), "value"
    )
    # orders live in 1995-2001 while events live in Jan 2024: project
    # each order onto a deterministic window inside the event timeline
    # (orderkey-seeded start day, 7-day span, custkey folded onto the
    # event user domain).
    win_start = F.date_add(
        F.to_date(F.lit("2024-01-01")), (F.col("o_orderkey") % 25).cast("int")
    )
    windows = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("user_id"),
        win_start.alias("win_start"),
        F.date_add(win_start, 6).alias("win_end"),
    )
    # The requested output is a DECOMPOSABLE aggregate (count/sum) per
    # window, so the interval join never needs to materialize
    # event x window pairs: pre-aggregate events per (user, day),
    # explode each 7-day window to its member days, equi-join on
    # (user, day), re-aggregate per order. The naive range join
    # (equi key + BETWEEN residual) streams |events| x |windows| /
    # |users| candidate pairs through the residual - ~600M at sf0.1
    # with only 150 users, which also caps parallelism at 150 keys and
    # made the query collapse under concurrent load (r2 bench recorded
    # 6.8s vs 0.7s idle). This plan is two map-combinable shuffles plus
    # a broadcast join of the tiny per-day rollup; decimal addition is
    # exact so the regrouped sum matches the pairwise oracle
    # bit-for-bit. Non-aggregating interval joins still use the
    # equi+residual shape (see docstring above). No broadcast hint:
    # per_day is |users| x |days| - small here, arbitrarily large at
    # scale - so AQE's runtime size check makes the broadcast call.
    per_day = events.groupBy("user_id", "day").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
    )
    days = windows.select(
        "o_orderkey",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "win_start",
    ).select(
        "o_orderkey",
        "user_id",
        F.date_add(F.col("win_start"), F.col("i")).alias("day"),
    )
    return (
        days.join(per_day, ["user_id", "day"])
        .groupBy("o_orderkey")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
        )
    )


INTERVAL_JOIN_ORACLE_SQL = """
SELECT o_orderkey, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM (SELECT event_id, user_id, CAST(ts AS DATE) AS day, value FROM events) e
JOIN (SELECT o_orderkey, o_custkey % 150 AS user_id,
             DATE '2024-01-01' + INTERVAL (o_orderkey % 25) DAY AS win_start
      FROM orders) w
  ON e.user_id = w.user_id
     AND e.day >= CAST(w.win_start AS DATE)
     AND e.day <= CAST(w.win_start + INTERVAL 6 DAY AS DATE)
GROUP BY o_orderkey
"""


# --- nearest as-of (bidirectional) ----------------------------------------


def asof_nearest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of enrichment: each non-signup event takes
    the value of the user's temporally CLOSEST signup event - backward
    or forward - with ties to the earlier one. Generalizes J4 from
    "latest at-or-before" to symmetric nearest, the variant training
    pipelines need when joining sparse labels onto dense features.

    Same single-shuffle union-window shape as ``asof_enrich``: one
    window per direction over the same (user, ts, event_id) sort - the
    sort is reused by both frames, so the plan pays one Exchange + one
    Sort, never a range join."""
    events = load_table(spark, sf_dir, "events")
    sig_val = F.when(F.col("event_type") == "signup", F.col("value"))
    sig_ts = F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    enriched = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.last(sig_val, ignorenulls=True).over(w_back).alias("back_val"),
        F.last(sig_ts, ignorenulls=True).over(w_back).alias("back_ts"),
        F.first(sig_val, ignorenulls=True).over(w_fwd).alias("fwd_val"),
        F.first(sig_ts, ignorenulls=True).over(w_fwd).alias("fwd_ts"),
    ).filter(F.col("event_type") != "signup")
    back_d = F.col("ts_us") - F.col("back_ts")
    fwd_d = F.col("fwd_ts") - F.col("ts_us")
    use_back = F.col("fwd_ts").isNull() | (
        F.col("back_ts").isNotNull() & (back_d <= fwd_d)
    )
    return enriched.select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(use_back, F.col("back_val")).otherwise(F.col("fwd_val")).alias(
            "nearest_val"
        ),
        F.when(use_back, back_d).otherwise(-fwd_d).alias("delta_us"),
    )


ASOF_NEAREST_ORACLE_SQL = """
WITH enriched AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type = 'signup' THEN value END
                    IGNORE NULLS) OVER w_back AS back_val,
         last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END
                    IGNORE NULLS) OVER w_back AS back_ts,
         first_value(CASE WHEN event_type = 'signup' THEN value END
                     IGNORE NULLS) OVER w_fwd AS fwd_val,
         first_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END
                     IGNORE NULLS) OVER w_fwd AS fwd_ts
  FROM events
  WINDOW w_back AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_fwd AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id, ts_us,
       CASE WHEN fwd_ts IS NULL
                 OR (back_ts IS NOT NULL AND ts_us - back_ts <= fwd_ts - ts_us)
            THEN back_val ELSE fwd_val END AS nearest_val,
       CASE WHEN fwd_ts IS NULL
                 OR (back_ts IS NOT NULL AND ts_us - back_ts <= fwd_ts - ts_us)
            THEN ts_us - back_ts ELSE -(fwd_ts - ts_us) END AS delta_us
FROM enriched WHERE event_type <> 'signup'
"""
