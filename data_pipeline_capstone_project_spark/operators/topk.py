"""Per-group top-k and recent-N semantics (SURVEY W3 / W5 / ST6).

- W3: the reference ranks a user's pixel clusters by frequency and
  keeps 6 (``spark_image.py:32-37`` ``Counter.most_common``). Ties are
  pinned by an explicit unique tiebreaker (SURVEY §7 hard-part (d):
  ``most_common`` tie order is insertion order - nondeterministic
  under distribution, so the engine defines ties away instead).
- W5: "last 25 posts per user" / 180-day retention window
  (``README.md:21,37,154``).

Both are one ``row_number`` window = one shuffle on the group key.
At 100 TB the alternative (global sort, or groupBy + collect_list +
slice) is strictly worse; rank-filter prunes to k rows per key before
anything else happens downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table

TOP_K = 6
RECENT_N = 25
RETENTION_DAYS = 180


def top_k_per_group(
    df: DataFrame, group_col: str, order_cols, k: int
) -> DataFrame:
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def top_k_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-6 events per user by value (value≅cluster pixel count)."""
    events = load_table(spark, sf_dir, "events")
    return top_k_per_group(
        events.select("user_id", "event_id", "value"),
        "user_id",
        [F.col("value").desc(), F.col("event_id").asc()],
        TOP_K,
    )


TOP_K_ORACLE_SQL = f"""
SELECT user_id, event_id, value, rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= {TOP_K}
"""


def recent_n_per_user(
    df: DataFrame, user_col: str, ts_col: str, id_col: str, n: int, days: int
) -> DataFrame:
    """Newest ``n`` rows per user within the trailing ``days`` retention
    window (anchored at max ts for determinism - broadcast 1-row agg,
    maps to partition pruning on a date-partitioned lake)."""
    anchor = df.agg(F.max(ts_col).alias("__max_ts"))
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    return (
        df.join(F.broadcast(anchor))
        .filter(F.col(ts_col) >= F.col("__max_ts") - F.expr(f"INTERVAL {days} DAYS"))
        .drop("__max_ts")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
    )


def recent_n_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return recent_n_per_user(
        events.select("user_id", "event_id", "ts"),
        "user_id", "ts", "event_id", RECENT_N, RETENTION_DAYS,
    ).select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "rn")


RECENT_N_ORACLE_SQL = f"""
WITH anchor AS (SELECT max(ts) AS max_ts FROM events)
SELECT user_id, event_id, epoch_us(ts) AS ts_us, rn FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events, anchor
  WHERE ts >= max_ts - INTERVAL {RETENTION_DAYS} DAY
) WHERE rn <= {RECENT_N}
"""
