"""Latest-wins upsert (SURVEY W4 / ST2).

The reference's whole data model is upsert-by-key: the API client
rewrites each user's latest 25 post files daily (``README.md:33-41``)
and the Lambda PUTs documents by id into Elasticsearch, newest write
winning (``s3-to-es_aws.py:36-61``, ``_version`` increments
``README.md:373,432``).

Spark-first equivalent: dedup with ``row_number`` over the key ordered
by recency - one shuffle on the key, no state. The same function is
reused inside the streaming ``foreachBatch`` merge
(:mod:`..streaming.upsert_stream`), which is how the per-record Lambda
path becomes incremental Structured Streaming.

Scale: the window partitions by the upsert key (high cardinality), so
parallelism is key-count, not file-count; skewed hot keys are split by
AQE. No global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table


def latest_wins(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_cols``
    (pass descending recency columns + a unique tiebreaker so the
    result is total-order deterministic)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_wins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: newest event per (user_id, event_type) -
    events≅post re-ingests, (user_id, event_type)≅document key,
    ts≅createdDate (S3 LastModified)."""
    events = load_table(spark, sf_dir, "events")
    deduped = latest_wins(
        events,
        ["user_id", "event_type"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    )
    return deduped.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )


LATEST_WINS_ORACLE_SQL = """
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type
      ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def upsert_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins with the audit signal an Elasticsearch upsert store
    maintains per document: ``version_count`` (the reference's
    ``_version`` - how many writes hit the key, ``README.md:373,432``,
    ``s3-to-es_aws.py:48-54``) and ``changed`` (did the newest write
    alter the payload vs the key's first write - the create-vs-update
    distinction of the ES document API).

    Spark-first: ONE aggregation, not a window - ``max_by``/``min_by``
    over the recency tuple plus ``count(*)`` all combine map-side, so
    the plan is a single partial-agg shuffle keyed by the upsert key.
    At 100 TB that is strictly better than the row_number window
    (which must materialize and sort every version of every key after
    the shuffle); latest_wins keeps the window form because it must
    return whole rows unchanged."""
    events = load_table(spark, sf_dir, "events")
    recency = F.struct(F.col("ts"), F.col("event_id"))
    agg = events.groupBy("user_id", "event_type").agg(
        F.max_by(F.struct("event_id", "ts", "value"), recency).alias("latest"),
        F.min_by(F.col("value"), recency).alias("first_value"),
        F.count(F.lit(1)).alias("version_count"),
    )
    return agg.select(
        "user_id",
        "event_type",
        F.col("latest.event_id").alias("event_id"),
        F.unix_micros("latest.ts").alias("ts_us"),
        F.col("latest.value").alias("value"),
        "version_count",
        (~F.col("latest.value").eqNullSafe(F.col("first_value"))).alias("changed"),
    )


UPSERT_AUDIT_ORACLE_SQL = """
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
       version_count, changed
FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type)
             AS version_count,
         (value IS DISTINCT FROM first_value(value) OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             AS changed
  FROM events
) WHERE rn = 1
"""
