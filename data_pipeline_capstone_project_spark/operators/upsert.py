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
