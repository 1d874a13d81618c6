"""Streaming sessionization via the native ``session_window``
aggregation - the stateful merging-window operator the batch
gaps-and-islands query (:func:`..operators.analytics.sessionize_query`)
emulates with window functions.

Why the native operator matters at scale: session windows MERGE as
late events arrive (two sessions separated by < gap collapse when a
bridging event lands), which the batch rewrite only gets by full
recompute. In the stream, state is per (user, open-session) and the
watermark both bounds it and gates emission - a session is final only
when the watermark passes its close.

Emission gotcha this query pins down: in append mode nothing flushes
until the watermark ADVANCES past a session's end + gap, and
``availableNow`` termination does not fabricate a final watermark.
Sessions near the stream's end would stay buffered forever. The fix
(and the standard production pattern for bounded replays) is a
sentinel event far past the data's horizon that drags the watermark
over every real session; the sentinel's own (still-open) session is
filtered out of the result.

Oracle: identical 30-minute-gap semantics in DuckDB window SQL; the
session_window end is ``last event + gap`` by definition, mirrored as
``max(ts) + INTERVAL 30 MINUTE``.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.analytics import SESSION_GAP_MIN
from ..sources.readers import load_table

_GAP = f"{SESSION_GAP_MIN} minutes"
_SENTINEL_USER = -1


def streaming_session_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("ts", "user_id")
    work = tempfile.mkdtemp(prefix="stream_sess_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    qname = f"sess_{uuid.uuid4().hex[:8]}"
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    try:
        # Concurrent staging (guide §2.6); the mtime stamp guarantees
        # the sentinel (wave2, watermark advancer) batches AFTER the
        # data wave - processing it first would drop every real row
        # as late, so the order is load-bearing and now explicit.
        from . import stage_waves_concurrently

        wave_dirs = [os.path.join(src, "wave1"), os.path.join(src, "wave2")]
        stage_waves_concurrently(
            [
                lambda o=wave_dirs[0]: events.coalesce(1)
                .write.parquet(o),
                # watermark-advancing sentinel: one event far past the
                # horizon
                lambda o=wave_dirs[1]: events.select(
                    (F.max("ts") + F.expr("INTERVAL 365 DAYS")).alias("ts"),
                    F.lit(_SENTINEL_USER).alias("user_id"),
                ).write.parquet(o),
            ],
            wave_dirs,
        )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        sessions = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy("user_id", F.session_window("ts", _GAP).alias("w"))
            .agg(F.count("*").alias("n_events"))
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                sessions.writeStream.outputMode("append")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        res = (
            spark.table(qname)
            .filter(F.col("user_id") != _SENTINEL_USER)
            .select(
                "user_id",
                F.unix_micros("w.start").alias("session_start_us"),
                F.unix_micros("w.end").alias("session_close_us"),
                "n_events",
            )
        )
        # Distributed materialization at the harness boundary: the
        # staged inputs are deleted in the finally block, so the result
        # must be computed eagerly - but in the executors' block
        # manager (localCheckpoint), never as a driver collect(). At
        # 100x the result stays partitioned across the cluster.
        out = res.localCheckpoint(eager=True)
        spark.catalog.dropTempView(qname)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


STREAMING_SESSION_ORACLE_SQL = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {SESSION_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE)
         AS session_close_us,
       count(*) AS n_events
FROM sess
GROUP BY user_id, session_id
"""
