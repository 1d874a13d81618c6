"""Append-mode watermark semantics with VISIBLE late-data drops.

``streaming_window_agg`` runs its watermarked window in complete mode
(finite-input equivalence with the batch rollup); this entry pins the
other half of ST2/ST5: **append-mode emission and real late-row
eviction**, the part of watermarking production pipelines most often
get wrong. Four staged waves, ``maxFilesPerTrigger=1`` (one
micro-batch per wave, modification-time order):

1. **wave 1** - three quarters of ``events`` (``event_id % 4 != 0``).
2. **wave 2 (advancer)** - half the re-delivery quarter
   (``event_id % 8 == 0``). Spark applies to batch N the watermark
   computed at the END of batch N-1, so this batch runs with
   watermark still at epoch - nothing drops - but its CLOSE advances
   the watermark to ``M = floor_ms(max real ts) - DELAY`` (event-time
   stats are millisecond-granular; the floor is encoded in the
   oracle) and EMITS + EVICTS every window whose end <= M.
3. **wave 3 (the late re-delivery)** - the other half
   (``event_id % 8 == 4``). Its rows aimed at evicted windows are
   DROPPED (measured: emitted counts for closed windows exclude this
   wave exactly); rows whose window is still open are accepted in
   full, even when their own timestamp is below the watermark -
   late-row filtering in a streaming aggregation is WINDOW-level
   (window end vs watermark), not row-level (measured: the boundary
   window emits the all-waves count, not base + ts>=M).
4. **wave 4 (sentinel)** - two rows ``SENTINEL_DAYS`` past the
   corpus maximum. They push the final watermark beyond every real
   window, so the closing no-data micro-batch (``availableNow`` runs
   one) emits all remaining windows - making the batch-3 drops
   visible in the output instead of hidden above the watermark
   frontier. The sentinel's own window stays open and is never
   emitted.

The DuckDB oracle reconstructs exactly this emission log: windows
with end <= M carry base-wave counts (waves 1+2), later real windows
carry all-wave counts, the sentinel window is absent. Only order-free
aggregates (count / min) are emitted.

At scale: state is one row per open window; the watermark bounds it
regardless of stream length, and the drop is the contract that lets
it - this entry is the executable proof of that contract. Reference
tie-in: SURVEY ST2 - the reference absorbs ~25-day-late re-delivery
by key-overwrite; a windowed rollup bounds lateness explicitly, and
this is exactly what that boundary does.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import load_table

WINDOW = "1 day"
DELAY = "7 days"
SENTINEL_DAYS = 60


def streaming_late_data_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: append-mode 1-day windows under a 7-day
    watermark across the four waves; returns the emitted window log
    (window_start, n_events, min_event_id)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    work = tempfile.mkdtemp(prefix="stream_late_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    qname = f"late_{uuid.uuid4().hex[:8]}"
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    try:
        wave1 = events.filter(F.col("event_id") % 4 != 0)
        advancer = events.filter(F.col("event_id") % 8 == 0)
        late = events.filter(F.col("event_id") % 8 == 4)

        def _sentinel(eid: int) -> DataFrame:
            return events.agg(F.max("ts").alias("mx")).select(
                F.lit(eid).cast("long").alias("event_id"),
                F.expr(f"mx + INTERVAL {SENTINEL_DAYS} DAYS").alias("ts"),
                F.lit(eid).cast("long").alias("user_id"),
            )

        # Concurrent staging (guide §2.6). Wave ARRIVAL ORDER is the
        # whole point of this entry (watermark advancement between
        # batches); the helper's explicit mtime stamp guarantees the
        # 1→2→3→4 batching that the sequential writes only implied.
        from . import stage_waves_concurrently

        wave_dirs = [os.path.join(src, f"wave{i}") for i in (1, 2, 3, 4)]
        stage_waves_concurrently(
            [
                lambda o=wave_dirs[0]: wave1.coalesce(1).write.parquet(o),
                lambda o=wave_dirs[1]: advancer.coalesce(1).write.parquet(o),
                lambda o=wave_dirs[2]: late.coalesce(1).write.parquet(o),
                lambda o=wave_dirs[3]: _sentinel(-1).union(_sentinel(-2))
                .coalesce(1).write.parquet(o),
            ],
            wave_dirs,
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        windowed = (
            stream.withWatermark("ts", DELAY)
            .groupBy(F.window("ts", WINDOW).alias("w"))
            .agg(
                F.count("*").alias("n_events"),
                F.min("event_id").alias("min_event_id"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "n_events",
                "min_event_id",
            )
        )
        from . import sized_state_partitions

        with sized_state_partitions(spark):
            q = (
                windowed.writeStream.outputMode("append")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        res = spark.table(qname)
        out = res.localCheckpoint(eager=True)
        spark.catalog.dropTempView(qname)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


STREAMING_LATE_DATA_ORACLE_SQL = f"""
WITH m AS (
  SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
         - INTERVAL 7 DAY AS wm
  FROM events
),
buckets AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
         count(*) FILTER (event_id % 4 <> 0 OR event_id % 8 = 0)
             AS n_base,
         min(event_id) FILTER (event_id % 4 <> 0 OR event_id % 8 = 0)
             AS min_base,
         count(*) AS n_all,
         min(event_id) AS min_all
  FROM events
  GROUP BY 1
)
SELECT b.window_start,
       CASE WHEN b.window_start + INTERVAL 1 DAY <= m.wm
            THEN n_base ELSE n_all END AS n_events,
       CASE WHEN b.window_start + INTERVAL 1 DAY <= m.wm
            THEN min_base ELSE min_all END AS min_event_id
FROM buckets b, m
WHERE NOT (b.window_start + INTERVAL 1 DAY <= m.wm AND n_base = 0)
ORDER BY 1
"""
