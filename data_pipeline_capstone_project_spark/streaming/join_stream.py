"""Stream-stream interval join: purchases attributed to the views
that preceded them.

The reference has no stream-stream joins (SURVEY §2.9 - its only
stateful semantic is keyed upsert); this is the engine extension that
completes the Structured Streaming surface: two independent streams,
each with its own watermark, joined on an equi key plus an event-time
range (view within the hour before the purchase) - the canonical
attribution query every event pipeline eventually needs.

Mechanics under the hood: both sides are buffered in keyed state;
the watermark pair bounds how long a row can wait for a match, which
is what lets Spark GC state - an unwatermarked stream-stream inner
join grows state forever. Here the range condition plus watermarks
tell the engine a view older than (watermark - 1 hour) can never
match a future purchase and is dropped.

Determinism for the oracle gate: the watermark delay (60 days)
exceeds the corpus's 30-day event span, so NO row is ever dropped as
late regardless of how files batch, and the two-wave-per-side ingest
must produce exactly the batch join the DuckDB oracle computes. A
production deployment tightens the delay to its real lateness bound -
that changes state size, not join semantics.
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

WATERMARK = "60 days"  # > full corpus span => provably no late drops
ATTRIBUTION_WINDOW = "INTERVAL 1 HOUR"

_SIDE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def streaming_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_join_")
    ckpt = os.path.join(work, "ckpt")
    qname = f"ssjoin_{uuid.uuid4().hex[:8]}"
    sides = {
        "views": events.filter(F.col("event_type") == "view"),
        "purchases": events.filter(F.col("event_type") == "purchase"),
    }
    try:
        # two waves per side -> the join must carry state across
        # micro-batches, not just match within one. The four staging
        # writes are independent single-task jobs dominated by launch +
        # commit latency (~1 s each sequential, r14 measurement), so
        # they run concurrently; the mtime stamp keeps each source's
        # wave1-before-wave2 arrival order deterministic.
        from . import stage_waves_concurrently

        writes, dirs = [], []
        for wave_idx, parity in ((1, 0), (2, 1)):
            for name, df in sides.items():
                side = df.select("event_id", "ts", "user_id")
                out = os.path.join(work, name, f"wave{wave_idx}")
                writes.append(
                    lambda s=side, p=parity, o=out: s.filter(
                        F.col("event_id") % 2 == p
                    ).coalesce(1).write.parquet(o)
                )
                dirs.append(out)
        stage_waves_concurrently(writes, dirs)
        views = (
            spark.readStream.schema(_SIDE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(work, "views", "*"))
            .withWatermark("ts", WATERMARK)
            .select(
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
                F.col("user_id").alias("view_user"),
            )
        )
        purchases = (
            spark.readStream.schema(_SIDE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(work, "purchases", "*"))
            .withWatermark("ts", WATERMARK)
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("user_id").alias("user_id"),
            )
        )
        joined = purchases.join(
            views,
            (F.col("user_id") == F.col("view_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(ATTRIBUTION_WINDOW)),
        )
        # Stream-stream join cost is dominated by per-partition state
        # stores (one per shuffle partition PER SIDE per batch, each
        # with checkpoint I/O), not by rows. Size the state partition
        # count to the stream's actual key volume - at this fixture
        # scale 8, on a 1000-executor cluster thousands - and restore
        # the session default afterwards. The partition count is baked
        # into the checkpoint at first start, so this is a
        # per-deployment sizing decision, not a tunable.
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                joined.writeStream.outputMode("append")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        res = spark.table(qname).select(
            "purchase_id",
            "view_id",
            "user_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("lag_us"),
        )
        # Distributed materialization at the harness boundary: the
        # staged inputs are deleted in the finally block, so the result
        # must be computed eagerly - but in the executors' block
        # manager (localCheckpoint), never as a driver collect(). At
        # 100x the result stays partitioned across the cluster.
        out = res.localCheckpoint(eager=True)
        spark.catalog.dropTempView(qname)  # free the memory-sink table
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


STREAMING_JOIN_ORACLE_SQL = """
SELECT p.event_id AS purchase_id,
       v.event_id AS view_id,
       p.user_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
FROM events p
JOIN events v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase'
 AND v.event_type = 'view'
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
"""
