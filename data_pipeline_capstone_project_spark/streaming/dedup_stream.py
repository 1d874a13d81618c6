"""Streaming deduplication: ``dropDuplicatesWithinWatermark`` over an
at-least-once delivery stream.

The reference's delivery model is at-least-once with heavy re-delivery
(each user's latest 25 post files rewritten daily, ``README.md:33-41``);
its Lambda path absorbs duplicates by idempotent keyed PUT. The
latest-wins merge (:mod:`.upsert_stream`) is one answer; this operator
is the other: drop exact re-deliveries *in the stream itself*, keyed by
event id, so downstream operators see each event exactly once.

Two deterministic micro-batches (``maxFilesPerTrigger=1``): wave 1 is
all events, wave 2 re-delivers the event_id % 4 == 0 subset verbatim
plus late duplicates. The emission log therefore equals DISTINCT over
wave 1 - what the DuckDB oracle computes.

At scale: dedup state is keyed by event_id in the state store (same
shuffle as any keyed stateful op); the watermark bounds how long a key
is remembered, trading memory for the re-delivery horizon (the
reference's horizon is 25 days). Without the watermark bound
(``dropDuplicates``) state grows forever - never ship that.
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

WATERMARK = "30 days"  # the reference's 25-day re-delivery horizon, rounded up


def streaming_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    work = tempfile.mkdtemp(prefix="stream_dedup_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    qname = f"dedup_{uuid.uuid4().hex[:8]}"
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    try:
        # Concurrent staging (guide §2.6); wave2 is a verbatim
        # re-delivery of a wave1 subset, so either arrival order keeps
        # exactly one copy of each event - the stamp just keeps the
        # batching deterministic.
        from . import stage_waves_concurrently

        wave_dirs = [os.path.join(src, "wave1"), os.path.join(src, "wave2")]
        stage_waves_concurrently(
            [
                lambda o=wave_dirs[0]: events.coalesce(1).write.parquet(o),
                lambda o=wave_dirs[1]: events.filter(
                    F.col("event_id") % 4 == 0
                ).coalesce(1).write.parquet(o),
            ],
            wave_dirs,
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        deduped = stream.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        from . import sized_state_partitions

        with sized_state_partitions(spark):
            q = (
                deduped.writeStream.outputMode("append")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        res = spark.table(qname).select(
            "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "value"
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


STREAMING_DEDUP_ORACLE_SQL = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, value FROM events
"""
