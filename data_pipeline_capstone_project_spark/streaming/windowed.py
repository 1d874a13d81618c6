"""Streaming windowed aggregation with a watermark (extends SURVEY
ST5: the reference recomputes its 60-day rolling aggregation in batch;
a modern training-data pipeline runs the same rollup continuously).

One-hour tumbling event-time windows over the ``events`` stream with a
one-hour watermark bounding state. The run uses ``availableNow`` (the
reference's batch-trigger mode, ST3) into a memory sink in complete
mode, so the finite result equals the batch GROUP BY over the same
window bucketing - which is exactly what the DuckDB oracle computes
(``time_bucket`` and Spark's ``window()`` are both epoch-aligned).

Only order-free aggregates (count / min / max) are emitted so double
results cannot depend on accumulation order across engines.

At scale: the windowed aggregate is hash-partial per micro-batch, the
watermark evicts window state one hour behind max event time, and the
sink becomes an append-mode keyed upsert (the K1 merge) instead of a
memory table.
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

WINDOW = "1 hour"
WATERMARK = "1 hour"


def streaming_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: real ``readStream`` -> watermark -> tumbling
    window -> memory sink, deterministic and oracle-checked."""
    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_window_")
    src = os.path.join(work, "src")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    qname = f"win_agg_{uuid.uuid4().hex[:8]}"
    try:
        events.select("event_id", "ts", "user_id", "event_type", "value").write.parquet(
            src
        )
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", WATERMARK)
            .groupBy(F.window("ts", WINDOW).alias("win"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )
        from . import sized_state_partitions

        with sized_state_partitions(spark):
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(qname)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        res = spark.table(qname).select(
            F.unix_micros("win.start").alias("win_start_us"),
            "event_type",
            "n_events",
            "min_value",
            "max_value",
        )
        # Materialize before the temp source dir disappears.
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


STREAMING_WINDOW_ORACLE_SQL = """
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS win_start_us,
       event_type,
       count(*) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
"""
