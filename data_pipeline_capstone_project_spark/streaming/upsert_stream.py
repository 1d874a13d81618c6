"""Incremental latest-wins upsert via Structured Streaming
(SURVEY ST1/ST2 - the reference's per-S3-PUT Lambda -> ES document
upsert, ``s3-to-es_aws.py:131-205``, ``README.md:187-218``).

Architecture:
- ``readStream`` file source replaces S3 event notifications: new-file
  discovery + exactly-once tracking live in the streaming checkpoint
  (SURVEY O1 - the one optimization Catalyst does not give for free).
- ``foreachBatch`` merge: dedup the micro-batch by key, union with the
  current target table, keep the newest row per key (W4). Correctness
  under re-delivery/late data comes from key-overwrite, not from
  dropping late rows - the reference's model exactly (``README.md:33-41``:
  the same post file is rewritten for ~25 days; "Unless our pipeline
  fails 25 days in a row, we would not likely loose data", ``:527``).
- The merged snapshot is ``localCheckpoint``-materialized before
  overwriting the target path (lineage cut - never recompute from a
  path being overwritten). On a real cluster this merge is a
  transactional ``MERGE INTO`` against Delta/Iceberg keyed+partitioned
  by the upsert key; the logic in :func:`merge_batch` is unchanged,
  only the sink swaps.

State stays bounded with no watermark because the "state" IS the
target table (idempotent by key); streaming state in the engine's
sense is only the file-source log.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.upsert import latest_wins


def recover_table(target_dir: str) -> None:
    """Crash recovery for the promote protocol in :func:`merge_batch`:
    if a crash landed between demoting the live table to ``.old`` and
    promoting ``.tmp``, restore the previous complete version (the
    half-written tmp is discarded; the at-least-once replay re-merges
    the batch, and latest-wins is idempotent under re-merge)."""
    old = target_dir.rstrip("/") + ".old"
    if not os.path.isdir(target_dir) and os.path.isdir(old):
        shutil.rmtree(target_dir.rstrip("/") + ".tmp", ignore_errors=True)
        os.replace(old, target_dir)


def merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_dir: str,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    schema: T.StructType,
) -> None:
    """Latest-wins merge of one micro-batch into the target table.

    The table swap follows the same crash-safe promote protocol as the
    quantile store (write ``.tmp`` -> demote live to ``.old`` ->
    promote -> drop ``.old``): a crash at any instant leaves a
    complete table version on disk. No epoch marker is needed here -
    re-merging a replayed batch is a latest-wins no-op."""
    recover_table(target_dir)
    fresh = latest_wins(batch, key_cols, order_cols)
    if any(f.name == "_SUCCESS" or f.name.endswith(".parquet")
           for f in os.scandir(target_dir)) if os.path.isdir(target_dir) else False:
        existing = spark.read.schema(schema).parquet(target_dir)
        merged = latest_wins(existing.unionByName(fresh), key_cols, order_cols)
    else:
        merged = fresh
    # r15: no lineage-cut checkpoint needed - the merge plan reads the
    # LIVE table and writes to .tmp, and the live path is only swapped
    # AFTER the write returns, so the plan never reads a path being
    # overwritten. The previous eager localCheckpoint materialized the
    # merge twice per batch (checkpoint job + write job).
    tmp = target_dir.rstrip("/") + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    old = target_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(target_dir):
        os.replace(target_dir, old)
    os.replace(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)


def streaming_upsert_run(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    key_cols: Sequence[str],
    order_cols_builder,
) -> None:
    """One ``availableNow`` incremental run: picks up files not yet in
    the checkpoint log, merges them, terminates. Scheduling this is
    the reference's daily trigger (ST3); a continuous trigger is the
    per-record Lambda path (ST1)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _epoch: merge_batch(
                spark, batch, target_dir, key_cols, order_cols_builder(), schema
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: a REAL two-epoch streaming ingest whose final
    table is deterministic (and therefore DuckDB-oracle-checkable).

    Wave 1 = the events table (initial ingest). Wave 2 = the
    re-ingested third of the posts (event_id % 3 == 0) with newer
    createdDate (ts + 1000 days) and updated payload (value + 1000) -
    the reference's daily re-fetch of recent posts. Two separate
    availableNow runs against one checkpoint prove incremental
    new-file-only pickup; the result must equal latest-wins over the
    union (what the oracle computes relationally).
    """
    from ..sources.readers import load_table

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_upsert_")
    src, tgt, ckpt = (os.path.join(work, d) for d in ("src", "tgt", "ckpt"))
    os.makedirs(src)
    os.makedirs(tgt)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    key_cols = ["user_id", "event_type"]
    order = lambda: [F.col("ts").desc(), F.col("event_id").desc()]  # noqa: E731

    wave1 = events.select("event_id", "ts", "user_id", "event_type", "value")
    wave2 = (
        events.filter(F.col("event_id") % 3 == 0)
        .select(
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 1000 DAYS")).alias("ts"),
            "user_id",
            "event_type",
            (F.col("value") + 1000).alias("value"),
        )
    )
    try:
        from concurrent.futures import ThreadPoolExecutor

        from . import sized_state_partitions

        wave1.write.mode("overwrite").parquet(os.path.join(src, "wave1"))
        # r15 (guide §2.6, VERDICT r14 item 5a): wave 2 is staged while
        # run 1 consumes wave 1 - but OUTSIDE the {src}/* glob, so run
        # 1's file listing can never see a half-written wave (partial
        # part-files or _temporary entries would race an in-flight
        # listing). One atomic same-filesystem rename publishes the
        # complete wave between the runs; run 2's fresh listing picks
        # it up exactly as the sequential version did, so what the
        # entry proves (incremental new-file-only pickup across two
        # availableNow runs) is unchanged.
        wave2_stage = os.path.join(work, "wave2_stage")
        with sized_state_partitions(spark):
            with ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(
                    lambda: wave2.write.mode("overwrite").parquet(wave2_stage)
                )
                streaming_upsert_run(
                    spark, f"{src}/*", tgt, ckpt, schema, key_cols, order
                )
                fut.result()
            os.replace(wave2_stage, os.path.join(src, "wave2"))
            streaming_upsert_run(spark, f"{src}/*", tgt, ckpt, schema, key_cols, order)
        final = spark.read.schema(schema).parquet(tgt).select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
        # Distributed materialization at the harness boundary: the
        # staged inputs are deleted in the finally block, so the result
        # must be computed eagerly - but in the executors' block
        # manager (localCheckpoint), never as a driver collect(). At
        # 100x the result stays partitioned across the cluster.
        out = final.localCheckpoint(eager=True)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


STREAMING_UPSERT_ORACLE_SQL = """
WITH wave2 AS (
  SELECT event_id, ts + INTERVAL 1000 DAY AS ts, user_id, event_type,
         value + 1000 AS value
  FROM events WHERE event_id % 3 = 0
),
unioned AS (
  SELECT event_id, ts, user_id, event_type, value FROM events
  UNION ALL SELECT * FROM wave2
)
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type
      ORDER BY ts DESC, event_id DESC) AS rn
  FROM unioned
) WHERE rn = 1
"""
