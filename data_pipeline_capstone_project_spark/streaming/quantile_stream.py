"""Incremental quantile maintenance over an event stream via the
mergeable fixed-bin histogram (the streaming twin of
``operators.analytics.quantile_rollup_query``).

The point of choosing a MERGEABLE sketch for percentiles is exactly
this operator: per micro-batch the stream folds its events into
(event_type, bin) integer counts and merges them into a persistent
store by re-aggregating two tiny tables - work per batch is
O(|batch| + |types| x bins), state is O(|types| x bins) forever, and
after any number of batches the store is BIT-IDENTICAL to the
histogram a from-scratch batch job would build. The registry entry
therefore shares ``QUANTILE_ROLLUP_ORACLE_SQL`` verbatim: the
incremental path is hash-compared against the recompute-the-world
semantics it replaces (same correctness pattern as
``streaming_lsh_dedup``).

At scale: the store is a keyed table (Delta/Iceberg) of a few
thousand rows regardless of corpus size; the per-batch merge is one
map-combinable aggregation; quantile extraction is driver-cheap and
can run on every trigger for a live dashboard.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.analytics import QR_BINS, QR_WIDTH, _qr_bin
from ..sources.readers import load_table

_STORE_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def _recover(store_dir: str) -> None:
    """Crash recovery for the promote protocol in
    :func:`histogram_merge_batch`: if a crash landed between demoting
    the live store to ``.old`` and promoting ``.tmp``, the previous
    epoch's store (data AND marker together) still exists under
    ``.old`` - restore it. The half-written ``.tmp`` is discarded; its
    epoch was never recorded so foreachBatch replays it."""
    old = store_dir + ".old"
    if not os.path.isdir(store_dir) and os.path.isdir(old):
        shutil.rmtree(store_dir + ".tmp", ignore_errors=True)
        os.replace(old, store_dir)


def _store(spark: SparkSession, path: str) -> DataFrame:
    _recover(path)
    if os.path.isdir(path):
        return spark.read.schema(_STORE_SCHEMA).parquet(path)
    return spark.createDataFrame([], _STORE_SCHEMA)


def _applied_epoch(store_dir: str) -> int:
    """Highest epoch already folded into the store (-1 if none).

    The marker lives INSIDE the store directory (underscore-prefixed,
    so Spark's parquet reader ignores it like ``_SUCCESS``), so the
    single ``os.replace`` that promotes a new store version swaps the
    data and its epoch marker together - there is no window where the
    store reflects an epoch the marker does not. The previous version
    is demoted to ``.old`` (not deleted) until the promote completes,
    so a crash at any point leaves a complete (data, marker) pair
    recoverable - see :func:`_recover`."""
    _recover(store_dir)
    marker = os.path.join(store_dir, "_last_epoch")
    if os.path.isfile(marker):
        with open(marker) as fh:
            return int(fh.read().strip())
    return -1


def histogram_merge_batch(
    spark: SparkSession, batch: DataFrame, store_dir: str, epoch_id: int
) -> None:
    """Fold one micro-batch into the persistent histogram store.

    Idempotent under foreachBatch's at-least-once contract: epoch ids
    are monotonically increasing per checkpoint and a retried batch
    replays with the SAME id, so any epoch <= the store's recorded
    high-water mark has already been merged and is skipped - a batch
    retry or query restart cannot double-count."""
    if epoch_id <= _applied_epoch(store_dir):
        return
    delta = batch.groupBy("event_type", _qr_bin().alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    merged = (
        _store(spark, store_dir)
        .unionByName(delta)
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # Compact rewrite: the store is O(|types| x bins) rows however
    # large the stream history - rewriting it wholesale per batch is
    # cheaper than any merge-on-read bookkeeping at this cardinality.
    tmp = store_dir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_last_epoch"), "w") as fh:
        fh.write(str(epoch_id))
    # Promote without a lost-store window: demote the live version to
    # .old (rename, not delete), promote tmp, THEN drop .old. A crash
    # anywhere leaves either the old or the new complete (data, marker)
    # pair on disk; _recover restores the .old pair if the promote
    # itself was interrupted.
    old = store_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(store_dir):
        os.replace(store_dir, old)
    os.replace(tmp, store_dir)
    shutil.rmtree(old, ignore_errors=True)


def streaming_quantile_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: three-wave incremental ingest of the events
    table; the final store's extracted p50/p95/p99 must hash-equal the
    batch quantile_rollup result (same oracle SQL)."""
    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    work = tempfile.mkdtemp(prefix="stream_quant_")
    src, ckpt, store_dir = (os.path.join(work, d) for d in ("src", "ckpt", "store"))
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    try:
        # coalesce(NULL type to '') so crc32 never returns NULL -
        # every row lands in exactly one wave even if the events
        # table ever carries NULL event_type. Staged concurrently
        # (guide §2.6): histogram merge is per-bin commutative, so
        # arrival order cannot change the final store.
        from . import stage_waves_concurrently

        wave_key = F.crc32(F.coalesce(F.col("event_type"), F.lit(""))) % 3
        wave_dirs = [os.path.join(src, f"wave{w}") for w in range(3)]
        stage_waves_concurrently(
            [
                lambda w=w, o=o: events.filter(wave_key == w)
                .coalesce(1).write.parquet(o)
                for w, o in enumerate(wave_dirs)
            ],
            wave_dirs,
        )
        # crc32-based wave split is deterministic but uneven; that is
        # the point - batches of different sizes and type mixes must
        # still merge to the exact batch histogram.
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        from . import sized_state_partitions

        with sized_state_partitions(spark):
            q = (
                stream.writeStream.foreachBatch(
                    lambda batch, epoch: histogram_merge_batch(
                        spark, batch, store_dir, epoch
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        from pyspark.sql.window import Window

        merged = _store(spark, store_dir)
        cum = merged.select(
            "event_type",
            "bin",
            F.sum("cnt").over(
                Window.partitionBy("event_type").orderBy("bin")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
            F.sum("cnt").over(Window.partitionBy("event_type")).alias("total"),
        )

        def q_bin(p: float):
            hit = F.when(F.col("cum") >= F.ceil(F.col("total") * p), F.col("bin"))
            return (F.min(hit) * QR_WIDTH).alias(f"p{int(p * 100)}_lo")

        out = cum.groupBy("event_type").agg(q_bin(0.5), q_bin(0.95), q_bin(0.99))
        # Materialize before the temp store disappears - executor-side,
        # never a driver collect (harness-boundary pattern shared with
        # the other self-staging streams).
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
