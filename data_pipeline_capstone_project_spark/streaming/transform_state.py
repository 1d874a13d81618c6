"""Arbitrary stateful streaming via Spark 4's ``transformWithState``
(``transformWithStateInPandas`` + ``StatefulProcessor``) - the
successor API to ``applyInPandasWithState`` (which
:mod:`.stateful` exercises): named state variables with explicit
schemas instead of one opaque state tuple, lifecycle hooks, and
first-class TTL/timers.

Same two-wave harness and semantics as ``streaming_stateful`` so the
two APIs are directly comparable: per-user running aggregates across
exactly two deterministic micro-batches, each batch emitting one
progress row per active key. The value sum is kept in integer cents
(``floor(value * 100)``; floor, unlike half-up rounding, has one
portable definition) so cumulative state is BIGINT-exact and the
DuckDB oracle reconstructs the emission log bit-for-bit.

Reference tie-in: SURVEY §2.9 ST1/ST2 - the per-key Lambda upsert
state (``s3-to-es_aws.py:36-61``) generalized; this is what that
path needs the moment its semantics outgrow latest-wins.

**Environment seam (documented, like the multimodal codec):** the
transformWithState runtime speaks protobuf to its state server, and
``google.protobuf`` is not installed in this container (and cannot
be - no pip). The query therefore probes for protobuf at call time:
with it, the ``StatefulProcessor`` path runs; without it, the SAME
semantics run through ``applyInPandasWithState`` (state tuple =
the two BIGINT counters) - emission log, schema, and oracle are
identical on both paths, so the correctness gate pins whichever
path the runtime takes.

At scale: state is checkpointed per shuffle partition of the key;
``sized_state_partitions`` pins the partition count to key volume
(one RocksDB/HDFS store per partition per batch is the deployment
cost driver, exactly as for the other stateful streams).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..sources.readers import load_table

OUTPUT_SCHEMA = (
    "user_id long, batch_events long, cum_events long, cum_cents long"
)


def _has_transform_with_state_runtime() -> bool:
    """transformWithState needs google.protobuf for its state-server
    protocol; absent that, the applyInPandasWithState path runs."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False





def streaming_transform_state_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry query: wave 1 = all events, wave 2 = the
    ``event_id % 3 == 0`` re-delivery with value + 1000; one
    ``availableNow`` run with ``maxFilesPerTrigger=1`` executes
    exactly two micro-batches, and the full emission log is the
    result."""

    # Everything shipped to a Python worker is defined in-function so
    # cloudpickle serializes it BY VALUE: Spark 4's transformWithState
    # driver worker is a separate Python process that does not see the
    # session's addPyFile payload, so module-level definitions
    # (pickled by reference) raise ModuleNotFoundError there.
    def batch_reduce(pdfs) -> tuple[int, int]:
        """(row count, integer-cents sum) over pandas frames - the one
        order-free reduction both stateful APIs share."""
        import numpy as np

        n = 0
        cents = 0
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                cents += int(
                    np.floor(pdf["value"].to_numpy() * 100.0)
                    .astype(np.int64)
                    .sum()
                )
        return n, cents

    class RunningUserStats(StatefulProcessor):
        """Per-user ValueState fold: count + integer-cents sum. Only
        order-free integer reductions feed the state, so emission values
        cannot depend on row order within a batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "cum_events long, cum_cents long"
            )

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            n, cents = batch_reduce(rows)
            prev = self._agg.get()
            cum_n, cum_c = (0, 0) if prev is None else (prev[0], prev[1])
            cum_n += n
            cum_c += cents
            self._agg.update((cum_n, cum_c))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "batch_events": [n],
                    "cum_events": [cum_n],
                    "cum_cents": [cum_c],
                }
            )

        def close(self) -> None:
            pass

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    work = tempfile.mkdtemp(prefix="stream_tws_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    qname = f"tws_{uuid.uuid4().hex[:8]}"
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    try:
        wave1 = events
        wave2 = events.filter(F.col("event_id") % 3 == 0).select(
            "event_id", "user_id", (F.col("value") + 1000).alias("value")
        )
        # Concurrent staging (guide §2.6); mtime stamp pins the
        # wave1-before-wave2 batching the per-batch emissions need.
        from . import stage_waves_concurrently

        wave_dirs = [os.path.join(src, "wave1"), os.path.join(src, "wave2")]
        stage_waves_concurrently(
            [
                lambda o=wave_dirs[0]: wave1.coalesce(1).write.parquet(o),
                lambda o=wave_dirs[1]: wave2.coalesce(1).write.parquet(o),
            ],
            wave_dirs,
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        def running_user_stats(key, pdfs, state):
            """applyInPandasWithState twin of RunningUserStats: same
            fold, state tuple = the two BIGINT counters."""
            n, cents = batch_reduce(pdfs)
            cum_n, cum_c = state.get if state.exists else (0, 0)
            cum_n += n
            cum_c += cents
            state.update((cum_n, cum_c))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "batch_events": [n],
                    "cum_events": [cum_n],
                    "cum_cents": [cum_c],
                }
            )

        grouped = stream.groupBy("user_id")
        if _has_transform_with_state_runtime():
            emitted = grouped.transformWithStateInPandas(
                RunningUserStats(),
                OUTPUT_SCHEMA,
                "append",
                "none",  # processing/event time unused: deterministic
            )
        else:
            from pyspark.sql.streaming.state import GroupStateTimeout

            emitted = grouped.applyInPandasWithState(
                running_user_stats,
                OUTPUT_SCHEMA,
                "cum_events long, cum_cents long",
                "append",
                GroupStateTimeout.NoTimeout,
            )
        from . import sized_state_partitions

        with sized_state_partitions(spark):
            q = (
                emitted.writeStream.outputMode("append")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        res = spark.table(qname)
        # Executor-side materialization at the harness boundary (the
        # staged inputs vanish in finally) - localCheckpoint, never a
        # driver collect.
        out = res.localCheckpoint(eager=True)
        spark.catalog.dropTempView(qname)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# The relational reconstruction of the two-batch emission log: batch 1
# emits every user's wave-1 totals; batch 2 emits, for users with a
# re-delivered row, the re-delivery's deltas folded onto wave-1 state.
STREAMING_TRANSFORM_STATE_ORACLE_SQL = """
WITH w1 AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
w2 AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(floor((value + 1000) * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_id % 3 = 0 GROUP BY user_id
)
SELECT user_id, n AS batch_events, n AS cum_events, cents AS cum_cents
FROM w1
UNION ALL
SELECT w2.user_id, w2.n, w1.n + w2.n, w1.cents + w2.cents
FROM w2 JOIN w1 USING (user_id)
"""
