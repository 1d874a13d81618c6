"""Custom stateful streaming operator via ``applyInPandasWithState``
(the engine-level primitive the reference's per-key Lambda state would
need if its semantics ever outgrew latest-wins upsert; SURVEY §2.9
notes ST1/ST2 as the only stateful piece - this is the generalization).

Per-user running aggregates maintained in explicit GroupState across
micro-batches: each batch emits (user, batch_events, cum_events,
cum_max). The run is one ``availableNow`` query over two staged files
with ``maxFilesPerTrigger=1``, so exactly two deterministic
micro-batches execute - and the full emission log (batch-1 rows plus
batch-2 rows) is what the DuckDB oracle reconstructs relationally.

Only order-free per-batch reductions (count, max) feed the state, so
doubles cannot depend on accumulation order.

At scale: state lives in the checkpointed state store partitioned by
key (same shuffle as the groupBy); a timeout config (NoTimeout here)
becomes a TTL eviction policy for abandoned keys.
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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.readers import load_table

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("batch_events", T.LongType()),
        T.StructField("cum_events", T.LongType()),
        T.StructField("cum_max", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cum_events", T.LongType()),
        T.StructField("cum_max", T.DoubleType()),
    ]
)


def running_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows into the key's persistent state and emit
    one progress row. count/max only - mergeable and order-free."""
    n = 0
    mx: float | None = None
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            m = float(pdf["value"].max())
            mx = m if mx is None else max(mx, m)
    cum_n, cum_m = state.get if state.exists else (0, None)
    cum_n += n
    if mx is not None:
        cum_m = mx if cum_m is None else max(cum_m, mx)
    state.update((cum_n, cum_m))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [n],
            "cum_events": [cum_n],
            "cum_max": [cum_m],
        }
    )


def streaming_stateful_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: two deterministic micro-batches through real
    GroupState. Wave 1 = all events; wave 2 = the event_id % 3 == 0
    re-delivery with value + 1000 (same update-wave model as the
    streaming upsert)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    work = tempfile.mkdtemp(prefix="stream_state_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    qname = f"stateful_{uuid.uuid4().hex[:8]}"
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
        # One part-file per wave -> maxFilesPerTrigger=1 yields exactly
        # two micro-batches. Concurrent staging (guide §2.6); the
        # helper's mtime stamp pins wave1-before-wave2 batching, which
        # the per-batch emissions depend on.
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
        emitted = stream.groupBy("user_id").applyInPandasWithState(
            running_user_stats,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
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


STREAMING_STATEFUL_ORACLE_SQL = """
WITH w1 AS (
  SELECT user_id, count(*) AS n1, max(value) AS m1 FROM events GROUP BY 1
),
w2 AS (
  SELECT user_id, count(*) AS n2, max(value + 1000) AS m2
  FROM events WHERE event_id % 3 = 0 GROUP BY 1
)
SELECT user_id, n1 AS batch_events, n1 AS cum_events, m1 AS cum_max FROM w1
UNION ALL
SELECT w2.user_id, n2 AS batch_events, n1 + n2 AS cum_events,
       greatest(m1, m2) AS cum_max
FROM w2 JOIN w1 USING (user_id)
"""
