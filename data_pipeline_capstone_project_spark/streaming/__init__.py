"""Streaming package. ``sized_state_partitions`` is the shared
deployment-sizing pattern: stateful micro-batch cost scales with the
number of state stores (one per shuffle partition per stateful
operator per batch, each with checkpoint I/O), not with rows - so the
partition count must be sized to the stream's key volume. At fixture
scale that is 8; on a 1000-executor cluster it is thousands. The count
is baked into the checkpoint at first start, making this a
per-deployment decision, not a tunable."""

import threading
from contextlib import contextmanager

from .upsert_stream import streaming_upsert_run, streaming_upsert_query  # noqa: F401

#: Serializes sized_state_partitions users. The helper mutates the
#: SESSION-GLOBAL spark.sql.shuffle.partitions for the duration of a
#: stream run (streaming reads the conf from the owning session at
#: query start - there is no per-query override), so two interleaved
#: uses from different threads would race on save/restore and any
#: concurrent batch query on the same session would silently run with
#: the stream's partition count. The lock makes concurrent stream
#: launches queue instead; batch work on OTHER threads of the same
#: session during a stream run is still the caller's responsibility
#: (run such work on spark.newSession(), which has its own SQLConf).
_CONF_LOCK = threading.Lock()


@contextmanager
def sized_state_partitions(spark, n: int = 8):
    with _CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
