"""Streaming package. ``sized_state_partitions`` is the shared
deployment-sizing pattern: stateful micro-batch cost scales with the
number of state stores (one per shuffle partition per stateful
operator per batch, each with checkpoint I/O), not with rows - so the
partition count must be sized to the stream's key volume. At fixture
scale that is 8; on a 1000-executor cluster it is thousands. The count
is baked into the checkpoint at first start, making this a
per-deployment decision, not a tunable."""

from contextlib import contextmanager

from .upsert_stream import streaming_upsert_run, streaming_upsert_query  # noqa: F401


@contextmanager
def sized_state_partitions(spark, n: int = 8):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
