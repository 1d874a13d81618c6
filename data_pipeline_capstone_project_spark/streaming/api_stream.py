"""Streaming ingest through the custom Python Data Source: the API
crawl as an incremental, checkpointed, exactly-once stream.

Batch twin: :mod:`..sources.api_source` (registry ``api_ingest``).
The reference's Lambda re-crawls and re-PUTs everything it sees
(``s3-to-es_aws.py``); the engine's streaming form consumes only NEW
pages each trigger, with the consumed offset in the checkpoint - the
incremental contract (SURVEY §2.9 ST1/ST2) applied to the API source
itself via ``DataSourceStreamReader``:

- ``initialOffset``/``latestOffset`` bracket each micro-batch; Spark
  persists the committed offset in the checkpoint, so a restarted
  crawl resumes where it stopped and NEVER re-fetches a page (the
  two-epoch harness proves it: epoch 2 grows the corpus and the
  per-user sums come out exactly once).
- ``partitions(start, end)`` splits the offset range into one
  ``InputPartition`` per API page -> executors fetch pages of one
  micro-batch in parallel, same fan-out as the batch reader.
- The parquet sink is idempotent per micro-batch (file-commit
  protocol), completing the exactly-once chain.

Scale shape: per-trigger work is proportional to NEW pages only;
state is one scalar offset in the checkpoint - nothing grows with
corpus size.
"""

from __future__ import annotations

import shutil
import tempfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from ..sources.api_source import API_ROWS, _SCHEMA, _fetch_page

PAGE_ROWS = 250
EPOCH1_ROWS = 1_200  # epoch 1 crawls this prefix; epoch 2 the rest


class SocialApiStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "social_api_stream"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> "SocialApiStreamReader":
        return SocialApiStreamReader(self.options)


class SocialApiStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", API_ROWS))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        return {"row": self.rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        return [
            InputPartition((p, min(p + PAGE_ROWS, hi)))
            for p in range(lo, hi, PAGE_ROWS)
        ] or [InputPartition((lo, lo))]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        return _fetch_page(lo, hi)

    def commit(self, end: dict) -> None:
        pass


def _register_stream_source(spark: SparkSession) -> None:
    """Register the source AND mark its modules for by-value
    cloudpickle. Unlike batch Python sources (planned inside the
    driver's own Python process), the STREAMING source runs in a
    separate long-lived runner process that unpickles the DataSource -
    a by-reference pickle would require this package on that process's
    import path, which a vanilla driver session (arbitrary cwd, no
    addPyFile propagation to the runner) does not guarantee. By-value
    pickling makes the source self-contained."""
    import sys

    from pyspark import cloudpickle

    from ..sources import api_source

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(api_source)
    spark.dataSource.register(SocialApiStreamSource)


def streaming_api_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch incremental crawl: epoch 1 ingests the first
    EPOCH1_ROWS posts, epoch 2 (same checkpoint) the remainder. The
    final per-user rollup is hash-compared against the SAME oracle as
    the one-shot batch ``api_ingest`` - any page fetched twice or
    skipped across the restart breaks the sums."""
    _register_stream_source(spark)
    work = tempfile.mkdtemp(prefix="api_stream_")
    sink, ckpt = f"{work}/sink", f"{work}/ckpt"
    try:
        for rows in (EPOCH1_ROWS, API_ROWS):
            q = (
                spark.readStream.format("social_api_stream")
                .option("rows", str(rows))
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = (
            spark.read.schema(_SCHEMA)
            .parquet(sink)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_posts"),
                F.sum("like_count").alias("total_likes"),
                F.sum("comment_count").alias("total_comments"),
                F.max("day").alias("latest_day"),
            )
        )
        # Distributed materialization before the temp sink disappears
        # (same harness-boundary pattern as the other self-staging
        # streams: executor-side localCheckpoint, never collect()).
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
