"""End-to-end JSON-lake ingest (SURVEY §3.1, the Lambda path as one
declarative pipeline).

The reference's per-record path is: S3 PUT of a nested post JSON ->
Lambda parses, adds a file-metadata envelope, flattens ``owner``,
applies the ``-1`` followers sentinel, and upserts by id with the
newest write winning (``s3-to-es_aws.py:131-205``; update-heavy model
``README.md:33-41``).

This query materializes a two-wave JSON lake from the ``orders`` table
(wave 2 re-delivers a subset with changed values - the daily re-fetch),
then runs the whole ingest as one logical plan:

``read_json_lake`` (explicit schema, PERMISSIVE, ``_metadata`` envelope
F10) -> nested-struct flatten (F3) -> sentinel coalesce (F4) -> string
id cast (F5) -> latest-wins dedup (W4, ordered by the in-record fetch
time, not file mtime, so the result is deterministic).

Scale: the lake read is a plain schema-first JSON scan (splittable,
column-pruned); the only shuffle is the dedup window on the high-
cardinality id key. The envelope costs nothing - ``_metadata`` is
populated from the scan's own file listing.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.upsert import latest_wins
from .readers import load_table, read_json_lake

LAKE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("fetched_at", T.LongType()),
        T.StructField("caption", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField(
            "owner",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("followers_count", T.LongType()),
                ]
            ),
        ),
    ]
)


def _wave(orders: DataFrame, n: int) -> DataFrame:
    """Wave ``n`` of the daily re-fetch: wave 1 = every order, wave 2 =
    the id % 5 == 0 subset re-delivered with price + 1000 (the changed
    field) and a later fetch time."""
    df = orders
    bump = F.lit(0.0) if n == 1 else F.lit(1000.0)
    if n == 2:
        df = df.filter(F.col("o_orderkey") % 5 == 0)
    return df.select(
        F.col("o_orderkey").alias("id"),
        F.lit(n).alias("fetched_at"),
        F.col("o_orderpriority").alias("caption"),
        (F.col("o_totalprice") + bump).alias("price"),
        F.struct(
            F.col("o_custkey").alias("id"),
            # every 7th record lacks followers (Basic-connection posts,
            # README.md:149) - exercises the sentinel path
            F.when(F.col("o_orderkey") % 7 != 0, F.col("o_custkey") * 10)
            .alias("followers_count"),
        ).alias("owner"),
    )


def json_lake_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    work = tempfile.mkdtemp(prefix="json_lake_")
    try:
        for n in (1, 2):
            _wave(orders, n).write.json(os.path.join(work, f"wave{n}"))
        lake = read_json_lake(spark, f"{work}/*", LAKE_SCHEMA)
        flat = lake.select(
            F.col("id").cast("string").alias("id"),  # F5: int64-unsafe ids
            "fetched_at",
            "caption",
            "price",
            F.col("owner.id").alias("owner_id"),  # F3 flatten
            F.coalesce(F.col("owner.followers_count"), F.lit(-1)).alias(
                "followers"
            ),  # F4 sentinel
            # envelope present-and-sane (objectKey/content_length values
            # are temp-path-dependent; assert shape, not value)
            (
                F.col("objectKey").isNotNull() & (F.col("content_length") > 0)
            ).alias("envelope_ok"),
        )
        deduped = latest_wins(
            flat, ["id"], [F.col("fetched_at").desc()]
        )
        # Materialize before the temp lake dir disappears.
        out = deduped.select(
            "id", "owner_id", "followers", "price", "envelope_ok"
        )
        # Distributed materialization at the harness boundary: the
        # staged inputs are deleted in the finally block, so the result
        # must be computed eagerly - but in the executors' block
        # manager (localCheckpoint), never as a driver collect(). At
        # 100x the result stays partitioned across the cluster.
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


JSON_LAKE_INGEST_ORACLE_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) AS id,
       o_custkey AS owner_id,
       CASE WHEN o_orderkey % 7 != 0 THEN o_custkey * 10 ELSE -1 END
           AS followers,
       o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 1000.0 ELSE 0.0 END
           AS price,
       true AS envelope_ok
FROM orders
"""
