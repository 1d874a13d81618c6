"""Custom Python Data Source: the reference's HTTP API-ingest seam as
a first-class Spark source.

The reference fetches media/stats over HTTP inside its Lambdas
(``s3-to-es_aws.py:101,113,121``, ``statsApp.py:117`` - SURVEY §2.1
S10, previously declared out of engine scope because a side-effecting
HTTP fetch is not a relational operator). Spark 4's Python Data Source
API
(``pyspark.sql.datasource``) is the idiomatic way to bring such an
ingest INTO the engine: the source declares its schema and partitions,
executors pull their own partition's pages in parallel, and the result
is a normal DataFrame that Catalyst plans over - no driver-side
fetch-then-parallelize, no RDD glue.

The network call itself is stubbed deterministically (same policy as
the multimodal codec seam): ``_fetch_page`` synthesizes the API page
from the page number with the md5 hash family shared with the rest of
the engine, so the DuckDB oracle can reproduce every row with
``range()`` + the identical md5 arithmetic. A real deployment replaces
``_fetch_page``'s body with the HTTP call; everything else -
partition planning, schema, parallelism, the downstream plan - is the
production shape.

Scale shape: one ``InputPartition`` per API page range; executors
fetch pages independently (the 1000-executor cluster fans the crawl
out with zero coordination); the per-user rollup after the source is
one map-combinable shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

API_ROWS = 2_000  # posts per crawl (fixture-scale constant)
API_PARTITIONS = 8
N_USERS = 200

_SCHEMA = (
    "post_id bigint, user_id bigint, like_count bigint, "
    "comment_count bigint, caption string, day int"
)


def _h(seed: str, i: int) -> int:
    """60-bit md5 integer, bit-identical to the engine/DuckDB family:
    ('0x' || substr(md5(seed || '|' || i), 1, 15))::BIGINT."""
    return int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16)


def _fetch_page(start: int, end: int) -> Iterator[tuple]:
    """Deterministic stand-in for the paged HTTP fetch (the seam a
    real deployment swaps for requests/graph-API calls)."""
    for i in range(start, end):
        yield (
            i,
            _h("user", i) % N_USERS,
            _h("likes", i) % 1_000,
            _h("comments", i) % 100,
            f"post {i}",
            _h("day", i) % 60,
        )


class SocialApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "social_api"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SocialApiReader":
        return SocialApiReader(self.options)


class SocialApiReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", API_ROWS))
        self.n_parts = int(options.get("partitions", API_PARTITIONS))

    def partitions(self):
        per = (self.rows + self.n_parts - 1) // self.n_parts
        return [
            InputPartition((p * per, min((p + 1) * per, self.rows)))
            for p in range(self.n_parts)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        start, end = partition.value
        return _fetch_page(start, end)


def register_social_api(spark: SparkSession) -> None:
    """Idempotent registration (the driver hands us vanilla sessions)."""
    spark.dataSource.register(SocialApiDataSource)


def api_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl the (stubbed) API through the custom source and roll up
    per-user engagement - the reference's get-posts-then-aggregate
    path as one declarative plan. ``sf_dir`` is unused: the API is an
    external system, not a fixture table."""
    register_social_api(spark)
    posts = spark.read.format("social_api").load()
    return (
        posts.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_posts"),
            F.sum("like_count").alias("total_likes"),
            F.sum("comment_count").alias("total_comments"),
            F.max("day").alias("latest_day"),
        )
    )


API_INGEST_ORACLE_SQL = f"""
WITH posts AS (
  SELECT i AS post_id,
         ('0x' || substr(md5('user|' || i), 1, 15))::BIGINT % {N_USERS} AS user_id,
         ('0x' || substr(md5('likes|' || i), 1, 15))::BIGINT % 1000 AS like_count,
         ('0x' || substr(md5('comments|' || i), 1, 15))::BIGINT % 100 AS comment_count,
         CAST(('0x' || substr(md5('day|' || i), 1, 15))::BIGINT % 60 AS INT) AS day
  FROM (SELECT unnest(range(0, {API_ROWS})) AS i)
)
SELECT user_id,
       count(*) AS n_posts,
       CAST(sum(like_count) AS BIGINT) AS total_likes,
       CAST(sum(comment_count) AS BIGINT) AS total_comments,
       max(day) AS latest_day
FROM posts
GROUP BY user_id
"""
