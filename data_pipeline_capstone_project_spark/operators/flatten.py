"""Ingest projection chains (SURVEY F1-F18).

``flatten_posts`` / ``prune_stats`` re-express the reference Lambdas'
dict surgery (``s3-to-es_aws.py:131-205``, ``statsApp.py:78-147``) as
pure column pipelines over the explicit superset schemas - every step
is a Catalyst expression, so the whole chain fuses into one
whole-stage-codegen projection over the scan.

``posts_flatten_query`` exercises the same operator chain over the
driver's ``events`` table (events≅posts; see FIXTURES.md §5) so the
DuckDB oracle can hash-check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import (
    coalesce_sentinel,
    extract_extension,
    media_source_url,
    store_key,
)
from ..sources.readers import load_table

IMAGE_STORE_PREFIX = "instagram_graph_image_store"


def flatten_posts(df: DataFrame) -> DataFrame:
    """Post JSON -> searchable document projection:

    F1 drop ig_id/username/is_comment_enabled (``s3-to-es_aws.py:174-176``)
    F3 owner_id = owner.id, drop owner (``:179,190``)
    F4 followers = owner.followers_count else -1 (``:185-189``)
    F5 id cast to string (``:182``)
    F6 image-store key (``:88-89``)
    F7 media extension from URL (``:92``)
    F8 media_url | thumbnail_url fallback (``:81-86``)
    """
    src = media_source_url(F.col("media_url"), F.col("thumbnail_url"))
    return (
        df.withColumn("id", F.col("id").cast("string"))
        .withColumn("owner_id", F.col("owner.id"))
        .withColumn("followers", coalesce_sentinel(F.col("owner.followers_count")))
        .withColumn(
            "fohr_media",
            store_key(IMAGE_STORE_PREFIX, F.col("owner.id"), F.col("id")),
        )
        .withColumn("media_ext", extract_extension(src))
        .drop("ig_id", "username", "is_comment_enabled", "owner")
    )


STATS_DROP_COLS = (
    # F2: ig_id + the 6 business click metrics (``statsApp.py:125-131``)
    "ig_id",
    "email_contacts",
    "phone_call_clicks",
    "text_message_clicks",
    "get_directions_clicks",
    "website_clicks",
)


def prune_stats(df: DataFrame) -> DataFrame:
    return df.drop(*STATS_DROP_COLS)


def posts_flatten_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flatten chain over events: JSON payload parse (F14), string
    id cast (F5), nested extract with sentinel (F4), computed store key
    (F6), day bucketing (F16, UTC)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("user_id").cast("string").alias("owner_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").alias("engagement"),
        F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(
            F.coalesce(k, F.lit(-1))
        ).alias("followers"),
        store_key("instagram_graph/posts", F.col("user_id"), F.col("event_id")).alias(
            "objectKey"
        ),
    )


POSTS_FLATTEN_ORACLE_SQL = """
SELECT CAST(event_id AS VARCHAR) AS id,
       CAST(user_id AS VARCHAR) AS owner_id,
       epoch_us(ts) AS ts_us,
       strftime(ts, '%Y-%m-%d') AS day,
       value AS engagement,
       CASE WHEN event_type = 'error' THEN -1
            ELSE coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), -1)
       END AS followers,
       'instagram_graph/posts/' || user_id || '/' || event_id AS objectKey
FROM events
"""
