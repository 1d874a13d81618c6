"""Explicit StructType schemas.

Two families:

1. Reference-domain schemas - the union ("superset") schema of the
   reference's Instagram post JSON variants (5 media types x 2
   connection types; reference ``README.md:45-96``) and the daily user
   stats JSON (``README.md:100-137``).  Schema-on-read with an explicit
   nullable superset replaces the reference's Elasticsearch dynamic
   mapping (``README.md:160``): variant-specific fields are simply null
   where absent.  Ids are int64-scale but ALWAYS strings (the reference
   casts explicitly, ``s3-to-es_aws.py:182``; draft DDL typing them int
   was a bug, ``create_tables.sql:4``).

2. Testdata schemas - the driver's TPC-H-ish parquet tables
   (``TESTDATA.md``), declared so readers never pay inference and so
   column pruning has a stable base.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
L = T.LongType()
I = T.IntegerType()
D = T.DoubleType()
TS = T.TimestampType()
B = T.BooleanType()

# --- reference domain ------------------------------------------------------

CHILD_SCHEMA = T.StructType(
    [_f("id", S), _f("media_type", S), _f("media_url", S)]
)

OWNER_SCHEMA = T.StructType(
    [_f("id", S), _f("username", S), _f("followers_count", L)]
)

#: Union schema of all post variants (IMAGE | CAROUSEL_ALBUM | VIDEO |
#: STORY_IMAGE | STORY_VIDEO, x Basic/Business connection).
POST_SCHEMA = T.StructType(
    [
        _f("id", S, False),
        _f("ig_id", S),
        _f("owner", OWNER_SCHEMA),
        _f("username", S),
        _f("is_comment_enabled", B),
        _f("caption", S),
        _f("hashtags", S),
        _f("mentioned_users", S),
        _f("media_type", S, False),
        _f("media_url", S),
        _f("thumbnail_url", S),
        _f("permalink", S),
        _f("shortcode", S),
        _f("timestamp", TS, False),
        _f("like_count", L),
        _f("comments_count", L),
        _f("views", L),
        _f("sticker_taps", L),
        _f("tap_backs", L),
        _f("swipe_ups", L),
        _f("impressions", L),
        _f("reach", L),
        _f("engagement", L),
        _f("saved", L),
        _f("video_view", L),
        _f("children", T.StructType([_f("data", T.ArrayType(CHILD_SCHEMA))])),
    ]
)

#: Daily per-user stats (basic ∪ business connection fields).
STATS_SCHEMA = T.StructType(
    [
        _f("id", S, False),
        _f("created_at", T.DateType(), False),
        _f("ig_id", L),
        _f("biography", S),
        _f("name", S),
        _f("username", S),
        _f("profile_picture_url", S),
        _f("website", S),
        _f("followers_count", L, False),
        _f("follows_count", L),
        _f("media_count", L),
        _f("impressions", L),
        _f("reach", L),
        _f("follower_count", L),
        _f("email_contacts", L),
        _f("phone_call_clicks", L),
        _f("text_message_clicks", L),
        _f("get_directions_clicks", L),
        _f("website_clicks", L),
        _f("profile_views", L),
    ]
)

#: Envelope columns added at ingest (reference Lambda adds objectKey /
#: createdDate / content_type / content_length, ``s3-to-es_aws.py:164-168``).
ENVELOPE_FIELDS = [
    _f("objectKey", S),
    _f("createdDate", TS),
    _f("content_type", S),
    _f("content_length", L),
]

#: Output row of the color pipeline (reference ``spark_image.py:165`` /
#: ``README.md:280-325``): per color {percentage, red, green, blue, hex}.
COLOR_SCHEMA = T.ArrayType(
    T.StructType(
        [
            _f("percentage", D),
            _f("red", I),
            _f("green", I),
            _f("blue", I),
            _f("hex", S),
        ]
    )
)

# --- driver testdata -------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([_f("r_regionkey", I), _f("r_name", S)]),
    "nation": T.StructType(
        [_f("n_nationkey", I), _f("n_name", S), _f("n_regionkey", I)]
    ),
    "customer": T.StructType(
        [
            _f("c_custkey", L),
            _f("c_name", S),
            _f("c_nationkey", I),
            _f("c_acctbal", D),
            _f("c_mktsegment", S),
        ]
    ),
    "supplier": T.StructType(
        [_f("s_suppkey", L), _f("s_name", S), _f("s_nationkey", I), _f("s_acctbal", D)]
    ),
    "part": T.StructType(
        [
            _f("p_partkey", L),
            _f("p_name", S),
            _f("p_brand", S),
            _f("p_type", S),
            _f("p_size", I),
            _f("p_retailprice", D),
        ]
    ),
    "orders": T.StructType(
        [
            _f("o_orderkey", L),
            _f("o_custkey", L),
            _f("o_orderstatus", S),
            _f("o_totalprice", D),
            _f("o_orderdate", TS),
            _f("o_orderpriority", S),
        ]
    ),
    "lineitem": T.StructType(
        [
            _f("l_orderkey", L),
            _f("l_partkey", L),
            _f("l_suppkey", L),
            _f("l_linenumber", I),
            _f("l_quantity", D),
            _f("l_extendedprice", D),
            _f("l_discount", D),
            _f("l_tax", D),
            _f("l_returnflag", S),
            _f("l_linestatus", S),
            _f("l_shipdate", TS),
        ]
    ),
    "events": T.StructType(
        [
            _f("event_id", L),
            _f("ts", TS),
            _f("user_id", L),
            _f("event_type", S),
            _f("value", D),
            _f("props", S),
        ]
    ),
    "documents": T.StructType(
        [
            _f("doc_id", L),
            _f("text", S),
            _f("lang", S),
            _f("source", S),
            _f("n_chars", L),
        ]
    ),
    "embeddings": T.StructType(
        [
            _f("vec_id", L),
            _f("embedding", T.ArrayType(T.FloatType())),
            _f("label", I),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
