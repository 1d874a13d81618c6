"""Scalar expression helpers (SURVEY §2.3 / §2.8).

Every helper is a pure Column-in/Column-out composition of built-in
``pyspark.sql.functions`` - JVM-side, whole-stage-codegen'd, zero
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex_color(red: Column, green: Column, blue: Column) -> Column:
    """``'#%02x%02x%02x' % (r, g, b)`` (reference ``spark_image.py:61-72``)
    as a native printf - replaces 12 lines of Python string math."""
    return F.format_string("#%02x%02x%02x", red, green, blue)


def media_source_url(media_url: Column, thumbnail_url: Column) -> Column:
    """Conditional media source select (reference ``s3-to-es_aws.py:81-86``):
    STORY_VIDEO posts carry only a thumbnail URL."""
    return F.coalesce(media_url, thumbnail_url)


def extract_extension(url: Column) -> Column:
    """File extension from a CDN URL (reference ``s3-to-es_aws.py:92``
    used ``r'\\.\\w{3,4}(?=\\?)'``; the lookahead is rewritten as a
    capture group, same match)."""
    return F.regexp_extract(url, r"(\.\w{3,4})\?", 1)


def store_key(prefix: str, *parts: Column) -> Column:
    """Computed storage key ``<prefix>/<part>/<part>...`` (reference
    ``s3-to-es_aws.py:88-89``)."""
    return F.concat_ws("/", F.lit(prefix), *[p.cast("string") for p in parts])


def coalesce_sentinel(col: Column, sentinel: int = -1) -> Column:
    """Null-safe extract with the reference's ``-1`` "metric not
    available on this connection type" sentinel
    (``s3-to-es_aws.py:185-189``, documented ``README.md:415``)."""
    return F.coalesce(col, F.lit(sentinel))


def url_decode(col: Column) -> Column:
    """URL-decode an object key (reference ``unquote_plus``,
    ``s3-to-es_aws.py:148``). Spark's ``url_decode`` handles %-escapes;
    ``+`` -> space is applied first to match unquote_plus."""
    return F.url_decode(F.replace(col, F.lit("+"), F.lit(" ")))
