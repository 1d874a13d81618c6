"""Slowly-changing-dimension type-2 history build.

The reference's ``history`` fact collapses a user's time series into
date-ordered strings (``sql_queries.py:14-21``); its upsert path keeps
only the latest version of every key (W4, ``README.md:373,432``). The
natural warehouse generalization - and what a training-data pipeline
needs to reconstruct "the world as of time T" - is SCD2: every version
of a key kept, with ``[valid_from, valid_to)`` ranges and a
current-row flag.

Spark-first: one window over ``(key) ORDER BY (change_ts, seq)`` and a
``lead()`` gives each version's expiry - a single shuffle on the key,
no self-join. ``seq`` (here the order key) breaks same-timestamp ties
deterministically, which matters because distributed row order is not
reproducible otherwise. At 100 TB the window shuffle is the only
exchange, partitioned by the dimension key - exactly how the table
would already be bucketed in a real lakehouse."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table


def scd2(
    df: DataFrame, key: str, change_ts: str, seq: str, attrs: list[str]
) -> DataFrame:
    """Version each key's rows into [valid_from, valid_to) ranges;
    valid_to is null for the current row."""
    w = Window.partitionBy(key).orderBy(change_ts, seq)
    return df.select(
        key,
        *attrs,
        F.col(change_ts).alias("valid_from"),
        F.lead(change_ts).over(w).alias("valid_to"),
        F.lead(change_ts).over(w).isNull().alias("is_current"),
        F.row_number().over(w).alias("version"),
    )


def scd2_history_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order history as an SCD2 dimension: each customer's orders
    become versioned rows - the attribute tracked is the order's
    totalprice/status, valid until the customer's next order."""
    orders = load_table(spark, sf_dir, "orders")
    out = scd2(
        orders,
        key="o_custkey",
        change_ts="o_orderdate",
        seq="o_orderkey",
        attrs=["o_orderkey", "o_totalprice", "o_orderstatus"],
    )
    return out.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderstatus").alias("status"),
        "valid_from",
        "valid_to",
        "is_current",
        "version",
    )


SCD2_HISTORY_ORACLE_SQL = """
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       o_totalprice AS totalprice,
       o_orderstatus AS status,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current,
       row_number() OVER w AS version
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""
