"""Batch CDC MERGE (MERGE INTO semantics over a snapshot + change feed).

The reference is fundamentally an upsert system - the same S3 key is
rewritten daily and the newest write wins (``README.md:33-41``,
``s3-to-es_aws.py:48-54``). ``latest_wins`` covers the pure-upsert
case; this operator completes the family with the full three-verb
MERGE a warehouse target needs (Delta/Iceberg ``MERGE INTO``):

    WHEN MATCHED AND op = 'D' THEN DELETE
    WHEN MATCHED AND op = 'U' THEN UPDATE SET *
    WHEN NOT MATCHED AND op <> 'D' THEN INSERT *

Spark-first shape: MERGE is one left-anti join (untouched base rows)
plus a union with the surviving change rows - a single hash shuffle on
the merge key, no row-at-a-time upserts. At 100 TB the anti join is
the plan Catalyst already runs for J3-style idempotency checks, and
AQE handles the (typically tiny) change-feed side by broadcasting it.

The change feed is derived deterministically from the snapshot itself
(key mod 7 selects update/delete/insert victims) so the driver can
hash-check the merged result against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

# Synthetic insert keys live in the NEGATIVE key space: TPC-H orderkeys
# are strictly positive at every scale factor, so -k can never collide
# with a real key (a fixed positive offset would - orderkeys pass 100M
# well below SF100, silently breaking the merged-key uniqueness
# invariant while the oracle, repeating the same arithmetic, still
# matched).


def merge_cdc(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply an (op, *cols) change feed to ``base``: rows whose key
    appears in the feed are replaced (op='U') or dropped (op='D');
    op='I' rows are appended. Latest state only - the feed is assumed
    key-unique (dedupe upstream with latest_wins if it is not)."""
    survivors = base.join(changes.select(key), key, "left_anti")
    applied = changes.filter(F.col("op") != "D").drop("op")
    return survivors.unionByName(applied)


def cdc_merge_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    # Single-scan change feed: one CASE projection instead of three
    # filtered branches (a 3-way union re-scans the source per branch -
    # audit showed 6 parquet scans for what is logically 2 reads).
    k7 = F.col("o_orderkey") % 7
    changes = orders.filter(k7.isin(0, 1, 2)).select(
        F.when(k7 == 2, -F.col("o_orderkey"))
        .otherwise(F.col("o_orderkey"))
        .alias("o_orderkey"),
        F.when(k7 == 0, "U").when(k7 == 1, "D").otherwise("I").alias("op"),
        F.when(k7 == 0, "U")
        .when(k7 == 2, "N")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
        F.when(k7 == 0, "1-CDC-UPDATED")
        .when(k7 == 2, "5-CDC-INSERTED")
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return merge_cdc(orders, changes, "o_orderkey")


CDC_MERGE_ORACLE_SQL = """
WITH ch AS (
  SELECT o_orderkey, 'U' AS op, 'U' AS o_orderstatus, o_totalprice,
         '1-CDC-UPDATED' AS o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 'D', o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 1
  UNION ALL
  SELECT -o_orderkey, 'I', 'N', o_totalprice,
         '5-CDC-INSERTED'
  FROM orders WHERE o_orderkey % 7 = 2
)
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.o_orderkey = o.o_orderkey)
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM ch WHERE op <> 'D'
"""
