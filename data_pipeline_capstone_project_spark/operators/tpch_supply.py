"""TPC-H supply-side shapes (Q2 / Q11 / Q20) over a fact-derived
part-supplier relation.

The testdata has no ``partsupp`` table, so - exactly like the Q16
shape in ``tpch.py`` (``parts_supplier_query``) - these three queries
derive the part-supplier relation from ``lineitem``: the distinct
``(l_partkey, l_suppkey)`` pairs, with

- ``supply cost`` proxy = the minimum line price a supplier ever
  charged for the part (exact integer cents - no division, no
  decimal-precision divergence between engines), and
- ``avail qty`` proxy = the total quantity the supplier ever shipped
  of the part (quantities are integer-valued, so BIGINT-exact).

This completes the 22-query TPC-H shape coverage (the other 19 live
in ``tpch.py`` / ``relational.py``). Reference tie-in: the reference
has no supply-side analytics at all - its only relational query is
the history fact build (``airflow/plugins/helpers/sql_queries.py:2-30``)
- these shapes exist because a complete engine must plan
min-per-group selection (Q2), fraction-of-global-total filters (Q11)
and two-slice correlated quantity comparisons (Q20), which no other
registry entry exercises together.

Scale design notes per query sit in each docstring; the shared rule
is: prune the fact FIRST (broadcast semi-joins of the filtered dims),
then aggregate to the (partkey, suppkey) grain - one map-combinable
shuffle - and keep every correlated comparison decorrelated as a
grouped aggregate joined back, never a per-row subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

#: Q2 part filters: one type, a size band (p_size 1..50 in fixtures).
Q2_TYPE = "STANDARD"
Q2_MAX_SIZE = 10
#: Q2/Q20 supplier region.
Q2_REGION = "EUROPE"

#: Q11 region whose suppliers' stock is valued (canonical Q11 uses a
#: single nation; the fixtures spread as few as 10 suppliers over 25
#: nations at sf0.001, so a region - always populated at every SF -
#: keeps the query meaningful at all scales), and the value
#: threshold: keep parts whose stock value exceeds Q11_AVG_MULTIPLE x
#: the average per-part value. Canonical Q11 uses a fixed fraction of
#: the total and divides it by SF because a constant fraction goes
#: unreachable as the part count grows; an avg-relative threshold is
#: scale-free by construction (selects ~the same value-quantile at
#: every SF).
Q11_REGION = "ASIA"
Q11_AVG_MULTIPLE = 2

#: Q20 part-name prefix and the "surge" year.
Q20_NAME_PREFIX = "red"
Q20_YEAR_START = "1997-01-01"
Q20_YEAR_END = "1998-01-01"


def _price_cents() -> F.Column:
    """Line price in exact integer cents (prices carry 2 decimals)."""
    return F.round(F.col("l_extendedprice") * 100).cast("long")


def _region_suppliers(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """Suppliers located in ``region``: supplier ⋈ nation ⋈ region,
    all dims broadcast-sized (100 / 25 / 5 rows; dims stay small
    relative to the fact at any scale factor)."""
    nation = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


def min_cost_supplier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every part of one type/size band, the
    supplier(s) in a region offering it at the minimum supply cost -
    the min-per-group selection with the min computed once and joined
    back (decorrelated), never re-evaluated per row.

    Scale shape: the part filter is broadcast into the lineitem scan
    so only the ~filtered parts' lines survive to the (partkey,
    suppkey) roll-up - ONE map-combinable shuffle over a pruned fact;
    the per-part min is a second tiny aggregate over the roll-up
    (grain = pairs, already small), and suppliers join broadcast.
    Cost compare happens on exact integer cents, so float round-off
    cannot split or fake a min tie.
    """
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    sup = F.broadcast(_region_suppliers(spark, sf_dir, Q2_REGION))
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(_price_cents()).alias("cost_cents"))
    )
    min_cost = ps.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("cost_cents").alias("min_cost_cents")
    )
    return (
        ps.join(
            min_cost,
            (F.col("p_partkey") == F.col("mc_partkey"))
            & (F.col("cost_cents") == F.col("min_cost_cents")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            (F.col("cost_cents") / 100.0).alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


MIN_COST_SUPPLIER_ORACLE_SQL = f"""
WITH ps AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}
    AND r_name = '{Q2_REGION}'
  GROUP BY 1, 2, 3, 4, 5, 6
),
mc AS (
  SELECT p_partkey AS mc_partkey, min(cost_cents) AS min_cost_cents
  FROM ps GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       cost_cents / 100.0 AS supply_cost
FROM ps JOIN mc ON p_partkey = mc_partkey AND cost_cents = min_cost_cents
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def important_stock_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value at one region's
    suppliers exceeds a multiple of the region's average stock value -
    the fraction-of-global-total HAVING, with the total computed from
    the SAME per-part aggregate via a broadcast scalar (one pass over
    the derived relation, not two evaluations of the view).

    Value is exact BIGINT throughout: cost proxy in integer cents x
    integer-valued quantity, and the threshold compare is
    ``value > Q11_AVG_MULTIPLE * (total div n_parts)`` - integer
    floor-division both engines reproduce bit-identically (no 0.0001
    float fraction, and no value*count product that could overflow
    BIGINT at extreme scale).

    Scale shape: the region filter (broadcast) prunes lineitem to
    ~1/5 of the fact BEFORE the pair roll-up shuffle; the per-part
    value agg and the 1-row average both derive from the pair grain.
    """
    sup = F.broadcast(
        _region_suppliers(spark, sf_dir, Q11_REGION).select("s_suppkey")
    )
    pair = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(_price_cents()).alias("cost_cents"),
            F.sum("l_quantity").cast("long").alias("avail_qty"),
        )
    )
    value = pair.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum(F.col("cost_cents") * F.col("avail_qty")).alias("value_cents")
    )
    total = value.agg(
        F.expr("sum(value_cents) div count(*)").alias("avg_cents")
    )
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") > Q11_AVG_MULTIPLE * F.col("avg_cents"))
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            (F.col("value_cents") / 100.0).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "p_partkey")
    )


IMPORTANT_STOCK_ORACLE_SQL = f"""
WITH pair AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents,
         CAST(sum(l_quantity) AS BIGINT) AS avail_qty
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
  GROUP BY 1, 2
),
value AS (
  SELECT l_partkey AS ps_partkey,
         sum(cost_cents * avail_qty) AS value_cents
  FROM pair GROUP BY 1
)
SELECT ps_partkey AS p_partkey, value_cents / 100.0 AS stock_value
FROM value
WHERE value_cents > {Q11_AVG_MULTIPLE} *
      (SELECT sum(value_cents) // count(*) FROM value)
ORDER BY stock_value DESC, p_partkey
"""


def part_promotion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in a region whose shipments of a
    name-filtered part family SURGED in one year - the two-slice
    correlated quantity comparison (year slice vs all-time slice of
    the same fact, same grain), decorrelated into two aggregates over
    one pruned scan, then a semi-join into the supplier dim.

    The reference comparison is flipped versus canonical Q20
    (``avail > 0.5 * year_qty`` would pass almost every pair when
    "availability" is proxied by 7 years of shipments): here a pair
    qualifies when the year's quantity exceeds half its all-time
    quantity - ``2 * year_qty > total_qty``, integer-exact.

    Scale shape: the part-name filter broadcasts into the scan; both
    the year and all-time quantities come from ONE (partkey, suppkey)
    roll-up with a conditional sum (single shuffle, no second scan);
    the supplier output joins the (tiny) qualifying-supplier set
    semi-join style, keeping the dim untouched by the fact shuffle.
    """
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    pair = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").cast("long").alias("total_qty"),
            F.sum(
                F.when(
                    (F.col("l_shipdate") >= Q20_YEAR_START)
                    & (F.col("l_shipdate") < Q20_YEAR_END),
                    F.col("l_quantity"),
                ).otherwise(F.lit(0.0))
            )
            .cast("long")
            .alias("year_qty"),
        )
    )
    surging = (
        pair.filter(F.col("year_qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        _region_suppliers(spark, sf_dir, Q2_REGION)
        .join(surging, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )


PART_PROMOTION_ORACLE_SQL = f"""
WITH pair AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(l_quantity) AS BIGINT) AS total_qty,
         CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
                        AND l_shipdate <  TIMESTAMP '{Q20_YEAR_END}'
                       THEN l_quantity ELSE 0 END) AS BIGINT) AS year_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q2_REGION}'
  AND s_suppkey IN (SELECT l_suppkey FROM pair WHERE year_qty * 2 > total_qty)
ORDER BY s_name
"""
