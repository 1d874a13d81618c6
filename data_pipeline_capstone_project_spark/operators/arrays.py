"""Higher-order array-function surface (SURVEY §2.8 extension).

The reference touches arrays only at the edges (ordered collect for
the history time-series, per-element color transform,
``sql_queries.py:15-17`` / ``spark_image.py:61-72``); a complete engine
needs the full nested-collection algebra. This operator builds a
per-order price array once (one shuffle: the groupBy) and then runs the
whole higher-order-function family over it JVM-side - transform /
filter / aggregate(fold) / exists / slice / array_join / array_max -
inside whole-stage codegen, with zero Python and zero extra shuffles.

Exactness: money is cents as BIGINT (``decimal(18,2) * 100``), so every
derived quantity is integer arithmetic - bit-identical across engines.
Array order is pinned by sorting on the unique ``l_linenumber``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

BIG_CENTS = 5_000_000  # filter threshold: items over $50,000


def array_functions_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber").alias("ln"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("l_quantity").cast("long").alias("qty"),
        ).alias("item"),
    )
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("item")).alias("items")
    )
    # Materialize the projected arrays once - expressions repeated
    # across output columns re-evaluate per column (HOFs are
    # interpreted, so the struct-field transform is not free).
    grouped = grouped.select(
        "l_orderkey",
        F.transform(F.col("items"), lambda s: s.cents).alias("cents_arr"),
        F.transform(F.col("items"), lambda s: s.qty).alias("qtys_arr"),
    )
    cents = F.col("cents_arr")
    qtys = F.col("qtys_arr")
    return grouped.select(
        "l_orderkey",
        F.size(cents).alias("n_items"),
        F.aggregate(cents, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "total_cents"
        ),
        F.size(F.filter(cents, lambda x: x > BIG_CENTS)).alias("n_big"),
        F.aggregate(
            F.transform(cents, lambda x: (x * 95).cast("long") - (x * 95) % 100),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("disc_cents_x100"),
        F.aggregate(
            F.zip_with(cents, qtys, lambda c, q: c * q),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("weighted_cents"),
        F.array_join(F.slice(cents, 1, 3), ",").alias("first3"),
        F.exists(cents, lambda x: x > BIG_CENTS).alias("has_big"),
        F.array_max(cents).alias("max_cents"),
        F.array_min(cents).alias("min_cents"),
    )


ARRAY_FUNCTIONS_ORACLE_SQL = f"""
WITH items AS (
  SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
), per_order AS (
  -- full (ln, cents, qty) sort key: the driver's synthetic lineitem has
  -- DUPLICATE l_linenumber values per order, so ordering by ln alone is
  -- nondeterministic (Spark's struct sort breaks ties on cents, qty)
  SELECT l_orderkey,
         list(c ORDER BY l_linenumber, c, q) AS cents,
         list(q ORDER BY l_linenumber, c, q) AS qtys
  FROM items GROUP BY 1
)
SELECT l_orderkey,
       len(cents) AS n_items,
       CAST(list_sum(cents) AS BIGINT) AS total_cents,
       len(list_filter(cents, x -> x > {BIG_CENTS})) AS n_big,
       CAST(list_sum(list_transform(cents, x -> x*95 - (x*95) % 100)) AS BIGINT)
         AS disc_cents_x100,
       CAST(list_sum(list_transform(range(1, len(cents) + 1),
                               i -> cents[i] * qtys[i])) AS BIGINT) AS weighted_cents,
       array_to_string(cents[1:3], ',') AS first3,
       len(list_filter(cents, x -> x > {BIG_CENTS})) > 0 AS has_big,
       list_max(cents) AS max_cents,
       list_min(cents) AS min_cents
FROM per_order
"""


# --- map-type algebra ------------------------------------------------------

HOT_THRESHOLD = 5


def map_functions_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType algebra: build a per-user event_type -> count map and
    run the map-function family over it - map_from_entries,
    map_values/aggregate, transform_values, map_filter, map_concat,
    element_at. The reference stores no maps (SURVEY §1.2: "Map:
    none"); a complete engine needs the type and its operators.

    Maps are serialized to a canonical sorted "k:v,..." string at the
    output edge - map column binary layouts are not comparable across
    engines, the canonical string is. Same single-shuffle shape as any
    two-level aggregate."""
    events = load_table(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
    )
    grouped = per.groupBy("user_id").agg(m.alias("m"))

    def canon(mcol):
        return F.array_join(
            F.transform(
                F.map_entries(mcol),
                lambda e: F.concat(e.key, F.lit(":"), e.value.cast("string")),
            ),
            ",",
        )

    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    hot = F.map_filter(F.col("m"), lambda k, v: v >= HOT_THRESHOLD)
    merged = F.map_concat(
        F.col("m"), F.create_map(F.lit("zz_bonus"), F.lit(1).cast("long"))
    )
    return grouped.select(
        "user_id",
        F.size("m").alias("n_keys"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("total_events"),
        canon(doubled).alias("doubled"),
        canon(hot).alias("hot"),
        canon(merged).alias("merged"),
        F.coalesce(F.element_at(F.col("m"), "view"), F.lit(0)).alias("n_view"),
    )


MAP_FUNCTIONS_ORACLE_SQL = f"""
WITH per AS (
  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS total_events,
       array_to_string(list(event_type || ':' || (cnt * 2) ORDER BY event_type), ',')
         AS doubled,
       coalesce(array_to_string(list(event_type || ':' || cnt ORDER BY event_type)
                       FILTER (WHERE cnt >= {HOT_THRESHOLD}), ','), '') AS hot,
       array_to_string(list(event_type || ':' || cnt ORDER BY event_type), ',')
         || ',zz_bonus:1' AS merged,
       CAST(coalesce(max(CASE WHEN event_type = 'view' THEN cnt END), 0) AS BIGINT)
         AS n_view
FROM per GROUP BY user_id
"""
