"""Data-quality assertion operators (SURVEY A10 / A11).

The reference's ``DataQualityOperator`` (``data_quality.py:20-46``)
checks (1) a table returns rows and (2) - intent - that the last column
has no NULLs. Check (2) is written as ``COUNT(*) - COUNT(-1)``, which
counts a non-null constant and is identically zero: a latent bug, the
gate can never fire. The engine implements the INTENDED check
(``count(*) - count(col)``) and keeps the buggy expression as a
documented column so the parity is visible.

Assertions are actions, not plans: both helpers run one tiny aggregate
(count + count(col) fuse into a single scan pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table


class DataQualityError(AssertionError):
    pass


def require_rows(df: DataFrame, table: str = "<df>") -> int:
    n = df.count()
    if n < 1:
        raise DataQualityError(f"{table}: returned no rows")
    return n


def require_no_nulls(df: DataFrame, col: str, table: str = "<df>") -> int:
    # Gate ACTION, not a plan node: the collect() is a 1-row aggregate
    # scalar (the violation count), never result data - the pattern is
    # safe at any scale because the aggregation happens cluster-side.
    violations = df.agg(
        (F.count("*") - F.count(col)).alias("violations")
    ).collect()[0]["violations"]
    if violations:
        raise DataQualityError(f"{table}.{col}: {violations} NULL rows")
    return 0


def quality_gates_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of gate metrics over orders (last DDL column
    o_orderpriority, mirroring the reference's last-column check)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("table_rows"),
        (F.count("*") - F.count("o_orderpriority")).alias("null_violations"),
        (F.count("*") - F.count(F.lit(-1))).alias("reference_buggy_check"),
    )


QUALITY_GATES_ORACLE_SQL = """
SELECT count(*) AS table_rows,
       count(*) - count(o_orderpriority) AS null_violations,
       count(*) - count(-1) AS reference_buggy_check
FROM orders
"""


def observed_write(df: DataFrame, metrics: dict[str, F.Column]):
    """Piggyback data-quality metrics on a pass the job is already
    making (A10/A11 without their own scan): attach an ``Observation``
    and materialize through the noop sink; returns the metrics dict.

    At 100 TB the difference between this and ``df.count()`` +
    ``df.filter(...).count()`` gates is N extra full scans vs zero -
    observe accumulates on the executors during the write itself,
    like Spark's own task metrics."""
    from pyspark.sql import Observation

    obs = Observation()
    named = [c.alias(n) for n, c in metrics.items()]
    df.observe(obs, named[0], *named[1:]).write.format("noop").mode(
        "overwrite"
    ).save()
    return obs.get


# --- full expectations suite -----------------------------------------------

RETENTION_CUTOFF = "2024-01-20"  # ST6: fixed reference "now" for determinism


def data_quality_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full expectations report - one row per constraint, with the
    violation count and pass flag. Generalizes the reference's two
    gates (A10 row-count, A11 null-check) to the constraint classes a
    warehouse load actually needs:

    - uniqueness (primary key: orders.o_orderkey)
    - referential integrity (orders.o_custkey -> customer.c_custkey,
      checked as a left-anti count, J3 reused as a validator)
    - null rate (events.props non-null)
    - domain/range (lineitem.l_discount within [0, 0.5])
    - freshness/volume (events table non-empty)

    Each check is a tiny aggregate; Catalyst fuses the per-table
    checks into one scan pass per table. At 100 TB this report is what
    gates a partition swap - and because it is a DataFrame, it can be
    written next to the data it describes."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")

    pk_dupes = (
        orders.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations"))
        .select(F.lit("orders_pk_unique").alias("check_name"), "violations")
    )
    fk_orphans = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count("*").alias("violations"))
        .select(F.lit("orders_fk_customer").alias("check_name"), "violations")
    )
    null_props = events.agg(
        (F.count("*") - F.count("props")).alias("violations")
    ).select(F.lit("events_props_not_null").alias("check_name"), "violations")
    discount_range = li.agg(
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1)
        ).alias("violations")
    ).select(F.lit("lineitem_discount_range").alias("check_name"), "violations")
    volume = events.agg(
        F.when(F.count("*") >= 1, F.lit(0)).otherwise(F.lit(1)).alias("violations")
    ).select(F.lit("events_nonempty").alias("check_name"), "violations")

    report = (
        pk_dupes.unionByName(fk_orphans)
        .unionByName(null_props)
        .unionByName(discount_range)
        .unionByName(volume)
    )
    return report.select(
        "check_name", "violations", (F.col("violations") == 0).alias("passed")
    ).orderBy("check_name")


DATA_QUALITY_SUITE_ORACLE_SQL = """
WITH checks AS (
  SELECT 'orders_pk_unique' AS check_name, count(*) AS violations
  FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
  UNION ALL
  SELECT 'orders_fk_customer', count(*)
  FROM orders o WHERE NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  UNION ALL
  SELECT 'events_props_not_null', count(*) - count(props) FROM events
  UNION ALL
  SELECT 'lineitem_discount_range',
         count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5)
  FROM lineitem
  UNION ALL
  SELECT 'events_nonempty',
         CASE WHEN count(*) >= 1 THEN 0 ELSE 1 END
  FROM events
)
SELECT check_name, CAST(violations AS BIGINT) AS violations,
       violations = 0 AS passed
FROM checks ORDER BY check_name
"""


def retention_prune_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention policy enforcement (ST6: the reference keeps 180 days
    of posts, ``README.md:154,185``): classify each day's events against a
    fixed cutoff and report retained vs expired volume per day - the
    exact scan a partition-pruned delete would run, as a dry-run
    report. On a date-partitioned lake the expired set is a partition
    list (metadata-only drop), never a row-level delete; the fixed
    cutoff date keeps the result deterministic for the oracle."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.max(
                F.when(F.col("ts") < RETENTION_CUTOFF, 1).otherwise(0)
            ).alias("expired"),
        )
        .orderBy("day")
    )


RETENTION_PRUNE_ORACLE_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
       max(CASE WHEN ts < TIMESTAMP '{RETENTION_CUTOFF}' THEN 1 ELSE 0 END)
         AS expired
FROM events GROUP BY 1 ORDER BY 1
"""


# --- k-anonymity gate ------------------------------------------------------

K_ANON = 5  # minimum group size for a quasi-identifier combination


def k_anonymity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per quasi-identifier combination (lang, source): the group
    size and the suppression verdict - groups smaller than K_ANON
    re-identify their members and must be suppressed or generalized
    before a corpus release (Sweeney 2002, the k-anonymity model).
    Emits every combination with its share of the corpus so the
    release report shows exactly what survives.

    Scale shape: ONE map-combinable groupBy on the quasi-identifier
    key; the output is bounded by the QI-combination cardinality
    (|langs| x |sources|), and the corpus share comes from a window
    sum over that tiny aggregate - the fact is never re-scanned."""
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return groups.select(
        "lang",
        "source",
        "n",
        (F.col("n") / total).alias("corpus_share"),
        (F.col("n") < K_ANON).alias("suppress"),
    )


K_ANONYMITY_ORACLE_SQL = f"""
WITH groups AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
)
SELECT lang, source, n,
       n / sum(n) OVER () AS corpus_share,
       n < {K_ANON} AS suppress
FROM groups
"""
