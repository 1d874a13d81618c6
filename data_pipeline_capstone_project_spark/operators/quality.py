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

from ..sources.readers import load_table


class DataQualityError(AssertionError):
    pass


def require_rows(df: DataFrame, table: str = "<df>") -> int:
    n = df.count()
    if n < 1:
        raise DataQualityError(f"{table}: returned no rows")
    return n


def require_no_nulls(df: DataFrame, col: str, table: str = "<df>") -> int:
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
