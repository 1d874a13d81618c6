"""Per-key sequential recurrences (EWMA) as a grouped-map Pandas UDF.

An exponentially-weighted moving average is the canonical operator
Spark's declarative surface cannot express: ``y_t = f(y_{t-1}, x_t)``
with integer division is a true recurrence (the closed-form float
rewrite exists but changes the arithmetic). This is exactly the brief's
custom-operator fallback (b): ``applyInPandas`` over the key partition,
Arrow-batched, with the per-key scan sequential and keys parallel.

Determinism: the state is integer cents with the rational decay 4/5 -
``y_t = (4 * y_{t-1} + x_t) div 5`` - so every step is exact integer
arithmetic and the DuckDB oracle (a recursive CTE stepping the same
recurrence) matches bit-for-bit. A float EWMA would hash-flicker
because cumulative-window summation order differs between engines.

Scale: one shuffle (the groupBy), then per-key O(n) in a Python worker.
State per key is a single integer - this is the batch twin of the
``applyInPandasWithState`` streaming operator in
``streaming/stateful.py``, and the same loop runs unchanged there.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

EWMA_NUM = 4  # decay numerator
EWMA_DEN = 5  # decay denominator: y = (4*y + x) div 5


def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts_us", "event_id"])
    vals = pdf["cents"].to_numpy()
    out = vals.copy()
    acc = int(vals[0])
    for i in range(1, len(vals)):
        acc = (EWMA_NUM * acc + int(vals[i])) // EWMA_DEN
        out[i] = acc
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "ewma_cents": out,
        }
    )


def ewma_smoothing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return events.groupBy("user_id").applyInPandas(
        _ewma_group, "user_id long, event_id long, ewma_cents long"
    )


def ewma_smoothing_fused_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same integer EWMA recurrence folded ENTIRELY JVM-side: each
    key's events collapse to one sorted array (sort_array on the
    (ts, event_id, cents) struct - lexicographic, exactly the Python
    path's sort keys), one ``F.aggregate`` walks the recurrence
    appending to the output array, and the result explodes back to
    rows. No Python workers, no Arrow transfer - whole-stage codegen
    end to end; bit-identical to :func:`ewma_smoothing_query` and
    shares its recursive-CTE oracle.

    Trade-off vs the applyInPandas loop (measured at sf0.1, see
    BASELINE.md "EWMA alternatives"): the fold's array append is a
    copy per step - O(n^2) bytes per key - so it wins while per-key
    series are short (<= a few thousand rows) and loses to the O(n)
    numpy loop on very long keys. Both are one shuffle; pick by key
    length."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    per_key = events.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts_us", "event_id", "cents"))).alias(
            "seq"
        )
    )
    head = F.element_at("seq", 1)
    init = F.struct(
        head["cents"].alias("prev"),
        F.array(
            F.struct(
                head["event_id"].alias("event_id"),
                head["cents"].alias("ewma_cents"),
            )
        ).alias("out"),
    )
    # floor((4*prev + x)/5) == Python's // for the non-negative cents
    # domain, and 4*prev + x stays far below 2^53 so the double
    # division is exact.
    step = lambda acc, x: F.struct(  # noqa: E731
        F.floor((EWMA_NUM * acc["prev"] + x["cents"]) / EWMA_DEN)
        .cast("long")
        .alias("prev"),
        F.concat(
            acc["out"],
            F.array(
                F.struct(
                    x["event_id"].alias("event_id"),
                    F.floor((EWMA_NUM * acc["prev"] + x["cents"]) / EWMA_DEN)
                    .cast("long")
                    .alias("ewma_cents"),
                )
            ),
        ).alias("out"),
    )
    rest = F.slice("seq", 2, F.greatest(F.size("seq") - 1, F.lit(0)))
    folded = per_key.select(
        "user_id", F.aggregate(rest, init, step).getField("out").alias("out")
    )
    ex = folded.select("user_id", F.explode("out").alias("e"))
    return ex.select(
        "user_id",
        F.col("e.event_id").alias("event_id"),
        F.col("e.ewma_cents").alias("ewma_cents"),
    )


EWMA_ORACLE_SQL = f"""
WITH RECURSIVE base AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), rec AS (
  SELECT user_id, event_id, rn, cents AS ewma_cents FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.event_id, b.rn,
         ({EWMA_NUM} * r.ewma_cents + b.cents) // {EWMA_DEN}
  FROM rec r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
)
SELECT user_id, event_id, ewma_cents FROM rec
"""
