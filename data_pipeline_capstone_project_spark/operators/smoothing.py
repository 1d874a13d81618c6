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
