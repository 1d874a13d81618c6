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


EWMA_CHUNK = 64  # chunked-fold block size (see cost note below)


def _ewma_step(prev, cents):
    """One recurrence step as a JVM column expression. ``prev`` < 0 is
    the before-first-element sentinel (cents are non-negative), where
    the output is the element itself. floor((4*prev + x)/5) == Python's
    ``//`` for the non-negative domain, and 4*prev + x stays far below
    2^53 so the double division is exact."""
    return F.when(prev < 0, cents).otherwise(
        F.floor((EWMA_NUM * prev + cents) / EWMA_DEN).cast("long")
    )


def ewma_smoothing_fused_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same integer EWMA recurrence folded ENTIRELY JVM-side: each
    key's events collapse to one sorted array (sort_array on the
    (ts, event_id, cents) struct - lexicographic, exactly the Python
    path's sort keys), walked by higher-order functions, and the
    result explodes back to rows. No Python workers, no Arrow
    transfer; bit-identical to :func:`ewma_smoothing_query` and shares
    its recursive-CTE oracle.

    The walk is CHUNKED to kill the naive fold's quadratic append (an
    ``F.aggregate`` that appends one element per step copies the
    accumulated array every step - O(n^2) bytes per key): the sorted
    seq splits into EWMA_CHUNK-sized slices; one scalar-only fold over
    the chunks records each chunk's entry state (appending one LONG per
    chunk - O((n/C)^2) longs, negligible); then a per-chunk fold
    re-runs the recurrence from its recorded entry state, appending
    within the chunk only - O(C^2) per chunk, O(nC) total. At C=64 a
    100k-row key costs ~6.4M element copies instead of 10^10: the fold
    now beats the numpy loop in BOTH key-length regimes (measured,
    BASELINE.md "EWMA alternatives")."""
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
    nchunks = F.ceil(F.size("seq") / F.lit(EWMA_CHUNK)).cast("int")
    chunked = per_key.select(
        "user_id",
        F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda i: F.slice(F.col("seq"), i * EWMA_CHUNK + 1, EWMA_CHUNK),
        ).alias("chunks"),
    )
    # Pass 1: scalar-only fold over chunks -> state at each chunk entry
    # (bounds[i] = EWMA state before chunks[i]; -1 = nothing seen yet).
    bounds_init = F.struct(
        F.lit(-1).cast("long").alias("prev"),
        F.array().cast("array<long>").alias("bounds"),
    )
    with_bounds = chunked.select(
        "user_id",
        "chunks",
        F.aggregate(
            "chunks",
            bounds_init,
            lambda acc, ch: F.struct(
                F.aggregate(
                    ch, acc["prev"], lambda p, x: _ewma_step(p, x["cents"])
                ).alias("prev"),
                F.concat(acc["bounds"], F.array(acc["prev"])).alias("bounds"),
            ),
        )["bounds"].alias("bounds"),
    )
    # Pass 2: independent per-chunk folds from the recorded entry
    # states; appends stay within one chunk.
    out_init = lambda i: F.struct(  # noqa: E731
        F.element_at(F.col("bounds"), i + 1).alias("prev"),
        F.array().cast("array<struct<event_id:bigint,ewma_cents:bigint>>").alias(
            "out"
        ),
    )
    chunk_out = lambda ch, i: F.aggregate(  # noqa: E731
        ch,
        out_init(i),
        lambda a, x: F.struct(
            _ewma_step(a["prev"], x["cents"]).alias("prev"),
            F.concat(
                a["out"],
                F.array(
                    F.struct(
                        x["event_id"].alias("event_id"),
                        _ewma_step(a["prev"], x["cents"]).alias("ewma_cents"),
                    )
                ),
            ).alias("out"),
        ),
    )["out"]
    folded = with_bounds.select(
        "user_id", F.flatten(F.transform("chunks", chunk_out)).alias("out")
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
