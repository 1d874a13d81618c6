"""Batch model inference over documents: the Arrow-batched scoring
seam a training-data pipeline runs at its largest scale (quality
filtering / reward scoring of every candidate document).

Architecture (the part that matters at 100 TB):
- **Featurize JVM-side.** Token/char/punct counts are built-in
  expressions inside whole-stage codegen; shipping raw text to Python
  to count words would move ~100x more bytes across Arrow than the
  3 int features do.
- **Infer in ``mapInPandas``.** The model sees columnar Arrow batches
  (numpy vectorized, zero row-at-a-time Python); swapping the linear
  closure for an ONNX session / torch module changes nothing about
  the plumbing, schema, or plan. This is the same seam as
  :mod:`.multimodal`'s decode path.
- **Repartition by parallelism first** - inference is CPU-bound, so
  its parallelism must not be hostage to input split count (same
  reasoning as dedup's ``_parallel_docs``).

The "model" here is deterministic rational arithmetic (min, divide,
multiply-add), so every engine computes bit-identical IEEE-754
doubles and the DuckDB oracle hash-compares exactly - transcendental
activations would differ in the last ulp across libm builds, which is
a model-portability fact worth pinning in a test suite anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

#: weights of the stand-in quality model
W_WORDS, W_CHARS, W_PUNCT = 0.4, 0.4, 0.2
CAP_WORDS, CAP_CHARS = 200.0, 1000.0

SCORE_SCHEMA = "doc_id long, score double"


def _score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The inference closure: numpy-vectorized over each Arrow batch.
    A real deployment loads the model once per worker here (outside
    the loop) and calls it per batch."""
    import numpy as np

    for pdf in batches:
        words = np.minimum(pdf["n_words"].to_numpy(dtype="float64"), CAP_WORDS)
        chars = np.minimum(pdf["n_chars"].to_numpy(dtype="float64"), CAP_CHARS)
        punct = pdf["n_punct"].to_numpy(dtype="float64")
        score = (
            W_WORDS * (words / CAP_WORDS)
            + W_CHARS * (chars / CAP_CHARS)
            + W_PUNCT / (1.0 + punct)
        )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "score": score})


def doc_score_inference_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    feats = docs.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).alias("n_words"),
        F.length("text").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
        ).alias("n_punct"),
    )
    return feats.mapInPandas(_score_batches, schema=SCORE_SCHEMA)


DOC_SCORE_ORACLE_SQL = f"""
WITH feats AS (
  SELECT doc_id,
         len(string_split_regex(text, '\\s+')) AS n_words,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
           AS n_punct
  FROM documents
)
SELECT doc_id,
       {W_WORDS} * (least(n_words, {CAP_WORDS}) / {CAP_WORDS})
     + {W_CHARS} * (least(n_chars, {CAP_CHARS}) / {CAP_CHARS})
     + {W_PUNCT} / (1.0 + n_punct) AS score
FROM feats
"""


# --- fused pure-SQL inference -------------------------------------------------
#
# The dual of the Arrow path above, after the operator-fusion idea in
# "Machine Learning Inference Pipeline Execution Using Pure SQL Based
# on Operator Fusion" (ICDE 2025, PAPERS.md): when the model is small
# enough to express as column arithmetic, fusing it INTO the scan
# beats any UDF - featurization + scoring run inside one
# whole-stage-codegen span, zero Python workers, zero Arrow transfer,
# and Catalyst can push/prune around the model like any expression.
# At 100 TB this is the cheapest possible inference shape; the Arrow
# seam above remains for models that genuinely need a runtime (ONNX /
# torch).
#
# Exactness: the weights are DYADIC rationals (numerator / 1024), so
# the margin is computed as PURE INT64 arithmetic (bias + sum of
# feature * numerator) followed by ONE exact division by 1024 - the
# oracle compare is integer-grade, with no float accumulation at all.

FUSED_DEN = 1024
#: (feature SQL fragment, weight numerator) - weight = num / 1024
FUSED_MODEL: tuple[tuple[str, int], ...] = (
    ("n_words", 13),
    ("n_chars", -1),
    ("n_punct", -24),
    ("n_digits", -8),
    ("has_kw", 512),
)
FUSED_BIAS_NUM = -256  # -0.25


def _fused_feature_cols():
    toks = F.split("text", r"\s+")
    return [
        F.size(toks).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
        ).cast("long").alias("n_punct"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[0-9]", ""))
        ).cast("long").alias("n_digits"),
        F.col("text").contains("join").cast("long").alias("has_kw"),
    ]


def fused_sql_inference_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the linear quality model fused into the scan as
    pure column arithmetic - one parquet scan, one codegen span, no
    exchange, no Python. tests/test_state_and_udtf.py pins the plan
    shape (no *EvalPython, no Exchange)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select("doc_id", *_fused_feature_cols())
    margin_num = F.lit(FUSED_BIAS_NUM).cast("long")
    for name, w in FUSED_MODEL:
        margin_num = margin_num + F.col(name) * F.lit(w).cast("long")
    return feats.select(
        "doc_id",
        *[name for name, _ in FUSED_MODEL],
        (margin_num.cast("double") / FUSED_DEN).alias("margin"),
        (margin_num > 0).alias("label"),
    )


def _fused_oracle() -> str:
    margin = " + ".join(
        [str(FUSED_BIAS_NUM)] + [f"{name} * {w}" for name, w in FUSED_MODEL]
    )
    names = ", ".join(name for name, _ in FUSED_MODEL)
    return f"""
WITH feats AS (
  SELECT doc_id,
         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
              AS BIGINT) AS n_punct,
         CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digits,
         CAST(contains(text, 'join') AS BIGINT) AS has_kw
  FROM documents
)
SELECT doc_id, {names},
       CAST(({margin}) AS DOUBLE) / {FUSED_DEN} AS margin,
       ({margin}) > 0 AS label
FROM feats
"""


FUSED_SQL_INFERENCE_ORACLE_SQL = _fused_oracle()
