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
