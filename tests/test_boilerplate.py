from __future__ import annotations

import hashlib

from data_pipeline_capstone_project_spark.operators.boilerplate import (
    line_dedup,
    line_dedup_query,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_line_dedup_hand_case(spark):
    """First corpus-order occurrence of a segment survives; every
    later exact repeat (here: a full-document copy and a shared
    10-word boilerplate prefix) is removed, and the cleaned text is
    reconstructed in original segment order."""
    w = [f"w{i}" for i in range(10)]  # one exact 10-word segment
    tail_a = [f"a{i}" for i in range(10)]
    tail_b = [f"b{i}" for i in range(5)]  # short final segment
    doc0 = " ".join(w + tail_a)
    doc1 = " ".join(w + tail_b)  # repeats doc0's first segment
    doc2 = doc0  # exact copy: fully emptied
    docs = spark.createDataFrame(
        [(0, doc0), (1, doc1), (2, doc2)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in line_dedup(docs).collect()}

    assert rows[0]["n_segments"] == 2 and rows[0]["kept_segments"] == 2
    assert rows[0]["cleaned_sig"] == _md5(doc0)

    assert rows[1]["n_segments"] == 2 and rows[1]["kept_segments"] == 1
    assert rows[1]["cleaned_sig"] == _md5(" ".join(tail_b))
    assert rows[1]["cleaned_chars"] == len(" ".join(tail_b))

    assert rows[2]["n_segments"] == 2 and rows[2]["kept_segments"] == 0
    assert rows[2]["cleaned_chars"] == 0
    assert rows[2]["cleaned_sig"] == _md5("")


def test_line_dedup_conserves_segments(spark, sf_dir):
    """Corpus invariant: across the whole corpus, dropped segments ==
    total segments - distinct segment texts (each distinct segment
    survives exactly once)."""
    out = line_dedup_query(spark, sf_dir).collect()
    total = sum(r["n_segments"] for r in out)
    kept = sum(r["kept_segments"] for r in out)
    from pyspark.sql import functions as F
    from data_pipeline_capstone_project_spark.sources.readers import load_table
    from data_pipeline_capstone_project_spark.operators.boilerplate import SEG_WORDS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(F.split("text", " ").alias("w"))
    distinct = (
        words.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size("w") / F.lit(SEG_WORDS)).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice("w", i * SEG_WORDS + 1, SEG_WORDS), " "
                    ),
                )
            ).alias("seg")
        )
        .distinct()
        .count()
    )
    assert kept == distinct
    assert kept <= total
