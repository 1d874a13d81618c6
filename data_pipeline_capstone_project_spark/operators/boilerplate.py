"""Corpus-wide paragraph-hash deduplication (CCNet-style line dedup)
that REWRITES documents, not just flags them.

CCNet (Wenzek et al. 2020) and RefinedWeb drop every repeated
paragraph after its first occurrence in corpus order - the standard
boilerplate-removal pass (headers, navigation chrome, license
blurbs) that runs before document-level dedup in an LLM training
pipeline. The driver corpus has no newlines, so "paragraphs" are
fixed 10-word segments relative to the document start - exact-copy
regions then share segment boundaries and the pass behaves exactly
like paragraph dedup on naturally-delimited text.

Distinct from :func:`..curation.corpus_dup_ngrams_query` (which only
MEASURES cross-document n-gram sharing): this operator keeps the
first occurrence of each segment, reconstructs the cleaned document
text, and reports per-document retention - the actual data
transformation a curator ships.

Scale shape: segments are (doc, idx, text) rows - linear in corpus
size. First-occurrence ranking is ONE hash-partitioned window on the
segment text (at 100 TB: partition by paragraph hash; skew is bounded
because a segment duplicated d times contributes d rows to one
partition, and pathological boilerplate can be pre-salted by a
frequency cap). Reconstruction is one groupBy(doc_id) - a second
linear shuffle. No self-joins, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

SEG_WORDS = 10


def line_dedup(docs: DataFrame) -> DataFrame:
    """Per-document cleaned text + retention stats after dropping every
    10-word segment already seen earlier in corpus (doc_id, seg_idx)
    order. Returns (doc_id, n_segments, kept_segments, cleaned_chars,
    cleaned_sig)."""
    from pyspark.sql.window import Window

    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    segs = words.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("w") / F.lit(SEG_WORDS)).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice("w", i * SEG_WORDS + 1, SEG_WORDS), " "
                ),
            )
        ).alias("seg_idx", "seg"),
    )
    first = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    ranked = segs.withColumn("rn", F.row_number().over(first))
    kept_seg = F.when(F.col("rn") == 1, F.struct("seg_idx", "seg"))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.count(F.when(F.col("rn") == 1, 1)).alias("kept_segments"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_seg)),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("cleaned"),
        )
        .select(
            "doc_id",
            "n_segments",
            "kept_segments",
            F.length("cleaned").cast("long").alias("cleaned_chars"),
            F.md5("cleaned").alias("cleaned_sig"),
        )
    )


def line_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return line_dedup(docs).orderBy("doc_id")


LINE_DEDUP_ORACLE_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(w[i * 10 + 1 : i * 10 + 10], ' ') AS seg
  FROM words, UNNEST(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS t(i)
),
ranked AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id,
       count(*) AS n_segments,
       count(*) FILTER (rn = 1) AS kept_segments,
       coalesce(length(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (rn = 1)),
                0) AS cleaned_chars,
       md5(coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (rn = 1),
                    '')) AS cleaned_sig
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
"""
