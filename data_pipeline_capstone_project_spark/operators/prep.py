"""Training-data preparation operators: document chunking and PII
redaction (BASELINE.json north-star extensions; no counterpart in the
reference, which ships documents whole — `s3-to-es_aws.py:171-204`
indexes one post per document).

Both are pure fused projections of built-in string/array expressions:
no UDFs, no shuffle, scan-bound at 100 TB with full column pruning.
The chunker fans each document out to ~n_tokens/stride rows via a
generator, which Spark pipelines inside the same stage (no shuffle —
an Expand-like row multiplier between scan and sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

#: Sliding-window chunking geometry: 32-token windows every 24 tokens
#: (8-token overlap), the usual shape for long-context training splits.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def doc_chunking_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Start offsets come from ``sequence(0, n_tokens-1, stride)`` so the
    final (possibly short) tail window is kept — every token lands in
    at least one chunk. ``explode_outer`` (not ``explode``) avoids
    InferFiltersFromGenerate pushing an inferred ``size(...) > 0``
    predicate — and with it the whole split — into the scan (README
    lesson 3); the sequence is never empty (``split`` yields ``['']``
    for empty text), so outer == inner here.

    The token array is materialized in its own projection before the
    generator references it (README lesson 1), and chunk slices are
    bound to a column before being consumed twice (size + md5).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    starts = toks.select(
        "doc_id",
        "toks",
        F.explode_outer(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunks = starts.select(
        "doc_id",
        F.floor(F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.slice("toks", F.col("start") + 1, CHUNK_TOKENS).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        "start",
        F.size("chunk").alias("chunk_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
    )


DOC_CHUNKING_ORACLE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(range(0, len(toks), {CHUNK_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       start // {CHUNK_STRIDE} AS chunk_id,
       start,
       len(toks[start + 1 : start + {CHUNK_TOKENS}]) AS chunk_tokens,
       md5(array_to_string(toks[start + 1 : start + {CHUNK_TOKENS}], ' '))
         AS chunk_md5
FROM s
"""

# Redaction patterns — deliberately lookahead/backreference-free so the
# same source string compiles identically under Java regex (Spark) and
# RE2 (DuckDB).
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_redaction_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact URLs / emails / phone numbers from document text.

    The synthetic corpus contains no PII, so each document is first
    augmented with a deterministic doc_id-derived contact line — the
    redactor then has real work to do and the oracle can verify both
    the match counts and the md5 of the cleaned text. Replacement
    order matters: URLs first (their paths contain digits a phone
    pattern could nibble), then emails, then phones; placeholders are
    digit-free so passes cannot cascade.
    """
    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        sid,
        F.lit("@mail.example.com call +1 555-0"),
        sid,
        F.lit(" or visit https://data.example.com/d/"),
        sid,
        F.lit("?ref=x"),
    )
    a = docs.select("doc_id", aug.alias("aug"))
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("aug", URL_RE, "<URL>"),
            EMAIL_RE,
            "<EMAIL>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    c = a.select(
        "doc_id",
        F.regexp_count("aug", F.lit(URL_RE)).alias("n_urls"),
        F.regexp_count("aug", F.lit(EMAIL_RE)).alias("n_emails"),
        F.trim(F.regexp_replace(cleaned, r"\s+", " ")).alias("clean"),
    )
    return c.select(
        "doc_id",
        "n_urls",
        "n_emails",
        F.regexp_count("clean", F.lit("<PHONE>")).alias("n_phones"),
        F.length("clean").alias("clean_len"),
        F.md5("clean").alias("clean_md5"),
    )


PII_REDACTION_ORACLE_SQL = f"""
WITH a AS (
  SELECT doc_id,
         text || ' contact user' || doc_id
              || '@mail.example.com call +1 555-0' || doc_id
              || ' or visit https://data.example.com/d/' || doc_id
              || '?ref=x' AS aug
  FROM documents
), c AS (
  SELECT doc_id,
         len(regexp_extract_all(aug, '{URL_RE}')) AS n_urls,
         len(regexp_extract_all(aug, '{EMAIL_RE}')) AS n_emails,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(aug, '{URL_RE}', '<URL>', 'g'),
               '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'),
           '\\s+', ' ', 'g')) AS clean
  FROM a
)
SELECT doc_id, n_urls, n_emails,
       len(regexp_extract_all(clean, '<PHONE>')) AS n_phones,
       length(clean) AS clean_len,
       md5(clean) AS clean_md5
FROM c
"""
