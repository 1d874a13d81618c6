"""Keyword search (the reference's Elasticsearch reason-for-being:
"simple keyword search through... captions, comments, hashtags and
mentions", ``README.md:154``).

DataFrame equivalents of the three ES match flavors:
- substring match -> ``contains``
- token match -> tokenize + ``array_contains`` (what an inverted
  index does per-term; at scale this column pre-splits into an
  indexed/bucketed term table)
- pattern match -> ``rlike``

All three are scan-side predicates - Catalyst pushes the cheap
``contains`` into the parquet scan filter, and at 100 TB a dictionary-
encoded parquet text column short-circuits non-matching row groups
via min/max + dictionary pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

SUBSTRING = "join"
TOKEN = "merge"
PATTERN = "(fast|slow) (scan|filter)"


def keyword_search_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    return (
        docs.select(
            "doc_id",
            F.col("text").contains(SUBSTRING).alias("has_substring"),
            F.array_contains(toks, TOKEN).alias("has_token"),
            F.col("text").rlike(PATTERN).alias("has_pattern"),
        )
        .filter(F.col("has_substring") | F.col("has_token") | F.col("has_pattern"))
    )


KEYWORD_SEARCH_ORACLE_SQL = f"""
SELECT doc_id,
       contains(text, '{SUBSTRING}') AS has_substring,
       list_contains(string_split_regex(text, '\\s+'), '{TOKEN}') AS has_token,
       regexp_matches(text, '{PATTERN}') AS has_pattern
FROM documents
WHERE contains(text, '{SUBSTRING}')
   OR list_contains(string_split_regex(text, '\\s+'), '{TOKEN}')
   OR regexp_matches(text, '{PATTERN}')
"""
