"""Deduplication operators over ``documents`` (BASELINE.json
north-star: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Design for 100 TB:
- **Exact** dedup is a hash-groupBy on a content signature - one
  shuffle on the signature, map-side combinable.
- **MinHash signatures are computed as pure column expressions**
  (``transform``/``array_min`` over the shingle array) - no explode,
  no extra shuffle, whole signature in one projection pass. Only the
  tiny (doc, band, bucket) table is exploded (BANDS rows/doc).
- **LSH band join** turns the quadratic all-pairs problem into an
  equi-join on (band, bucket): candidates are only docs sharing a
  bucket. Exact Jaccard verification then runs on candidates only.
- The exact n-gram Jaccard operator (the all-pairs shingle join) is
  the *verification* path and the small-scale oracle; at scale you run
  the LSH operator, which calls the same verifier on its candidates.

All hashes are md5-derived (portable: the DuckDB oracle computes
bit-identical signatures), so even the LSH bucketing - normally
"engine-private" randomness - is fully hash-checked by the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .text import md5_word_hash

SHINGLE_N = 3
NUM_HASHES = 16
NUM_BANDS = 8  # 8 bands x 2 rows: P(candidate) = 1-(1-j^2)^8
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 48
SIMHASH_BLOCKS = 4  # Hamming-LSH: d <= 3 pairs share >= 1 of 4 blocks
SIMHASH_MAX_DIST = 3


def shingles_col(text: Column, n: int = SHINGLE_N) -> Column:
    """Distinct n-word shingles of ``text`` (empty array if < n words)."""
    w = F.split(text, r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])
        )
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", shingles_col(F.col("text")).alias("shs")).filter(
        F.size("shs") > 0
    )


# --- exact dedup -----------------------------------------------------------

def dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a canonicalized content signature (md5 of the
    sorted distinct word set - catches reorderings, the synthetic
    corpus's duplication mode). Keeps the minimum doc_id per group."""
    docs = load_table(spark, sf_dir, "documents")
    sig = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", r"\s+"))), "|"))
    return (
        docs.select(sig.alias("sig"), "doc_id")
        .groupBy("sig")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("dup_count"))
    )


DEDUP_EXACT_ORACLE_SQL = """
SELECT md5(array_to_string(list_sort(list_distinct(
         string_split_regex(text, '\\s+'))), '|')) AS sig,
       min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1
"""


# --- exact n-gram Jaccard (all candidate pairs) ----------------------------

def _jaccard_pairs(shx: DataFrame, sizes: DataFrame, candidates: DataFrame | None) -> DataFrame:
    """Exact Jaccard over shingle sets for (doc_a < doc_b) pairs;
    restricted to ``candidates`` when given (the LSH path)."""
    a = shx.select(F.col("doc_id").alias("doc_a"), "sh")
    b = shx.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = a.join(b, "sh").filter(F.col("doc_a") < F.col("doc_b"))
    if candidates is not None:
        pairs = pairs.join(candidates, ["doc_a", "doc_b"], "left_semi")
    common = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("common"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def dedup_ngram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= 0.5. The shingle
    equi-join only materializes pairs that share >= 1 shingle, not the
    |docs|^2 cross product; at scale the LSH operator below bounds the
    candidate set further."""
    sh = _doc_shingles(spark, sf_dir)
    shx = sh.select("doc_id", F.explode("shs").alias("sh"))
    sizes = sh.select("doc_id", F.size("shs").alias("n"))
    return _jaccard_pairs(shx, sizes, None)


_ORACLE_SHINGLES = f"""
tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - {SHINGLE_N - 2}),
           i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' '))) AS shs
  FROM tok WHERE len(w) >= {SHINGLE_N}
),
shx AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
sizes AS (SELECT doc_id, len(shs) AS n FROM sh)
"""

DEDUP_NGRAM_ORACLE_SQL = f"""
WITH {_ORACLE_SHINGLES},
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shx a JOIN shx b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       common / (sa.n + sb.n - common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common / (sa.n + sb.n - common) >= {JACCARD_THRESHOLD}
"""


# --- MinHash + LSH ---------------------------------------------------------

def minhash_signature(shs: Column) -> Column:
    """16-element MinHash signature as a single column expression:
    sig[i] = min over shingles of h_i(s), h_i = md5(i || '|' || s)
    truncated to 60 bits. No explode - one projection."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(NUM_HASHES - 1)),
        lambda i: F.array_min(F.transform(shs, lambda s: md5_word_hash(s, seed=i))),
    )


def lsh_bands(sig_df: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) - bucket is the md5 of the band's
    signature slice."""
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(NUM_BANDS - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                        lambda h: h.cast("string"),
                    ),
                )
            ).alias("bucket"),
        ),
    )
    return sig_df.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def dedup_minhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, exact-verified: signature ->
    band buckets -> candidate pairs (equi-join on (band, bucket)) ->
    exact Jaccard on candidates only. Output identical in shape to
    :func:`dedup_ngram_query`; at scale the candidate join replaces
    the all-pairs shingle join."""
    sh = _doc_shingles(spark, sf_dir)
    sig = sh.select("doc_id", minhash_signature(F.col("shs")).alias("sig"))
    bands = lsh_bands(sig)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    shx = sh.select("doc_id", F.explode("shs").alias("sh"))
    sizes = sh.select("doc_id", F.size("shs").alias("n"))
    return _jaccard_pairs(shx, sizes, cands)


DEDUP_MINHASH_ORACLE_SQL = f"""
WITH {_ORACLE_SHINGLES},
sig AS (
  SELECT doc_id,
         list_transform(range(0, {NUM_HASHES}),
           i -> list_min(list_transform(shs,
             s -> ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || s), 1, 15))::BIGINT)))
           AS sig
  FROM sh
),
bands AS (
  SELECT doc_id, band,
         md5(array_to_string(
           list_transform(sig[band * {ROWS_PER_BAND} + 1 : band * {ROWS_PER_BAND} + {ROWS_PER_BAND}],
                          h -> CAST(h AS VARCHAR)), ',')) AS bucket
  FROM sig, (SELECT unnest(range(0, {NUM_BANDS})) AS band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shx a JOIN shx b ON a.sh = b.sh AND a.doc_id < b.doc_id
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       common / (sa.n + sb.n - common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common / (sa.n + sb.n - common) >= {JACCARD_THRESHOLD}
"""


# --- SimHash ---------------------------------------------------------------

def simhash_col(words: Column) -> Column:
    """48-bit SimHash over the distinct word set: bit j of the result
    is the majority vote of bit j across md5-derived word hashes."""
    hashes = F.transform(words, lambda w: md5_word_hash(w))
    n = F.size(words)
    # Statically unrolled over the 32 bits (shift amounts must be
    # Python ints); Catalyst folds this into one projection.
    def ones_at(bit):
        return F.size(F.filter(hashes, lambda h: h.bitwiseAND(bit) != 0))

    sim = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        bit = F.lit(1 << j).cast("long")
        sim = sim + F.when(ones_at(bit) * 2 > n, bit).otherwise(F.lit(0).cast("long"))
    return sim


def dedup_simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 48-bit signatures, Hamming-LSH on 4
    12-bit blocks (any pair within distance 3 must share a block),
    verified with bit_count(xor) <= 3."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = docs.select(
        "doc_id",
        simhash_col(F.array_distinct(F.split("text", r"\s+"))).alias("sim"),
    )
    block = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("blk"),
                    F.shiftright(F.col("sim"), k * 12)
                    .bitwiseAND(F.lit(4095))
                    .alias("val"),
                )
                for k in range(SIMHASH_BLOCKS)
            ]
        )
    )
    blocks = sigs.select("doc_id", "sim", block.alias("b")).select(
        "doc_id", "sim", F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
    a = blocks.select(
        F.col("doc_id").alias("doc_a"), F.col("sim").alias("sim_a"), "blk", "val"
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"), "blk", "val"
    )
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_MAX_DIST)
    )


DEDUP_SIMHASH_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, list_distinct(string_split_regex(text, '\\s+')) AS w FROM documents
),
sig AS (
  SELECT doc_id,
         list_sum(list_transform(range(0, {SIMHASH_BITS}), j ->
           CASE WHEN 2 * len(list_filter(
                  list_transform(w, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT),
                  h -> (h // (1::BIGINT << j)) % 2 = 1)) > len(w)
                THEN 1::BIGINT << j ELSE 0 END))::BIGINT AS sim
  FROM tok
),
blocks AS (
  SELECT doc_id, sim, blk, (sim // (1::BIGINT << (blk * 12))) % 4096 AS val
  FROM sig, (SELECT unnest(range(0, {SIMHASH_BLOCKS})) AS blk)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sim, b.sim)) AS hamming
FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.val = b.val
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= {SIMHASH_MAX_DIST}
"""
