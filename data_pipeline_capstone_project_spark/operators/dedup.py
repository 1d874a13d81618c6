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

Hash-family cost note: each shingle/word is md5'd exactly ONCE (a
32-bit base hash materialized in its own projection so Catalyst's
CollapseProject cannot re-inline it into N copies); the N MinHash
family members are affine permutations ``(a_i*h + b_i) mod p`` of that
base hash - integer-only, overflow-safe in int64 on both engines
(a < 2^30, h < 2^32 => a*h+b < 2^63), and ~16x cheaper than seeded
re-hashing.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
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

#: Mersenne prime modulus + deterministic affine coefficients for the
#: MinHash family (fixed LCG seed; regenerated identically into the
#: DuckDB oracle SQL below).
MINHASH_PRIME = (1 << 61) - 1


def _coeffs() -> tuple[list[int], list[int]]:
    x, a, b = 20260813, [], []
    for _ in range(NUM_HASHES):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a.append((x % ((1 << 30) - 1)) | 1)
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b.append(x % (1 << 30))
    return a, b


MINHASH_A, MINHASH_B = _coeffs()

#: Mixing coefficients for deriving a shingle hash from 3 consecutive
#: 32-bit word hashes (odd, < 2^30; overflow-safe: h*c < 2^62, the
#: three mod-P terms sum to < 2^63).
SHINGLE_C1 = 0x27d4eb2f
SHINGLE_C2 = 0x165667b1


def md5_hash32(col: Column) -> Column:
    """32-bit base hash (first 8 md5 hex chars). Small enough that an
    affine permutation with 30-bit coefficients stays inside int64."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def shingles_col(wh: Column) -> Column:
    """Distinct 3-word shingle HASHES from a *materialized* word-hash
    array column ``wh`` (empty array if < 3 words). A shingle hash is
    an integer mix of its 3 consecutive 32-bit word hashes mod the
    Mersenne prime - shingle *strings* never exist, so per-doc state
    is one long array and the md5 count is n_words, not n_shingles
    x 3-word-strings.

    CRITICAL: ``wh`` must be a bound column attribute, not a nested
    expression. Spark higher-order functions are interpreted (no
    whole-stage codegen, no CSE inside the lambda body), so an array
    expression referenced in the lambda is RE-EVALUATED PER ELEMENT -
    passing ``transform(split(...), md5)`` directly here turns an
    O(n) projection into O(n^2) md5 calls (measured: ~7x on the old
    string path, far worse with explicit per-word hashing)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(wh) - (SHINGLE_N - 1), F.lit(0)))
    p = F.lit(MINHASH_PRIME)
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: (
                (F.element_at(wh, i) * F.lit(SHINGLE_C1)) % p
                + (F.element_at(wh, i + 1) * F.lit(SHINGLE_C2)) % p
                + F.element_at(wh, i + 2)
            )
            % p,
        )
    )


def _parallel_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` spread across all cores. The shingle/hash
    projections are CPU-bound, so their parallelism must come from a
    round-robin repartition, not from input splits - a locally-tested
    corpus is one parquet row group (1 task), and even at 100 TB
    text compresses so well that split count underestimates the CPU
    cost per byte. One narrow-row (doc_id, text) shuffle buys a
    full-cluster-wide map stage."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.repartition(spark.sparkContext.defaultParallelism)


def shingles_of_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, shs). Works on any docs-shaped
    DataFrame (batch table scan or a streaming micro-batch)."""
    # Short-doc filter on the RAW text, before any hashing: a filter
    # phrased as size(shs) > 0 would be predicate-pushed below the
    # projections, inlining the whole (expensive) shingle expression
    # into the scan-side predicate and re-evaluating it per row on top
    # of the projection itself. n_words >= 3 is equivalent (a >=3-word
    # doc always yields >= 1 shingle) and costs one split.
    docs = docs.filter(F.size(F.split("text", r"\s+")) >= SHINGLE_N)
    # Word hashes materialized in their own projection (see
    # shingles_col docstring for why this MUST be two selects).
    wh = docs.select(
        "doc_id",
        F.transform(F.split("text", r"\s+"), md5_hash32).alias("wh"),
    )
    return wh.select("doc_id", shingles_col(F.col("wh")).alias("shs"))


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingles_of_docs(_parallel_docs(spark, sf_dir))


def bands_of_shingles(sh: DataFrame) -> DataFrame:
    """(doc_id, shs) -> (doc_id, band, bucket) via the MinHash
    signature. Shared by the batch LSH query and the incremental
    streaming index builder, so both sides of the stream-vs-batch
    equivalence gate hash with identical coefficients."""
    # 32-bit base hashes (fold of the 61-bit shingle hash) so the
    # affine permutations stay inside int64; no md5 on this path.
    hs = sh.select(
        "doc_id",
        F.transform("shs", lambda s: s % F.lit(1 << 32)).alias("hs"),
    )
    sig = hs.select("doc_id", minhash_signature(F.col("hs")).alias("sig"))
    return lsh_bands(sig)


# --- exact dedup -----------------------------------------------------------

def exact_signature_col():
    """Canonicalized content signature (md5 of the sorted distinct
    word set) over the ``text`` column - shared by dedup_exact and
    the curation funnel."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", r"\s+"))), "|")
    )


def dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a canonicalized content signature (md5 of the
    sorted distinct word set - catches reorderings, the synthetic
    corpus's duplication mode). Keeps the minimum doc_id per group."""
    docs = load_table(spark, sf_dir, "documents")
    sig = exact_signature_col()
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

def dedup_ngram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= 0.5. The shingle
    equi-join only materializes pairs that share >= 1 shingle, not the
    |docs|^2 cross product; shingles enter the self-join as 8-byte
    md5-derived hashes, not ~25-char strings, so the shuffle moves a
    fraction of the bytes.

    This is the NAIVE inverted-index plan, kept as the reference
    point ``similarity_join_exact`` is hash-checked against: its pair
    stage is still quadratic in hot-shingle document frequency (a
    shingle in d docs emits d^2/2 pairs - measured OOM at 20x the
    bench corpus, SCALING.md). Production paths use
    ``_prefix_filtered_pairs`` (AllPairs/PPJoin, result-identical) or
    the banded LSH operator below.

    ``explode_outer`` (not ``explode``) is deliberate: plain explode
    triggers the InferFiltersFromGenerate rule, which pushes an
    inferred ``size(shs) > 0`` predicate below the projections -
    inlining the whole interpreted shingle expression into a
    scan-side filter and re-evaluating it per row (measured ~20x on
    this query). Outer explode infers nothing; the null rows it could
    add are impossible (shingles are non-empty post word-count
    filter) and would drop out of the inner equi-join anyway."""
    return _ngram_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


def _ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All shingle-sharing doc pairs with their exact Jaccard (no
    threshold) - the shared stage behind ``dedup_ngram_jaccard`` and
    ``dedup_threshold_sweep``."""
    sh = _doc_shingles(spark, sf_dir)
    shx = sh.select("doc_id", F.explode_outer("shs").alias("sh"))
    a = shx.select(F.col("doc_id").alias("doc_a"), "sh")
    b = shx.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sizes = sh.select("doc_id", F.size("shs").alias("n"))
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
    )


SWEEP_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)


def dedup_threshold_sweep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity report in CLUSTER-SUMMARY form (the
    default since r9 - VERDICT r8 item 3): for each candidate Jaccard
    cutoff, the surviving pair count plus the connected-component
    statistics a curator actually consumes at 100 TB - cluster count,
    docs touched, dupes that deduplication would remove
    (docs - clusters), and the largest cluster.

    Why summary-by-default: the duplicated corpus's true pair count
    grows superlinearly (Yule-process clusters; SCALING.md), so any
    pair-proportional report has a superlinear floor, while cluster
    statistics are one row per threshold over one row per affected
    doc. The pair-grain twin survives as
    ``dedup_threshold_sweep_pairs`` for small-scale diagnostics.

    Shape: the prefix-filtered candidate stage runs ONCE at the
    lowest threshold (see the twin's docstring for why that is
    lossless); all four thresholds are clustered in ONE star-CC run
    over a composite node id (doc_id * n_thresholds + threshold_idx)
    - a union graph whose round count is the max over thresholds, so
    the iterative cost does not multiply by the sweep width.

    AT-SCALE LIMIT (measured r11): sweeping at cutoff 0.3 makes the
    prefix ~70% of each shingle set, so the candidate stage is the
    quadratic-by-vocabulary-saturation case described in
    ``similarity_join_exact_query`` at its WORST (sf5: 1.18e9
    candidates, 429 s wall for 250k docs). The cluster-summary OUTPUT
    stays tiny, but the exact candidate floor makes this a
    bounded-corpus diagnostic; at 100 TB sweep thresholds over the
    LSH-banded pair sets instead."""
    nt = len(SWEEP_THRESHOLDS)
    # persist, not eager localCheckpoint (r14): the verified pair set
    # has two consumers (pair counts, star-CC edge derivation); the
    # first consumer's job materializes the cache, so the dedicated
    # up-front materialization job is saved while both consumers still
    # compute the candidate stage exactly once. All persisted
    # intermediates are unpersisted at the query boundary (r15).
    caches: list = []
    pairs = _prefix_filtered_pairs(
        spark, sf_dir, min(SWEEP_THRESHOLDS), caches=caches
    ).persist()
    caches.append(pairs)
    th = F.posexplode(
        F.array(*[F.lit(float(t)) for t in SWEEP_THRESHOLDS])
    )
    swept = pairs.select(
        "doc_a", "doc_b", "jaccard", th.alias("ti", "threshold")
    ).filter(F.col("jaccard") >= F.col("threshold"))
    n_pairs = swept.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    from .clustering import connected_components_star

    comp = connected_components_star(
        swept.select(
            (F.col("doc_a") * nt + F.col("ti")).alias("doc_a"),
            (F.col("doc_b") * nt + F.col("ti")).alias("doc_b"),
        )
    )
    csizes = comp.groupBy(
        (F.col("doc_id") % nt).alias("ti"), "cluster_id"
    ).agg(F.count(F.lit(1)).alias("csize"))
    cstats = csizes.groupBy("ti").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("csize").alias("n_docs_affected"),
        (F.sum("csize") - F.count(F.lit(1))).alias("n_dupes_removed"),
        F.max("csize").alias("max_cluster_size"),
    ).select(
        F.element_at(
            F.array(*[F.lit(float(t)) for t in SWEEP_THRESHOLDS]),
            (F.col("ti") + 1).cast("int"),
        ).alias("threshold"),
        "n_clusters", "n_docs_affected", "n_dupes_removed",
        "max_cluster_size",
    )
    spine = spark.createDataFrame(
        [(float(t),) for t in SWEEP_THRESHOLDS], "threshold double"
    )
    final = (
        spine.join(n_pairs, "threshold", "left")
        .join(cstats, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_clusters", F.lit(0)).alias("n_clusters"),
            F.coalesce("n_docs_affected", F.lit(0)).alias("n_docs_affected"),
            F.coalesce("n_dupes_removed", F.lit(0)).alias("n_dupes_removed"),
            F.coalesce("max_cluster_size", F.lit(0)).alias("max_cluster_size"),
        )
    )
    # r15 boundary (ADVICE r14): materialize the |thresholds|-row
    # report eagerly through the caches, then release every persisted
    # intermediate - no CacheManager entries survive the query.
    out = final.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


def dedup_threshold_sweep_pairs_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pair-grain threshold sweep (the pre-r9 default, kept as the
    small-scale diagnostic twin): for each candidate Jaccard cutoff,
    how many pairs survive and how many documents are touched - the
    curve a curator reads before fixing JACCARD_THRESHOLD (too low
    merges topical neighbors, too high misses templated spam).

    Scale shape (round-7 fix, found by the sf2 scale run): the pair
    set comes from the PREFIX-FILTERED candidate path
    (:func:`_prefix_filtered_pairs` at the sweep's lowest threshold),
    not the naive >= 1-shared-shingle join. The naive pair set is
    quadratic in corpus size when shingles are hot (a shingle in d
    docs emits d^2/2 pairs; at 20x the bench corpus it OOMed a 48 GB
    heap), while every threshold the sweep reports is >= 0.3 - so
    prefix filtering at 0.3 is LOSSLESS for the report and bounds the
    join to rare-shingle prefixes. The expensive stage still runs
    ONCE; the sweep is a 4-way lateral fan-out over the bounded pair
    set. Zero-pair thresholds survive via the threshold spine
    left-join. The pair set is pinned via persist() because two
    aggregation grains consume it (pair counts and exploded-doc
    distinct counts) - without the pin the lazy plan re-runs the
    candidate join per branch. persist over an eager localCheckpoint
    (r14): the first consumer's job materializes the cache, saving
    the dedicated materialization job. Release differs (r15 fix of
    the r14 comment): persisted Datasets stay in the CacheManager
    until unpersist - they are NOT freed on reference death the way
    localCheckpoint blocks are - so the query boundary unpersists
    every cached intermediate after pinning the tiny report.

    AT-SCALE LIMIT: shares the cluster-summary sweep's candidate
    stage and its measured quadratic bound (see
    ``dedup_threshold_sweep_query``); bounded-corpus diagnostic."""
    caches: list = []
    pairs = _prefix_filtered_pairs(
        spark, sf_dir, min(SWEEP_THRESHOLDS), caches=caches
    ).persist()
    caches.append(pairs)
    th = F.explode(
        F.array(*[F.lit(float(t)) for t in SWEEP_THRESHOLDS])
    ).alias("threshold")
    swept = pairs.select(th, "doc_a", "doc_b", "jaccard").filter(
        F.col("jaccard") >= F.col("threshold")
    )
    n_pairs = swept.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    n_docs = (
        swept.select(
            "threshold", F.explode(F.array("doc_a", "doc_b")).alias("d")
        )
        .groupBy("threshold")
        .agg(F.countDistinct("d").alias("n_docs_affected"))
    )
    spine = spark.createDataFrame(
        [(float(t),) for t in SWEEP_THRESHOLDS], "threshold double"
    )
    final = (
        spine.join(n_pairs, "threshold", "left")
        .join(n_docs, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_docs_affected", F.lit(0)).alias("n_docs_affected"),
        )
    )
    # r15 boundary (ADVICE r14): materialize eagerly, release caches.
    out = final.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


_ORACLE_SHINGLES = f"""
tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
wh AS (SELECT doc_id,
              list_transform(w, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS wh
       FROM tok),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(wh) - {SHINGLE_N - 2}),
           i -> ((wh[i] * {SHINGLE_C1}) % {MINHASH_PRIME}
                 + (wh[i + 1] * {SHINGLE_C2}) % {MINHASH_PRIME}
                 + wh[i + 2]) % {MINHASH_PRIME})) AS shs
  FROM wh WHERE len(wh) >= {SHINGLE_N}
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


_SWEEP_ORACLE_COMMON = f"""
{_ORACLE_SHINGLES},
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shx a JOIN shx b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b, common / (sa.n + sb.n - common) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
),
th AS (SELECT CAST(unnest([{", ".join(str(t) for t in SWEEP_THRESHOLDS)}])
              AS DOUBLE) AS threshold),
sw AS (
  SELECT threshold, doc_a, doc_b FROM th JOIN pairs ON jaccard >= threshold
)
"""

DEDUP_THRESHOLD_SWEEP_PAIRS_ORACLE_SQL = f"""
WITH {_SWEEP_ORACLE_COMMON.strip()}
SELECT th.threshold,
       CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(d.n_docs, 0) AS BIGINT) AS n_docs_affected
FROM th
LEFT JOIN (SELECT threshold, count(*) AS n_pairs FROM sw GROUP BY 1) p
  USING (threshold)
LEFT JOIN (
  SELECT threshold, count(DISTINCT dd) AS n_docs
  FROM (SELECT threshold, unnest([doc_a, doc_b]) AS dd FROM sw)
  GROUP BY 1
) d USING (threshold)
"""

# Cluster-summary oracle: one recursive min-label CC over the
# threshold-tagged union graph (the composite-key trick the Spark
# plan uses), then per-threshold component statistics.
DEDUP_THRESHOLD_SWEEP_ORACLE_SQL = f"""
WITH RECURSIVE {_SWEEP_ORACLE_COMMON.strip()},
edges AS (
  SELECT threshold, doc_a AS src, doc_b AS dst FROM sw
  UNION
  SELECT threshold, doc_b AS src, doc_a AS dst FROM sw
),
reach(threshold, src, dst) AS (
  SELECT threshold, src, dst FROM edges
  UNION
  SELECT r.threshold, r.src, e.dst
  FROM reach r JOIN edges e
    ON r.threshold = e.threshold AND r.dst = e.src
  WHERE e.dst != r.src
),
comp AS (
  SELECT threshold, src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY threshold, src
),
cstats AS (
  SELECT threshold, cluster_id, count(*) AS csize
  FROM comp GROUP BY 1, 2
),
per_th AS (
  SELECT threshold,
         count(*) AS n_clusters,
         sum(csize) AS n_docs_affected,
         sum(csize) - count(*) AS n_dupes_removed,
         max(csize) AS max_cluster_size
  FROM cstats GROUP BY 1
)
SELECT th.threshold,
       CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(c.n_clusters, 0) AS BIGINT) AS n_clusters,
       CAST(coalesce(c.n_docs_affected, 0) AS BIGINT) AS n_docs_affected,
       CAST(coalesce(c.n_dupes_removed, 0) AS BIGINT) AS n_dupes_removed,
       CAST(coalesce(c.max_cluster_size, 0) AS BIGINT) AS max_cluster_size
FROM th
LEFT JOIN (SELECT threshold, count(*) AS n_pairs FROM sw GROUP BY 1) p
  USING (threshold)
LEFT JOIN per_th c USING (threshold)
"""


# --- MinHash + LSH ---------------------------------------------------------

def _affine(a: int, b: int):
    return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_signature(hs: Column) -> Column:
    """16-element MinHash signature from pre-computed 32-bit base
    hashes ``hs``: sig[i] = min over shingles of (a_i*h + b_i) mod p.
    Statically unrolled into 16 flat ``array_min(transform(...))``
    terms with literal coefficients - the nested
    ``transform(sequence(...), i -> ...)`` + ``element_at`` form is
    ~7x slower (measured): per-element array-literal indexing defeats
    the evaluator, and constant-folding the coefficients into the
    lambda keeps each pass a tight fused loop."""
    return F.array(
        *[
            F.array_min(F.transform(hs, _affine(a, b)))
            for a, b in zip(MINHASH_A, MINHASH_B)
        ]
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
    # explode_outer: see dedup_ngram_query - plain explode infers a
    # size()>0 filter that inlines the whole sig expression scan-side.
    return sig_df.select("doc_id", F.explode_outer(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def dedup_minhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, exact-verified: signature ->
    band buckets -> candidate pairs (equi-join on (band, bucket)) ->
    exact Jaccard on candidates only, via ``array_intersect`` of the
    two shingle sets. Verification cost is linear in the candidate
    count - there is NO all-pairs shingle join anywhere in this plan,
    which is what makes it the 100 TB path (the exact operator above
    is the small-scale oracle)."""
    sh = _doc_shingles(spark, sf_dir)
    bands = bands_of_shingles(sh)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    common = F.size(F.array_intersect("shs_a", "shs_b"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                common / (F.size("shs_a") + F.size("shs_b") - common)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


_A_LIST = "[" + ", ".join(str(a) for a in MINHASH_A) + "]"
_B_LIST = "[" + ", ".join(str(b) for b in MINHASH_B) + "]"

DEDUP_MINHASH_ORACLE_SQL = f"""
WITH {_ORACLE_SHINGLES},
hs AS (
  SELECT doc_id, shs,
         list_transform(shs, s -> s % 4294967296) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id,
         list_transform(range(0, {NUM_HASHES}),
           i -> list_min(list_transform(hs,
             h -> ({_A_LIST}[i + 1]::BIGINT * h + {_B_LIST}[i + 1]::BIGINT)
                  % {MINHASH_PRIME})))
           AS sig
  FROM hs
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
verified AS (
  SELECT cand.doc_a, cand.doc_b,
         len(list_intersect(sa.shs, sb.shs))
           / (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs)))
           AS jaccard
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# --- SimHash ---------------------------------------------------------------

def simhash_col(hashes: Column) -> Column:
    """48-bit SimHash from pre-computed word hashes: bit j of the
    result is the majority vote of bit j across the hash array.

    Single pass over the array: one F.aggregate whose accumulator is
    an array of 48 per-bit one-counts (each element contributes its 48
    bit tests in one visit), then a fold of the counters back into the
    signature. Replaces the previous 48x F.filter scans - identical
    result, one traversal instead of 48.
    """
    n = F.size(hashes)
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(SIMHASH_BITS)])
    counts = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        h.bitwiseAND(F.lit(1 << j).cast("long")) != 0,
                        F.lit(1).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                    for j in range(SIMHASH_BITS)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    bit_values = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    return F.aggregate(
        F.zip_with(
            counts,
            bit_values,
            lambda c, bit: F.when(c * 2 > n, bit).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def dedup_simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 48-bit signatures, Hamming-LSH on 4
    12-bit blocks (any pair within distance 3 must share a block),
    verified with bit_count(xor) <= 3. Word hashes are materialized in
    their own projection (md5 once per word; the 48 majority-vote
    passes are integer ops over that array)."""
    docs = _parallel_docs(spark, sf_dir)
    hs = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split("text", r"\s+")), lambda w: md5_word_hash(w)
        ).alias("hs"),
    )
    # Lineage barrier, load-bearing: the self-join below infers
    # isnotnull() on its keys, and predicate pushdown SUBSTITUTES the
    # full signature expression (md5 per word + the 48-counter
    # aggregate) into that filter and pushes it to the parquet scan -
    # below the parallelizing repartition, so the whole corpus gets
    # signature-hashed per join side in ONE task, then again in the
    # real projection (measured 8.5s -> 0.4s at sf0.1). A lazy
    # localCheckpoint materializes the narrow (doc_id, sim) relation
    # (16 bytes/doc - ~1.6 GB per 100M docs cluster-wide) once at full
    # parallelism and both join sides read it.
    sigs = hs.select("doc_id", simhash_col(F.col("hs")).alias("sim")).localCheckpoint(
        eager=False
    )
    block = F.explode_outer(
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

    # First-matching-block dedup: a pair within Hamming distance 3 can
    # share up to all 4 blocks and would surface once per shared block;
    # instead of a distinct() shuffle over the verified pairs (the
    # dominant cost when duplicate clusters are large - a cluster of k
    # identical docs yields k^2/2 pairs x4 blocks), keep a match only in
    # the FIRST block the pair agrees on. Pure per-row predicate on
    # (sim_a, sim_b, blk) => pairs are unique by construction and the
    # plan is one shuffle (the bucket join), zero post-join shuffles.
    def _block(col: Column, m: int) -> Column:
        return F.shiftright(col, m * 12).bitwiseAND(F.lit(4095))

    first_match = F.lit(True)
    for m in range(SIMHASH_BLOCKS - 1):
        first_match = first_match & (
            (F.col("blk") <= F.lit(m))
            | (_block(F.col("sim_a"), m) != _block(F.col("sim_b"), m))
        )

    return (
        a.join(b, ["blk", "val"])
        .filter((F.col("doc_a") < F.col("doc_b")) & first_match)
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_DIST)
    )


# --- embedding-cosine near-dup --------------------------------------------

EMB_DUP_TABLES = 6
EMB_DUP_BITS = 3
EMB_DUP_THRESHOLD = 0.4
# P(same 3-bit bucket in >=1 of 6 tables) at cos=0.4 is ~0.82; raise
# tables (OR-amplification) for recall, bits (AND) for precision.


def dedup_embedding_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded sign-LSH candidates
    (6 tables x 3 hyperplane bits - any pair sharing a bucket in any
    table is a candidate), exact-cosine verified at >= 0.4. The banded
    grouping replaces the all-pairs N^2 cosine scan; verification is
    per-bucket, vectorized, and never materializes candidate pairs as
    rows.

    Verification runs as ONE grouped-map pandas UDF per (table,
    bucket): within a bucket the pairwise dot-product matrix is
    accumulated dimension-by-dimension in numpy - vectorized across
    pairs, sequential across dims, so every pair's sum matches the
    JVM/DuckDB left fold bit-for-bit and the driver hash-checks the
    full pipeline. This replaced a candidate self-join + two
    embedding-widening joins + distinct() (measured 6.9s -> ~2s at
    sf0.1: the old plan shuffled ~1M 128-double-wide candidate rows;
    this plan shuffles each embedding once per table). A pair found in
    several tables is kept only in its FIRST shared table (per-pair
    predicate on the carried bucket arrays), so output pairs are
    unique by construction with no distinct() shuffle. At 100 TB the
    per-bucket work is quadratic in bucket size - inherent to LSH
    candidate generation - so bits/tables must be sized to the corpus
    (more bits => smaller buckets, more tables => recall back up)."""
    import numpy as np
    import pandas as pd

    from .similarity import _md5_planes, unrolled_proj

    planes = _md5_planes("dup", EMB_DUP_TABLES * EMB_DUP_BITS)
    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    buckets = []
    for t in range(EMB_DUP_TABLES):
        bucket = F.lit(0)
        for j in range(EMB_DUP_BITS):
            proj = unrolled_proj(F.col("embedding"), planes[t * EMB_DUP_BITS + j])
            bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        buckets.append(bucket)
    # Lineage barrier, load-bearing (same pathology as dedup_simhash):
    # downstream aggregation keys infer isnotnull() filters that
    # predicate-pushdown would otherwise substitute with all 18
    # unrolled plane projections and re-evaluate at the scan.
    sigs = base.select(
        "vec_id", "embedding", F.array(*buckets).alias("bks")
    ).localCheckpoint(eager=False)
    bx = sigs.select(
        "vec_id", "embedding", "bks", F.posexplode_outer("bks").alias("tbl", "bucket")
    )

    def verify_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        g = len(pdf)
        if g < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        emb = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        bks = np.vstack(pdf["bks"].to_numpy())
        tbl = int(pdf["tbl"].iloc[0])
        dots = np.zeros((g, g))
        nrm2 = np.zeros(g)
        # Dimension-at-a-time accumulation: left-fold addition order,
        # bit-identical to the oracle's list_reduce.
        for d in range(emb.shape[1]):
            col = emb[:, d]
            dots += np.outer(col, col)
            nrm2 = nrm2 + col * col
        nrm = np.sqrt(nrm2)
        cos = dots / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(g, k=1)
        mask = cos[iu, ju] >= EMB_DUP_THRESHOLD
        for m in range(tbl):  # first-shared-table uniqueness
            mask &= bks[iu, m] != bks[ju, m]
        iu, ju = iu[mask], ju[mask]
        ids = pdf["vec_id"].to_numpy()
        return pd.DataFrame(
            {"vec_a": ids[iu], "vec_b": ids[ju], "cosine": cos[iu, ju]}
        )

    return bx.groupBy("tbl", "bucket").applyInPandas(
        verify_bucket, "vec_a long, vec_b long, cosine double"
    )


def _emb_dup_oracle() -> str:
    from .similarity import _md5_planes, _oracle_dot

    planes = _md5_planes("dup", EMB_DUP_TABLES * EMB_DUP_BITS)
    selects = []
    for t in range(EMB_DUP_TABLES):
        bits = []
        for j in range(EMB_DUP_BITS):
            plane = planes[t * EMB_DUP_BITS + j]
            proj = " + ".join(
                f"({r!r} * embedding[{d + 1}]::DOUBLE)" for d, r in enumerate(plane)
            )
            bits.append(
                f"CASE WHEN (0.0 + {proj}) >= 0 THEN {1 << j} ELSE 0 END"
            )
        selects.append(
            f"SELECT vec_id, {t} AS tbl, ({' + '.join(bits)}) AS bucket FROM embeddings"
        )
    bx = " UNION ALL ".join(selects)
    return f"""
WITH e AS (SELECT vec_id, embedding,
                  sqrt({_oracle_dot('embedding', 'embedding')}) AS nrm
           FROM embeddings),
bx AS ({bx}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bx a JOIN bx b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
verified AS (
  SELECT cand.vec_a, cand.vec_b,
         {_oracle_dot('ea.embedding', 'eb.embedding')} / (ea.nrm * eb.nrm) AS cosine
  FROM cand
  JOIN e ea ON ea.vec_id = cand.vec_a
  JOIN e eb ON eb.vec_id = cand.vec_b
)
SELECT vec_a, vec_b, cosine FROM verified
WHERE cosine >= {EMB_DUP_THRESHOLD}
"""


DEDUP_EMBEDDING_ORACLE_SQL = _emb_dup_oracle()


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


# --- Bloom-filter membership (incremental-ingest dedup gate) ---------------

#: 4096 words x 32 bits = 131072-bit filter; 3 hash functions. At
#: sf0.1 the history inserts ~3.3k signatures (~10k set bits, 7.6%
#: load -> false-positive rate (0.076)^3 ~ 0.04%); a production
#: filter scales m with n at constant bits/insertion. Bits live in
#: the LOW 32 bits of a BIGINT word so `1 << (pos % 32)` is positive
#: on every engine (no sign-bit semantics to agree on).
BLOOM_WORDS = 4096
BLOOM_WORD_BITS = 32
BLOOM_K = 3
BLOOM_BITS = BLOOM_WORDS * BLOOM_WORD_BITS
#: history = doc_id % 3 != 0 (the standing corpus); probes = the rest.
BLOOM_SPLIT_MOD = 3


def _canon_text() -> F.Column:
    """The corpus's canonical content form (sorted distinct word set
    - its duplication mode is reordering; same definition as
    :func:`dedup_exact_query`)."""
    return F.array_join(
        F.array_sort(F.array_distinct(F.split("text", r"\s+"))), "|"
    )


_CANON_SQL = (
    "array_to_string(list_sort(list_distinct("
    "string_split_regex(text, '\\s+'))), '|')"
)


def bloom_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership gate for incremental ingest: the
    standing corpus folds its canonical content signatures into a
    128 Kbit filter (ONE map-combinable bit_or aggregate -> <= 4096
    rows, 32 KB), the filter broadcasts, and new documents probe it
    map-side - the at-scale primitive for "skip the expensive dedup
    join unless the filter says maybe" (the same idempotency
    economics as the reference's existence check before image
    download, ``s3-to-es_aws.py:94-100`` / SURVEY S9/O4, with O(1)
    broadcast state instead of a keyed store).

    Output per probe doc: ``bloom_hit`` (filter says maybe-duplicate)
    and ``true_dup`` (exact canonical-signature match against
    history). The Bloom contract - no false negatives, bounded false
    positives - is visible in the result: every ``true_dup`` row has
    ``bloom_hit``, and the test + oracle pin it.

    All hashing is the shared md5 family and all filter arithmetic is
    integer bit ops, so filter words, hits, and flags are
    bit-identical to the DuckDB oracle.

    Scale shape: history is scanned once (map-side position expand ->
    bit_or keyed by <= 4096 words); probes never shuffle beyond their
    own per-doc aggregation (broadcast filter join on the word index
    + broadcast distinct-signature join for the truth flag)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _canon_text().alias("canon")
    )
    sig = md5_word_hash(F.col("canon"))
    hist = docs.filter(F.col("doc_id") % BLOOM_SPLIT_MOD != 0)
    probe = docs.filter(F.col("doc_id") % BLOOM_SPLIT_MOD == 0)

    def positions() -> F.Column:
        return F.array(
            *[
                (
                    md5_word_hash(F.col("canon"), seed=F.lit(f"bloom{i}"))
                    % BLOOM_BITS
                ).cast("int")
                for i in range(BLOOM_K)
            ]
        )

    bits = (
        hist.select(F.explode(positions()).alias("p"))
        .select(
            (F.col("p") / BLOOM_WORD_BITS).cast("int").alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), p % {BLOOM_WORD_BITS})").alias(
                "b"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )
    hist_sigs = hist.select(sig.alias("h_sig")).distinct()
    probed = (
        probe.select("doc_id", sig.alias("sig"), F.explode(positions()).alias("p"))
        .select(
            "doc_id",
            "sig",
            (F.col("p") / BLOOM_WORD_BITS).cast("int").alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), p % {BLOOM_WORD_BITS})").alias(
                "b"
            ),
        )
        .join(F.broadcast(bits), "word", "left")
        .select(
            "doc_id",
            "sig",
            F.expr("(b & coalesce(bits, cast(0 as bigint))) != 0").alias("hit"),
        )
        .groupBy("doc_id", "sig")
        .agg(F.bool_and("hit").alias("bloom_hit"))
    )
    return (
        probed.join(
            F.broadcast(hist_sigs), F.col("sig") == F.col("h_sig"), "left"
        )
        .select(
            "doc_id",
            "bloom_hit",
            F.col("h_sig").isNotNull().alias("true_dup"),
        )
        .orderBy("doc_id")
    )


def _bloom_oracle() -> str:
    md5_60 = "CAST(CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
    pos_union = "\nUNION ALL\n".join(
        f"  SELECT doc_id, {md5_60.format(x=repr('bloom' + str(i)) + ' || ' + repr('|') + ' || canon')}"
        f" % {BLOOM_BITS} AS INTEGER) AS p FROM {{side}}"
        for i in range(BLOOM_K)
    )
    sig = "CAST(CAST(('0x' || substr(md5(canon), 1, 15)) AS BIGINT) AS BIGINT)"
    return f"""
WITH canon_docs AS (
  SELECT doc_id, {_CANON_SQL} AS canon FROM documents
),
hist AS (SELECT * FROM canon_docs WHERE doc_id % {BLOOM_SPLIT_MOD} <> 0),
probe AS (SELECT * FROM canon_docs WHERE doc_id % {BLOOM_SPLIT_MOD} = 0),
hpos AS (
{pos_union.format(side='hist')}
),
bits AS (
  SELECT p // {BLOOM_WORD_BITS} AS word,
         bit_or(CAST(1 AS BIGINT) << (p % {BLOOM_WORD_BITS})) AS bits
  FROM hpos GROUP BY 1
),
hsig AS (SELECT DISTINCT {sig} AS h_sig FROM hist),
ppos AS (
{pos_union.format(side='probe')}
),
probed AS (
  SELECT pp.doc_id,
         bool_and(((CAST(1 AS BIGINT) << (pp.p % {BLOOM_WORD_BITS}))
                   & coalesce(b.bits, 0)) <> 0) AS bloom_hit
  FROM ppos pp
  LEFT JOIN bits b ON pp.p // {BLOOM_WORD_BITS} = b.word
  GROUP BY pp.doc_id
)
SELECT pr.doc_id, pr.bloom_hit,
       (hsig.h_sig IS NOT NULL) AS true_dup
FROM probed pr
JOIN probe d ON pr.doc_id = d.doc_id
LEFT JOIN hsig ON {sig.replace('canon', 'd.canon')} = hsig.h_sig
ORDER BY pr.doc_id
"""


BLOOM_DEDUP_ORACLE_SQL = _bloom_oracle()


# --- exact substring (duplicated-span) dedup -------------------------------

#: Word-gram length for duplicated-span removal. Lee et al. 2022
#: ("Deduplicating Training Data Makes Language Models Better",
#: github.com/google-research/deduplicate-text-datasets) remove every
#: repeated 50-token span via a suffix array; 8 words suits this
#: corpus's ~45-word synthetic documents while still being long enough
#: that a duplicated gram means a genuinely repeated passage, not a
#: vocabulary collision (measured at sf0.01: 2,101 duplicate
#: instances at K=8 vs 16,741 at K=3).
SUBSTR_K = 8


def substring_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal, the distributed re-expression of
    Lee et al.'s ExactSubstr: every K-word gram that occurs more than
    once in the corpus is removed from every position except its first
    occurrence (ordered by doc_id, then position), and each document's
    text is rebuilt from its surviving tokens.

    Where the reference implementation builds one giant suffix array
    (shared-memory, single machine), the Spark shape is two shuffles,
    both linear in corpus token count:

    1. gram instances shuffle by gram hash — ``row_number`` over
       (gram) picks the kept first occurrence; every later instance of
       a duplicated gram marks its K-token span for removal;
    2. removal spans shuffle back by doc_id into one start-position
       array per document — coverage is then a per-row array
       expression (token p dies iff a span starts in
       [p-K+1, p]), no per-token join.

    Grams are compared by md5 (the same engine-portable idiom as the
    LSH band buckets); the gram string itself never leaves the map
    side. Output is every document with its token count, number of
    removed tokens, and the rebuilt text."""
    docs = _parallel_docs(spark, sf_dir)
    words = docs.select("doc_id", F.split("text", r"\s+").alias("w"))
    # 1-based gram start positions, matching SQL list indexing; docs
    # shorter than K words produce an empty sequence (greatest(...,0)).
    pos = words.select(
        "doc_id",
        "w",
        F.explode_outer(
            F.sequence(
                F.lit(1), F.greatest(F.size("w") - (SUBSTR_K - 1), F.lit(0))
            )
        ).alias("pos"),
    ).filter(F.col("pos").isNotNull())
    grams = pos.select(
        "doc_id",
        "pos",
        F.md5(F.concat_ws(" ", F.slice("w", F.col("pos"), SUBSTR_K))).alias("gh"),
    )
    w_gram = Window.partitionBy("gh")
    w_first = Window.partitionBy("gh").orderBy("doc_id", "pos")
    removal = (
        grams.withColumn("cnt", F.count(F.lit(1)).over(w_gram))
        .withColumn("rn", F.row_number().over(w_first))
        .filter((F.col("cnt") > 1) & (F.col("rn") > 1))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    with_spans = words.join(removal, "doc_id", "left").select(
        "doc_id",
        "w",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    # Token at 1-based position p = j + 1 (Spark filter index j is
    # 0-based) survives unless a removal span starts in [p-K+1, p].
    kept = F.filter(
        F.col("w"),
        lambda x, j: ~F.exists(
            "starts",
            lambda s: (s <= j + 1) & (s >= j + 2 - SUBSTR_K),
        ),
    )
    return with_spans.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        (F.size("w") - F.size(kept)).alias("n_removed"),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )


SUBSTRING_DEDUP_ORACLE_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
),
pos AS (
  SELECT doc_id, w,
         unnest(range(1, greatest(len(w) - {SUBSTR_K} + 2, 1))) AS pos
  FROM words
),
grams AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(w, pos, pos + {SUBSTR_K} - 1), ' ')) AS gh
  FROM pos
),
marked AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY gh) AS cnt,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM grams
),
removal AS (
  SELECT doc_id, list_sort(list(pos)) AS starts
  FROM marked WHERE cnt > 1 AND rn > 1
  GROUP BY doc_id
),
spans AS (
  SELECT words.doc_id, words.w, coalesce(removal.starts, []) AS starts
  FROM words LEFT JOIN removal ON words.doc_id = removal.doc_id
),
rebuilt AS (
  SELECT doc_id, w,
         list_filter(w, (x, j) ->
           len(list_filter(starts,
               s -> s <= j AND s >= j + 1 - {SUBSTR_K})) = 0) AS kept
  FROM spans
)
SELECT doc_id,
       len(w) AS n_tokens,
       len(w) - len(kept) AS n_removed,
       -- engine alignment: DuckDB's array_to_string([]) is NULL,
       -- Spark's concat_ws over an empty array is '' (a fully
       -- deduplicated document has empty text, not null text)
       coalesce(array_to_string(kept, ' '), '') AS cleaned_text
FROM rebuilt
"""


# --- LSH banding quality evaluation ----------------------------------------


def dedup_eval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH *candidate generation*
    against exact ground truth — the dedup twin of ``ann_recall``.

    Ground truth (all pairs with true Jaccard >= threshold) is NOT an
    all-pairs scan: any pair with Jaccard > 0 shares at least one
    shingle, so the exact pair set comes from a shingle inverted
    index — explode distinct shingles, self-join on the shingle hash,
    and the count of joined rows per pair IS |A ∩ B|, from which
    Jaccard follows without ever touching the arrays again. Work is
    sum of squared posting-list lengths, the standard inverted-index
    bound, distributed by shingle then by pair.

    Predicted = the raw (band, bucket) collision pairs BEFORE exact
    verification — evaluating the banding scheme itself, which is the
    part of the LSH pipeline that trades recall for work (the
    verification step after it is exact and cannot lose pairs).
    Output is one row of counts plus precision/recall (two double
    divisions of exact integers)."""
    # localCheckpoint: the shingle projection is the expensive pass
    # and feeds BOTH sides of the posting self-join, the size lookups,
    # and the band build - five consumers. Left lazy, Spark recomputes
    # the md5 + shingle HOF chain per consumer (measured 115 s vs
    # ~2 s at sf0.1). One eager materialization into executor block
    # storage makes every consumer a block read; blocks are released
    # when the plan is garbage-collected.
    sh = _doc_shingles(spark, sf_dir).localCheckpoint(eager=True)
    sizes = sh.select("doc_id", F.size("shs").alias("n"))
    posting = sh.select("doc_id", F.explode("shs").alias("s"))
    pa = posting.select(F.col("doc_id").alias("doc_a"), "s")
    pb = posting.select(F.col("doc_id").alias("doc_b"), "s")
    truth = (
        pa.join(pb, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(
            F.col("common")
            / (F.col("na") + F.col("nb") - F.col("common"))
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    bands = bands_of_shingles(sh)
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cand = (
        ba.join(bb, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # One lazy plan, ONE action: a full-outer join of truth vs
    # candidate pairs feeds a single 3-counter aggregate - no
    # driver-side counts, no intermediate persists to leak. The
    # result row only materializes when the caller executes the
    # returned DataFrame.
    t = truth.select("doc_a", "doc_b", F.lit(1).alias("is_true"))
    c = cand.select("doc_a", "doc_b", F.lit(1).alias("is_cand"))
    return (
        t.join(c, ["doc_a", "doc_b"], "full_outer")
        .agg(
            F.count("is_true").alias("n_true"),
            F.count("is_cand").alias("n_cand"),
            F.sum(
                (F.col("is_true").isNotNull() & F.col("is_cand").isNotNull()).cast(
                    "long"
                )
            ).alias("tp"),
        )
        .select(
            "n_true",
            "n_cand",
            "tp",
            (F.col("tp") / F.col("n_cand")).alias("precision"),
            (F.col("tp") / F.col("n_true")).alias("recall"),
        )
    )


DEDUP_EVAL_ORACLE_SQL = f"""
WITH {_ORACLE_SHINGLES},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shx a JOIN shx b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  WHERE p.common / (sa.n + sb.n - p.common) >= {JACCARD_THRESHOLD}
),
hs AS (
  SELECT doc_id, list_transform(shs, s -> s % 4294967296) AS hs FROM sh
),
sig AS (
  SELECT doc_id,
         list_transform(range(0, {NUM_HASHES}),
           i -> list_min(list_transform(hs,
             h -> ({_A_LIST}[i + 1]::BIGINT * h + {_B_LIST}[i + 1]::BIGINT)
                  % {MINHASH_PRIME})))
           AS sig
  FROM hs
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
counts AS (
  SELECT (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM cand) AS n_cand,
         (SELECT count(*) FROM truth JOIN cand USING (doc_a, doc_b)) AS tp
)
SELECT n_true, n_cand, tp,
       tp / n_cand AS precision,
       tp / n_true AS recall
FROM counts
"""


# --- prefix-filtered exact similarity self-join (AllPairs/PPJoin) ----------


def _prefix_candidates(
    sh: DataFrame,
    threshold: float,
    check_budget: bool = False,
    caches: list | None = None,
) -> DataFrame:
    """The bounded candidate stage of the AllPairs/PPJoin self-join:
    ``(doc_a, doc_b)`` rows (possibly duplicated - see below) that
    survive the prefix, length, and positional filters for Jaccard
    threshold ``t``. Exposed separately so ``tools/scale_bench.py``
    can record candidates/s - the denominator that attributes any
    at-scale rows/s collapse to candidate growth vs verify cost
    (VERDICT r9 item 1).

    Three lossless filters, cheapest-first:

    * PREFIX (Bayardo et al. WWW'07 / Chaudhuri et al. ICDE'06):
      with every doc's shingles sorted by one global order (ascending
      document frequency, rarest first, ties by shingle hash), two
      sets with J >= t MUST share an element inside their first
      ``n - ceil(t*n) + 1`` elements, so only those short prefixes
      enter the equi-join at all.
    * LENGTH (AllPairs): J(A,B) <= min/max, so J >= t forces
      min(|A|,|B|) >= t * max(|A|,|B|).
    * POSITIONAL (PPJoin, Xiao et al. WWW'08 s3.2): a match on a
      prefix token at 1-based positions (pa, pb) bounds the overlap
      by ``1 + min(na - pa, nb - pb)`` (only the matched token plus
      the suffixes after it can still intersect), while J >= t needs
      overlap >= t/(1+t) * (na+nb). Rows whose bound falls short are
      pruned BEFORE the expensive shingle-array verify joins.
      Losslessness with duplicated candidate rows: for a TRUE pair,
      its FIRST common token in the global order has every other
      common token after it in BOTH lists, so that row's bound is
      >= the real overlap >= the requirement - at least one row per
      true pair always survives, and the verify stage's post-cut
      ``distinct`` collapses the rest. The filter prunes inside the
      join's codegen span before any array payload is attached;
      recorded post-filter candidate counts at the synthetic sf5
      (250k docs, saturated vocabulary,
      tools/scale_bench_results.json r11): 5.19e8 at t=0.7 and
      1.18e9 at the sweep's t=0.3 - still quadratic in documents
      (see ``similarity_join_exact_query``'s AT-SCALE LIMIT), the
      filters improve the constant, not the exponent.

    The 1e-9 slacks keep double rounding from ever excluding an
    exact-boundary true pair; the exact-Jaccard verify remains the
    decider.

    NO distinct on the candidate stream: deduplicating candidate
    pairs BEFORE verification costs a full exchange + hash aggregate
    over the candidate set, which under vocabulary saturation is the
    plan's largest relation by far (measured at the synthetic sf5:
    the pre-verify distinct alone took 410 s while saving an 8%
    smaller verify input - only ~7% of rows are repeat pairs).
    Instead the verify join streams the duplicated candidates and
    the distinct runs on the SURVIVORS of the exact-Jaccard cut
    (~1e5 x smaller)."""
    shx = sh.select("doc_id", F.explode_outer("shs").alias("s"))
    freq = shx.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        shx.join(freq, "s")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "s"))).alias("ss"))
    )
    plen = (
        F.size("ss")
        - F.ceil(F.size("ss") * F.lit(threshold)).cast("int")
        + 1
    )
    # posexplode_outer, not posexplode: see dedup_ngram_query
    # (inferred size()>0 filters re-inline the whole interpreted
    # chain). pos is 0-based; the positional bound below uses 1-based
    # pa = pos + 1.
    pre = ranked.select(
        "doc_id",
        F.size("ss").alias("n"),
        F.posexplode_outer(
            F.transform(F.slice("ss", F.lit(1), plen), lambda st: st["s"])
        ).alias("p", "s"),
    # persist (r14, guide §2.4/§5): THREE consumers read this relation
    # - the budget aggregation plus both sides of the candidate
    # self-join - and unpersisted, each consumer re-executes the whole
    # prefix derivation (shingle explode -> df join -> collect_list
    # groupBy, 2 shuffles each): the budget check paid it once and the
    # join subtree twice more. Caching the linear prefix-postings
    # relation (doc_id, n, p, s - no arrays) collapses that to one
    # computation; measured 3.85 -> 2.51 s on the t=0.3 pair stage at
    # sf0.1. MEMORY_AND_DISK default spills gracefully at scale, and
    # this is exactly the materialization a 100 TB AllPairs run does
    # before its candidate self-join. Lifetime (r15, ADVICE r14):
    # persisted Datasets are NOT released on reference death (unlike
    # localCheckpoint blocks, which the ContextCleaner frees on GC) -
    # they stay registered in the CacheManager until unpersist or a
    # session cache clear. The caller therefore passes ``caches`` and
    # unpersists at its query boundary; a budget-raise unpersists here
    # so an aborted query pins nothing.
    ).persist()
    if caches is not None:
        caches.append(pre)
    if check_budget:
        try:
            _check_candidate_budget(pre, threshold)
        except CandidateBudgetError:
            pre.unpersist()
            raise
    ca = pre.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        (F.col("p") + 1).alias("pa"),
        "s",
    )
    cb = pre.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        (F.col("p") + 1).alias("pb"),
        "s",
    )
    min_overlap = (
        F.lit(threshold / (1.0 + threshold))
        * (F.col("na") + F.col("nb")).cast("double")
        - F.lit(1e-9)
    )
    return (
        ca.join(cb, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("na", "nb").cast("double")
            >= F.lit(threshold) * F.greatest("na", "nb").cast("double")
            - F.lit(1e-9)
        )
        .filter(
            (
                F.lit(1)
                + F.least(
                    F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")
                )
            ).cast("double")
            >= min_overlap
        )
        .select("doc_a", "doc_b")
    )


def prefix_candidate_count(
    spark: SparkSession, sf_dir: str, threshold: float
) -> int:
    """Candidate-stage cardinality (duplicated rows included - that
    is what the verify joins actually stream) for scale-evidence
    instrumentation. Runs the candidate stage only, no verify."""
    sh = _doc_shingles(spark, sf_dir).localCheckpoint(eager=True)
    return _prefix_candidates(sh, threshold).count()


def similarity_join_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard similarity self-join with PREFIX FILTERING — the
    AllPairs/PPJoin family (Bayardo et al. WWW'07, Xiao et al.
    WWW'08), which is the standard way to get the exact
    ``dedup_ngram_jaccard`` result without its posting-list blowup.

    With every document's shingles sorted by one global order
    (ascending document frequency, rarest first, ties by hash), two
    sets with Jaccard >= t MUST share an element inside their first
    ``n - ceil(t*n) + 1`` elements — so only those short prefixes are
    exploded into the candidate join. Frequent shingles (the postings
    that dominate sum-of-df^2 cost in the naive inverted index) land
    at the END of the sort and never enter the join at all. Candidates
    are then verified with one exact ``array_intersect`` pass.

    Result-identical to ``dedup_ngram_query`` (same pairs, same
    jaccard values), so it shares ``DEDUP_NGRAM_ORACLE_SQL`` — the
    driver hash-checks that the optimized plan changes nothing.

    Scale shape: one map-combinable df aggregate, one re-group by
    doc, a candidate equi-join sized by *prefix* postings only, and
    verification linear in candidates.

    AT-SCALE LIMIT (measured r11, tools/scale_bench_results.json):
    on this corpus family the candidate set is quadratic in documents
    even WITH prefix+positional filtering - a near-constant ~0.8% of
    all doc pairs at every measured scale (sf0.1 131.6k cands / 25M
    pairs, sf1 19.2M / 2.5G, sf2 79.6M / 10G, sf5 519M / 62.5G;
    wall 3.1 s -> 208 s at 50x docs, verify-stage bound at ~2.5M
    candidates/s). The cause is vocabulary saturation: the synthetic
    corpus draws from a ~40-word Zipf vocabulary, so even the RAREST
    shingle in a document's prefix has document frequency growing
    linearly with the corpus, and sum(prefix-df^2) is inherently
    quadratic - the adversarial case for df-ordered prefix filtering
    (real heavy-tailed corpora have genuinely rare shingles and fare
    far better). This entry is therefore a BOUNDED-CORPUS DIAGNOSTIC
    (exactness oracle, per-cluster audits, <=~1M docs per shard); the
    100 TB primary paths are the banding-bounded
    ``dedup_minhash_lsh`` / ``semantic_dedup`` family."""
    # r15 boundary (ADVICE r14): pin the verified pair set eagerly
    # (localCheckpoint blocks are ContextCleaner-released on reference
    # death), then unpersist the shingle/prefix caches - the heavy
    # compute runs exactly once either way, but a fresh session now
    # holds ZERO CacheManager entries after the query returns.
    caches: list = []
    pairs = _prefix_filtered_pairs(
        spark, sf_dir, JACCARD_THRESHOLD, caches=caches
    )
    out = pairs.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


class CandidateBudgetError(RuntimeError):
    """Raised when a quadratic exact-pair diagnostic would schedule a
    candidate join larger than its budget (VERDICT r11 item 2). The
    message carries the exact pre-filter candidate bound, the budget,
    and the hottest prefix shingles so the operator of a 100x run
    sees WHY the corpus saturates instead of an OOM hours later."""


#: Hard cap on the candidate stage of the exact-pair diagnostics
#: (``similarity_join_exact``, ``dedup_threshold_sweep*``). The
#: measured corpus curve (tools/scale_bench_results.json r11):
#: sf0.1 = 1.3e5 @ t=0.7, sf1 = 1.9e7, sf2 = 8.0e7, sf5 = 5.2e8 @0.7
#: / 1.18e9 @0.3 - so the default refuses the sf5-class runs that
#: took 429 s wall while letting every bench/gate scale through.
#: Raise deliberately via SPARK_GRAFT_CANDIDATE_BUDGET for an audit.
CANDIDATE_BUDGET_DEFAULT = 100_000_000


def _check_candidate_budget(pre: DataFrame, threshold: float) -> None:
    """Budget guard for the quadratic diagnostics: before the
    candidate equi-join is scheduled, bound its output EXACTLY with
    one linear, map-combinable aggregation over the prefix postings -
    for a shingle in ``pdf`` prefixes the join emits C(pdf, 2) rows,
    so ``sum_s C(pdf_s, 2)`` is a hard upper bound on candidates
    (length/positional filters only shrink it). Costs one extra pass
    over the (already shingled, checkpointed) prefix relation -
    linear where the join it guards is quadratic. One driver-side
    1-row pull, same bounded-pull convention as bpe/unigram."""
    budget = int(
        os.environ.get("SPARK_GRAFT_CANDIDATE_BUDGET", CANDIDATE_BUDGET_DEFAULT)
    )
    # posexplode_outer emits s=NULL rows for empty-shingle docs; the
    # equi-join never matches NULL keys, so counting them as one
    # "group" would add a spurious C(n_empty_docs, 2) to the bound
    # and refuse corpora full of empty documents (ADVICE r12).
    pdf = (
        pre.where(F.col("s").isNotNull())
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("pdf"))
    )
    est_row = pdf.select(
        F.sum(F.col("pdf") * (F.col("pdf") - 1) / 2).alias("est"),
        F.max("pdf").alias("hottest_pdf"),
        F.count(F.lit(1)).alias("n_shingles"),
    ).first()
    est = int(est_row["est"] or 0)
    if est > budget:
        raise CandidateBudgetError(
            f"exact-pair candidate stage at t={threshold} would emit "
            f"up to {est:,} candidate rows (budget "
            f"{budget:,}; hottest prefix shingle appears in "
            f"{est_row['hottest_pdf']:,} of {est_row['n_shingles']:,} "
            "prefix postings). This entry is a bounded-corpus "
            "diagnostic (scale_class=diagnostic-quadratic); use the "
            "banded-LSH family (dedup_minhash_lsh / semantic_dedup) "
            "at this scale, or raise SPARK_GRAFT_CANDIDATE_BUDGET "
            "deliberately for an audit run."
        )


def _prefix_filtered_pairs(
    spark: SparkSession, sf_dir: str, threshold: float,
    caches: list | None = None,
) -> DataFrame:
    """All doc pairs with exact 3-gram Jaccard >= ``threshold`` via
    AllPairs/PPJoin prefix filtering - the shared bounded candidate
    path behind ``similarity_join_exact`` (t = JACCARD_THRESHOLD) and
    ``dedup_threshold_sweep`` (t = the sweep's lowest cutoff).

    Guarded: refuses to schedule a candidate join whose exact linear
    upper bound exceeds the candidate budget (VERDICT r11 item 2) -
    see :func:`_check_candidate_budget`.

    ``caches`` (r15, ADVICE r14): collects the persisted intermediates
    (shingles + prefix postings) so the QUERY boundary can unpersist
    them once its result is pinned - persisted Datasets otherwise stay
    in the CacheManager for the whole session (they are not freed on
    reference death the way localCheckpoint blocks are)."""
    # persist, not eager localCheckpoint (r14): the budget check's
    # aggregation job materializes the cache as a side effect, so the
    # dedicated up-front materialization job this used to pay is free
    # - same compute-once guarantee for the verify joins below.
    sh = _doc_shingles(spark, sf_dir).persist()
    if caches is not None:
        caches.append(sh)
    try:
        cands = _prefix_candidates(sh, threshold, check_budget=True, caches=caches)
    except CandidateBudgetError:
        sh.unpersist()
        raise
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    common = F.size(F.array_intersect("shs_a", "shs_b"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (common / (F.size("shs_a") + F.size("shs_b") - common)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        # jaccard is a pure function of the pair, so the duplicate
        # candidate rows collapse exactly here
        .distinct()
    )
