"""Deterministic train/validation/test splitting (training-data
pipeline extension; no reference analog - the reference's nearest
operation is the ES top-10k user cap, SURVEY A12).

Two split strategies, both fully deterministic and engine-portable
(no RNG, no Spark-sampler dependence), so the DuckDB oracle reproduces
them bit-for-bit:

- **hash-mod** (`split_hash`): bucket = md5(doc_id)[:8] mod 100;
  0-79 train / 80-89 valid / 90-99 test. Embarrassingly parallel -
  a pure projection, no shuffle, stable under re-runs and appends
  (a document never changes split when the corpus grows). This is the
  100 TB path.
- **exact-stratified** (`split_stratified`): percent_rank over the
  md5 order within each ``lang`` stratum - exact 80/10/10 proportions
  per stratum. Costs one shuffle on ``lang``; strata are few, so at
  scale this skews (every 'en' row lands on one reducer). Documented
  trade-off: use hash-mod at scale, exact-stratified when per-stratum
  proportions must be exact on bounded data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table

TRAIN_PCT, VALID_PCT = 80, 10  # remainder = test


def _split_label(bucket_0_99) -> F.Column:
    return (
        F.when(bucket_0_99 < TRAIN_PCT, "train")
        .when(bucket_0_99 < TRAIN_PCT + VALID_PCT, "valid")
        .otherwise("test")
    )


def train_test_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    with_hash = docs.select("doc_id", "lang", h.alias("h"))
    pr = F.percent_rank().over(
        Window.partitionBy("lang").orderBy("h", "doc_id")
    )
    return with_hash.select(
        "doc_id",
        "lang",
        _split_label(F.col("h") % 100).alias("split_hash"),
        # explicit floor: Spark's double->int cast truncates but
        # DuckDB's rounds, so the bucket must be floored before casting
        _split_label(F.floor(pr * 100).cast("int")).alias("split_stratified"),
    )


TRAIN_TEST_SPLIT_ORACLE_SQL = """
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN h % 100 < 80 THEN 'train'
            WHEN h % 100 < 90 THEN 'valid'
            ELSE 'test' END AS split_hash,
       CASE WHEN CAST(floor(pr * 100) AS INTEGER) < 80 THEN 'train'
            WHEN CAST(floor(pr * 100) AS INTEGER) < 90 THEN 'valid'
            ELSE 'test' END AS split_stratified
FROM (
  SELECT *, percent_rank() OVER (PARTITION BY lang ORDER BY h, doc_id) AS pr
  FROM h
)
"""


WS_K = 100  # weighted-sample size


def weighted_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES), k=100 orders with inclusion
    probability increasing in priority (URGENT=5x the weight of LOW).

    A-ES ranks items by u_i^(1/w_i) (u uniform) and keeps the top k.
    Floating pow/ln are libm-dependent - not portable - so this uses
    the exact equivalence: max of w_i iid uniforms has CDF x^(w_i),
    the SAME distribution as u^(1/w_i). Each row fans out to w_i
    integer-weight replicas, each replica draws its uniform as a
    60-bit md5 integer, and the per-item key is the integer max -
    every comparison is exact, both engines agree bit-for-bit.

    Scale shape: fan-out <= 5x on a projected 2-column frame, one
    map-side-combinable max-aggregate, TakeOrderedAndProject top-k.
    No full sort, no RNG state, reproducible from the data alone -
    which is what makes the training subset auditable."""
    from .text import md5_word_hash

    orders = load_table(spark, sf_dir, "orders")
    weighted = orders.select(
        "o_orderkey",
        (6 - F.substring("o_orderpriority", 1, 1).cast("int")).alias("w"),
    )
    keys = (
        weighted.select(
            "o_orderkey",
            F.explode(F.sequence(F.lit(1), F.col("w"))).alias("r"),
        )
        .select(
            "o_orderkey",
            md5_word_hash(
                F.concat(F.col("o_orderkey"), F.lit("#"), F.col("r"))
            ).alias("u"),
        )
        .groupBy("o_orderkey")
        .agg(F.max("u").alias("es_key"))
    )
    return (
        keys.join(weighted, "o_orderkey")
        .select("o_orderkey", "w", "es_key")
        .orderBy(F.desc("es_key"), "o_orderkey")
        .limit(WS_K)
    )


WEIGHTED_SAMPLE_ORACLE_SQL = f"""
WITH weighted AS (
  SELECT o_orderkey, 6 - CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS w
  FROM orders),
reps AS (SELECT unnest(range(1, 6)) AS r),
keys AS (
  SELECT o_orderkey,
         max(CAST(('0x' || substr(md5(o_orderkey || '#' || reps.r), 1, 15))
                  AS BIGINT)) AS es_key
  FROM weighted CROSS JOIN reps
  WHERE reps.r <= weighted.w
  GROUP BY o_orderkey)
SELECT k.o_orderkey, w.w, k.es_key
FROM keys k JOIN weighted w ON k.o_orderkey = w.o_orderkey
ORDER BY k.es_key DESC, k.o_orderkey
LIMIT {WS_K}
"""


# --- class-balanced downsampling -------------------------------------------


def balanced_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every ``lang`` stratum is cut to
    the size of the SMALLEST stratum, membership chosen by a
    deterministic md5 order (no RNG - re-runs and both engines pick
    identical rows). This is the standard rebalancing step before
    training on a language/domain-skewed corpus when upweighting
    (``source_mixture``) is not an option.

    Scale shape: one map-combinable count aggregate reduced to a
    broadcast scalar (the minority size m), plus one window shuffle
    partitioned by lang for the exact per-class rank. Exact-k per
    class serializes each class through one reducer - same documented
    trade-off as split_stratified above; at 100 TB use the hash-mod
    THRESHOLD form (keep where bucket < m/n_class * M), which is a
    pure projection at the cost of +-binomial-noise class sizes."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    ranked = docs.select("doc_id", "lang", h.alias("h")).withColumn(
        "rk", F.row_number().over(Window.partitionBy("lang").orderBy("h", "doc_id"))
    )
    m = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).agg(
        F.min("cnt").alias("m")
    )
    return (
        ranked.crossJoin(F.broadcast(m))
        .filter(F.col("rk") <= F.col("m"))
        .select("doc_id", "lang", "rk")
    )


BALANCED_SAMPLE_ORACLE_SQL = """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
),
m AS (
  SELECT min(cnt) AS m
  FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang)
)
SELECT doc_id, lang, rk
FROM ranked, m
WHERE rk <= m.m
"""
