"""Feature engineering for training pipelines: the hashing trick and
blocked fuzzy string matching.

Neither exists in the reference (its only ML-adjacent step is the
KMeans color UDF, ``spark/spark_image.py:127-165``); both are staples
of a 100 TB training-data pipeline and both stay entirely JVM-side -
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import md5_word_hash
from ..sources.readers import load_table

N_FEATURE_BUCKETS = 64
FUZZY_MAX_DIST = 4


def hash_bucket(col: F.Column, field: str, n: int = N_FEATURE_BUCKETS) -> F.Column:
    """Portable hashing trick: field-salted md5 -> bucket in [0, n).
    Field salting gives each feature column an independent hash family
    so 'brand' and 'type' collisions are uncorrelated. md5 (not
    xxhash/murmur) because every engine agrees on it - the bucket ids
    in the training set must be reproducible outside Spark."""
    return (md5_word_hash(col, seed=F.lit(field)) % n).cast("int")


def feature_hashing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash part attributes into fixed-width feature buckets - the
    hashing trick that replaces an unbounded vocabulary with a
    bounded, join-free projection. Pure map-side: zero shuffles, scan
    to output, which is the whole point at 100 TB (a dictionary-based
    encoder needs a vocabulary broadcast + join; the hash needs
    nothing)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        hash_bucket(F.col("p_brand"), "brand").alias("brand_bucket"),
        hash_bucket(F.col("p_type"), "type").alias("type_bucket"),
        hash_bucket(F.col("p_name"), "name").alias("name_bucket"),
        F.least(
            F.lit(N_FEATURE_BUCKETS - 1), F.greatest(F.lit(0), F.col("p_size"))
        ).alias("size_bucket"),
    )


_DUCK_BUCKET = (
    "CAST(CAST(('0x' || substr(md5('{field}' || '|' || {col}), 1, 15)) AS BIGINT)"
    " % {n} AS INTEGER)"
)


def _duck_bucket(col: str, field: str, n: int = N_FEATURE_BUCKETS) -> str:
    return _DUCK_BUCKET.format(col=col, field=field, n=n)


FEATURE_HASHING_ORACLE_SQL = f"""
SELECT p_partkey,
       {_duck_bucket('p_brand', 'brand')} AS brand_bucket,
       {_duck_bucket('p_type', 'type')} AS type_bucket,
       {_duck_bucket('p_name', 'name')} AS name_bucket,
       least({N_FEATURE_BUCKETS - 1}, greatest(0, p_size)) AS size_bucket
FROM part
"""


def fuzzy_match_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match over part names: candidate pairs share
    a block key (first token), survivors have edit distance <=
    FUZZY_MAX_DIST. The canonical entity-resolution shape:

    1. dedupe to distinct names FIRST - the quadratic step then runs
       on the vocabulary, not the row count;
    2. equi-join on the block key, so the cross product is per-block,
       a shuffle Catalyst plans like any other join (never a full
       cartesian);
    3. levenshtein as a post-join residual, JVM-side.

    Blocking trades recall for tractability (pairs differing in their
    first token are never compared) - the block key is the tunable;
    the oracle implements the identical contract."""
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.split("name", " ").getItem(0))
    )
    a = names.select(F.col("name").alias("name_a"), "block")
    b = names.select(F.col("name").alias("name_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    )


FUZZY_MATCH_ORACLE_SQL = f"""
WITH names AS (SELECT DISTINCT p_name AS name,
                      split_part(p_name, ' ', 1) AS block
               FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS dist
FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


# --- feature scaling -------------------------------------------------------

N_BINS = 8


def feature_scaling_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score + min-max normalization of line-item prices
    (grouped by return flag) - the standard pre-training scaling pass.

    Scale shape: group statistics are ONE aggregate over the fact (3
    groups -> bytes), broadcast-joined back onto the 100 TB side; no
    window over the full table, no global sort. Determinism: sums are
    exact decimals; mean/variance derive from those decimals with a
    fixed double-arithmetic recipe the oracle repeats verbatim, so the
    z-scores are bit-identical (a naive avg(double) would be
    partition-order-dependent)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.col("l_extendedprice").alias("x"),
    )
    dec = F.col("x").cast("decimal(18,2)")
    stats = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("sum_x"),
        F.sum(dec * dec).cast("double").alias("sum_x2"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    mean = F.col("sum_x") / F.col("n")
    var = (F.col("sum_x2") - mean * mean * F.col("n")) / (F.col("n") - 1)
    enriched = li.join(F.broadcast(stats), "l_returnflag")
    return enriched.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        ((F.col("x") - mean) / F.sqrt(var)).alias("zscore"),
        ((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn"))).alias("minmax"),
    )


FEATURE_SCALING_ORACLE_SQL = """
WITH stats AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_x2,
         min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
  FROM lineitem GROUP BY 1
)
SELECT l_orderkey, l_linenumber, l.l_returnflag,
       (x - sum_x / n) / sqrt((sum_x2 - (sum_x / n) * (sum_x / n) * n) / (n - 1))
         AS zscore,
       (x - mn) / (mx - mn) AS minmax
FROM (SELECT l_orderkey, l_linenumber, l_returnflag,
             l_extendedprice AS x FROM lineitem) l
JOIN stats s ON l.l_returnflag = s.l_returnflag
"""


def feature_binning_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth binning (ntile) of prices within each return-flag
    group plus a one-hot bitmask - quantile bucketing for feature
    discretization. Ordering carries a full unique tiebreak
    (price, orderkey, linenumber) so bucket assignment is total-order
    deterministic, not hash-partition luck.

    Scale note: partitioned ntile sorts within each group partition.
    When one group is itself 100 TB, swap to the two-phase form: exact
    boundary ranks via the percentile operator, broadcast the B-1
    boundaries, bin with a range lookup - same result, no global
    sort."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    binned = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.ntile(N_BINS).over(w).alias("bin"),
    )
    onehot = F.concat(
        F.repeat(F.lit("0"), F.col("bin") - 1),
        F.lit("1"),
        F.repeat(F.lit("0"), F.lit(N_BINS) - F.col("bin")),
    )
    return binned.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "bin",
        onehot.alias("onehot"),
    )


FEATURE_BINNING_ORACLE_SQL = f"""
WITH binned AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         ntile({N_BINS}) OVER (PARTITION BY l_returnflag
             ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bin
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_returnflag, bin,
       repeat('0', bin - 1) || '1' || repeat('0', {N_BINS} - bin) AS onehot
FROM binned
"""
