"""Similarity search over the ``embeddings`` table (BASELINE.json
north-star: ANN over an ``array<float>`` column).

Two operators:

- **Brute-force cosine top-k** - the exactness baseline. Queries are a
  small fixed subset; the plan is broadcast(queries) x candidates ->
  fused dot-product projection -> per-query rank-filter window. At
  100 TB the candidate scan stays embarrassingly parallel (no shuffle
  until the tiny (|Q| x k) rank stage); the quadratic blowup is
  bounded by |Q|.
- **Sign-LSH bucketed ANN** - the scale path. An LSH_BITS-wide random
  hyperplane signature buckets each vector; neighbor candidates are
  bucket-mates only (equi-join on bucket), then exact cosine + top-k
  within candidates. Hyperplanes are derived from md5 in PYTHON at
  plan-build time and inlined as literals, so the Spark plan and the
  DuckDB oracle use bit-identical constants.

Float determinism: every reduction is an explicit left-fold
(``F.aggregate`` / statically unrolled literal sums), mirrored exactly
in the oracle SQL - double addition order is pinned, so cosine values
compare bit-for-bit across engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table

DIM = 64
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
LSH_BITS = 6


def _dot_fold(a: Column, b: Column) -> Column:
    """Left-fold dot product: deterministic addition order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


_ORACLE_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(range(1, {n} + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
    "(x, y) -> x + y)"
)


def _oracle_dot(a: str, b: str, n: int = DIM) -> str:
    return _ORACLE_DOT.format(a=a, b=b, n=n)


def cosine(a: Column, b: Column) -> Column:
    return _dot_fold(a, b) / (F.sqrt(_dot_fold(a, a)) * F.sqrt(_dot_fold(b, b)))


def similarity_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each query vector
    (vec_id < 10), self excluded, ties broken by neighbor id.

    Norms are precomputed per SIDE before the join, so each |Q| x N
    pair evaluates one dot-product fold instead of three (the
    division  dot / (sqrt(qq) * sqrt(cc))  sees bit-identical doubles
    either way, so the oracle needs no restructuring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.sqrt(_dot_fold(F.col("embedding"), F.col("embedding"))).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.sqrt(_dot_fold(F.col("embedding"), F.col("embedding"))).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_fold(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= TOP_K)


SIMILARITY_TOPK_ORACLE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_oracle_dot('qv', 'e.embedding')}
           / (sqrt({_oracle_dot('qv', 'qv')})
              * sqrt({_oracle_dot('e.embedding', 'e.embedding')})) AS cosine
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
"""


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]: component
    (b, d) from md5(f"{b}_{d}") - reproducible anywhere, no RNG state."""
    planes = []
    for b in range(LSH_BITS):
        row = []
        for d in range(DIM):
            h = int(hashlib.md5(f"{b}_{d}".encode()).hexdigest()[:15], 16)
            row.append(((h % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


_PLANES = _hyperplanes()


def lsh_bucket(emb: Column) -> Column:
    """Sign-LSH signature (LSH_BITS wide) as an integer bucket id. Each
    projection is a statically unrolled left-assoc literal sum -
    constant-folded by Catalyst into one fused projection."""
    bucket = F.lit(0)
    for b, plane in enumerate(_PLANES):
        proj = F.lit(0.0)
        for d, r in enumerate(plane):
            proj = proj + F.lit(r) * F.element_at(emb, d + 1).cast("double")
        bucket = bucket + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def _oracle_bucket(emb: str) -> str:
    terms = []
    for b, plane in enumerate(_PLANES):
        proj = " + ".join(
            f"({r!r} * {emb}[{d + 1}]::DOUBLE)" for d, r in enumerate(plane)
        )
        terms.append(f"CASE WHEN (0.0 + {proj}) >= 0 THEN {1 << b} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def similarity_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: exact cosine top-5 restricted to same-LSH-bucket
    candidates. Recall < 1 by design; the bucket equi-join replaces
    the all-pairs product, which is the 100 TB path (2^bits buckets
    divide the join fan-out; widen LSH_BITS as the corpus grows)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.sqrt(_dot_fold(F.col("embedding"), F.col("embedding"))).alias("qn"),
        "bucket",
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.sqrt(_dot_fold(F.col("embedding"), F.col("embedding"))).alias("cn"),
        "bucket",
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_fold(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= TOP_K)


def _lsh_oracle() -> str:
    return f"""
WITH be AS (SELECT vec_id, embedding, {_oracle_bucket('embedding')} AS bucket
            FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM be
      WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_oracle_dot('qv', 'e.embedding')}
           / (sqrt({_oracle_dot('qv', 'qv')})
              * sqrt({_oracle_dot('e.embedding', 'e.embedding')})) AS cosine
  FROM be e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
"""


SIMILARITY_LSH_ORACLE_SQL = _lsh_oracle()
