"""Distributed Lloyd's KMeans over the ``embeddings`` table.

The reference's only clustering is the per-image KMeans palette fit
(``spark/spark_image.py:140-191``) - a *grouped-map* shape where every
group fits in one task. A training-data pipeline also needs the other
regime: ONE KMeans over a corpus-wide embedding table that no single
task can hold (semantic dedup / diversity bucketing a la SemDeDup,
Abbas et al. 2023). This is the canonical iterative-broadcast pattern:

- **Centroids are a k-row DataFrame, broadcast each round** - the fact
  table streams past them; no shuffle touches the full vector set for
  the assignment step.
- **Assignment** is an argmin over k broadcast rows: per vector, ONE
  aggregation keyed by vec_id (map-combinable min-struct, no window
  sort) after the k-way broadcast join.
- **Centroid update** explodes assigned vectors to (cluster, dim,
  value) rows - a map-combinable sum/count shuffle keyed by
  (cluster, dim): k*DIM output rows regardless of corpus size.
- **Iterations unrolled statically** (LLOYD_ITERS=2): each round's
  shuffle output is tiny (k rows), so lineage stays shallow without
  checkpointing; a production loop would `localCheckpoint` per round
  like :mod:`.graph` does.

**Exactness across engines**: all distance/update arithmetic is
fixed-point integer. Vectors quantize once as
``floor(x * 2^20)`` (float-to-double is exact, multiply by a power of
two is exact, floor is deterministic); distances are BIGINT sums of
squared differences (max |q| ~ 2^20 so 64 dims stay far below 2^63);
centroid updates floor the per-dimension mean. Ties in the argmin
break on the lower cluster id. The DuckDB oracle repeats the identical
integer arithmetic, so assignment labels and distances compare
bit-for-bit - no float-sum-order caveats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

K = 4
DIM = 64
Q_SCALE = 1 << 20  # fixed-point scale: floor(x * 2^20)
LLOYD_ITERS = 2


def _quant(vec: Column) -> Column:
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(Q_SCALE))).cast("long")
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance (left fold, BIGINT)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, q) x broadcast(cluster, c) -> (vec_id, q, cluster, dist)
    via min-struct argmin: dist first, cluster id as the tiebreak."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "q",
        F.struct(
            _sq_dist(F.col("q"), F.col("c")).alias("dist"),
            F.col("cluster").alias("cluster"),
        ).alias("dc"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min("dc").alias("m"), F.first("q").alias("q"))
        .select(
            "vec_id", "q", F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist")
        )
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Per-cluster floored per-dimension mean, rebuilt into an array
    column ordered by dimension."""
    return (
        assigned.select("cluster", F.posexplode("q").alias("d", "v"))
        .groupBy("cluster", "d")
        .agg(
            F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("cv")
        )
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cv"))), lambda s: s["cv"]
            ).alias("c")
        )
    )


def kmeans_lloyd_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=4 Lloyd's, LLOYD_ITERS=2 statically unrolled, init = the
    vectors of vec_id 0..K-1 (deterministic, shared with the oracle).
    Output: every vector's final cluster and exact integer distance."""
    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        "vec_id", _quant(F.col("embedding")).alias("q")
    ).localCheckpoint(eager=False)
    centroids = vectors.filter(F.col("vec_id") < K).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("q").alias("c")
    )
    for _ in range(LLOYD_ITERS):
        assigned = _assign(vectors, centroids)
        centroids = _update(assigned)
    final = _assign(vectors, centroids)
    return final.select("vec_id", "cluster", "dist")


def _oracle_sq_dist(a: str, b: str) -> str:
    return (
        "list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, {DIM} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        "(x, y) -> x + y)"
    )


def _kmeans_oracle() -> str:
    assign = (
        "SELECT vec_id, cluster, dist FROM (\n"
        "  SELECT q.vec_id, c.cluster,\n"
        f"         {_oracle_sq_dist('q.qv', 'c.cv')} AS dist,\n"
        "         row_number() OVER (\n"
        f"           PARTITION BY q.vec_id\n"
        f"           ORDER BY {_oracle_sq_dist('q.qv', 'c.cv')}, c.cluster\n"
        "         ) AS rn\n"
        "  FROM q CROSS JOIN {cents} c\n"
        ") WHERE rn = 1"
    )
    update = (
        "SELECT cluster, list(cv ORDER BY d) AS cv FROM (\n"
        "  SELECT a.cluster, r.range AS d,\n"
        "         CAST(floor(sum(q.qv[r.range]) / count(*)) AS BIGINT) AS cv\n"
        f"  FROM {{assigned}} a JOIN q USING (vec_id) CROSS JOIN range(1, {DIM} + 1) r\n"
        "  GROUP BY a.cluster, r.range\n"
        ") GROUP BY cluster"
    )
    return f"""
WITH q AS (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(x::DOUBLE * {float(Q_SCALE)}) AS BIGINT)) AS qv
  FROM embeddings
),
c0 AS (SELECT CAST(vec_id AS INT) AS cluster, qv AS cv FROM q WHERE vec_id < {K}),
a1 AS ({assign.format(cents='c0')}),
c1 AS ({update.format(assigned='a1')}),
a2 AS ({assign.format(cents='c1')}),
c2 AS ({update.format(assigned='a2')})
{assign.format(cents='c2')}
"""


KMEANS_LLOYD_ORACLE_SQL = _kmeans_oracle()
