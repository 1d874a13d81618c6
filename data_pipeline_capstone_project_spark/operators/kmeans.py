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


# --- semantic dedup (SemDeDup) ---------------------------------------------

# cosine threshold as an exact rational: cos >= SEM_TAU_NUM/SEM_TAU_DEN
# (0.4: same operating point as dedup_embedding_cosine's verify stage)
SEM_TAU_NUM = 2
SEM_TAU_DEN = 5


def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the corpus semantically,
    then compare ONLY within clusters - pairs split across clusters
    are never enumerated. A vector is dropped when a lower-id member
    of its own cluster is cosine-similar above the threshold; the
    lowest id of each near-dup group survives.

    The cosine test is exact integer arithmetic end-to-end: with the
    2^20 fixed-point vectors, ``cos(a,b) >= t`` (for positive dot)
    rewrites as ``den^2 * dot^2 >= num^2 * |a|^2 * |b|^2`` - BIGINT
    dots widened to DECIMAL(38,0) for the squares (~1e28, well inside
    38 digits; the oracle uses HUGEINT), so no sqrt, no float, no
    engine divergence at the threshold boundary.

    Scale shape: the pair space is quadratic only WITHIN a cluster -
    that is SemDeDup's whole design: k grows with the corpus
    (k ~ n / target_cluster_size, e.g. 50k clusters for LAION-440M in
    the paper) so per-cluster membership, and with it the per-task
    pair count, stays bounded. Here the self-join shuffles both sides
    by cluster id once; everything after is projection + one
    map-combinable exists-aggregation keyed by the higher vec_id.

    The within-cluster stage is a per-cluster grouped map (same
    pattern as ``dedup_embedding_cosine``'s verify): candidate pairs
    never materialize as DataFrame rows - one Arrow batch per cluster,
    an exact int64 Gram matrix, and only the dropped members come
    back. The relational pair self-join this replaced spent a 64-dim
    interpreted fold on each of the ~n²/2k pairs (13.1 s at sf0.1;
    the grouped map is ~20x cheaper on the identical arithmetic).
    The threshold compare needs ~2^92-bit products, so the grouped
    map decides by float64 with a wide ambiguity band and re-checks
    only band pairs in exact Python integers - the decision is
    bit-identical to the oracle's HUGEINT compare for every pair.

    The member relation is lineage-barriered before the grouped map
    so the KMeans iterations run once, not once per consumer."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        "vec_id", _quant(F.col("embedding")).alias("q")
    ).localCheckpoint(eager=False)
    centroids = vectors.filter(F.col("vec_id") < K).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("q").alias("c")
    )
    for _ in range(LLOYD_ITERS):
        centroids = _update(_assign(vectors, centroids))
    members = (
        _assign(vectors, centroids)
        .select("vec_id", "cluster", "q")
        .localCheckpoint(eager=False)
    )
    tau_n2 = SEM_TAU_NUM * SEM_TAU_NUM
    tau_d2 = SEM_TAU_DEN * SEM_TAU_DEN

    def cluster_dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_id": [], "dup_of": []}).astype(
                {"vec_id": "int64", "dup_of": "int64"}
            )
        # |q| <= 2^20, so Gram entries <= 64 * 2^40 < 2^47: int64-exact
        q = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
        gram = q @ q.T
        n2 = np.diag(gram).copy()
        iu, ju = np.triu_indices(n, k=1)
        dot = gram[iu, ju]
        pos = dot > 0
        iu, ju, dot = iu[pos], ju[pos], dot[pos]
        # cos >= num/den  <=>  den^2 dot^2 >= num^2 na2 nb2 (dot > 0).
        # Operands are <= 2^47 (exact as float64); one rounding per
        # square/product leaves relative error ~2^-51, so any pair
        # outside a 1e-9 relative band is decided correctly by float.
        lhs = tau_d2 * np.square(dot.astype(np.float64))
        rhs = tau_n2 * (n2[iu].astype(np.float64) * n2[ju].astype(np.float64))
        diff = lhs - rhs
        band = 1e-9 * np.maximum(lhs, rhs)
        sel = diff > 0
        for k in np.nonzero(np.abs(diff) <= band)[0]:
            d = int(dot[k])
            sel[k] = tau_d2 * d * d >= tau_n2 * int(n2[iu[k]]) * int(n2[ju[k]])
        ids = pdf["vec_id"].to_numpy()
        if not sel.any():
            return pd.DataFrame({"vec_id": [], "dup_of": []}).astype(
                {"vec_id": "int64", "dup_of": "int64"}
            )
        out = pd.DataFrame({"vec_id": ids[ju[sel]], "dup_of": ids[iu[sel]]})
        return out.groupby("vec_id", as_index=False)["dup_of"].min()

    dropped = members.groupBy("cluster").applyInPandas(
        cluster_dedup, "vec_id long, dup_of long"
    )
    return (
        members.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.col("dup_of").isNull().alias("keep"),
            F.coalesce("dup_of", F.col("vec_id")).alias("canonical_id"),
        )
    )


def _semantic_dedup_oracle() -> str:
    dot = (
        "list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, {DIM} + 1), "
        "i -> a.qv[i] * b.qv[i])), (x, y) -> x + y)"
    )
    norm = (
        "list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, {DIM} + 1), "
        "i -> {v}.qv[i] * {v}.qv[i])), (x, y) -> x + y)"
    )
    return f"""
WITH members AS ({KMEANS_LLOYD_ORACLE_SQL.strip()}),
q AS (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(x::DOUBLE * {float(Q_SCALE)}) AS BIGINT)) AS qv
  FROM embeddings
),
pairs AS (
  SELECT ma.vec_id AS a_id, mb.vec_id AS b_id,
         {dot} AS dot,
         {norm.format(v='a')} AS na2,
         {norm.format(v='b')} AS nb2
  FROM members ma
  JOIN members mb ON ma.cluster = mb.cluster AND ma.vec_id < mb.vec_id
  JOIN q a ON a.vec_id = ma.vec_id
  JOIN q b ON b.vec_id = mb.vec_id
),
dropped AS (
  SELECT b_id AS vec_id, min(a_id) AS dup_of
  FROM pairs
  WHERE dot > 0
    AND CAST(dot AS HUGEINT) * dot * {SEM_TAU_DEN * SEM_TAU_DEN}
        >= CAST(na2 AS HUGEINT) * nb2 * {SEM_TAU_NUM * SEM_TAU_NUM}
  GROUP BY b_id
)
SELECT m.vec_id, m.cluster,
       d.dup_of IS NULL AS keep,
       coalesce(d.dup_of, m.vec_id) AS canonical_id
FROM members m LEFT JOIN dropped d ON m.vec_id = d.vec_id
"""


SEMANTIC_DEDUP_ORACLE_SQL = _semantic_dedup_oracle()
