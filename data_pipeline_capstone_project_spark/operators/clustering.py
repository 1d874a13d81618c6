"""Near-duplicate clustering: connected components over the verified
MinHash-LSH pair graph (training-data pipeline extension).

Pair detection (:mod:`.dedup`) yields edges; an actual dedup pipeline
must then pick ONE canonical document per duplicate *group*, and groups
are the connected components of that graph (A~B, B~C => {A,B,C} even if
A and C never met in a bucket).

Implementation is iterative min-label propagation, all DataFrame ops:
each round every node takes ``min(own label, neighbor labels)``; the
component minimum spreads one hop per round, so rounds = graph
diameter. Near-dup components are short chains (diameter rarely > a
few hops), so this converges in 2-4 rounds in practice. Each round is
one shuffle of the (small) edge list; ``localCheckpoint`` truncates
plan lineage so round N does not re-execute rounds 1..N-1. The label
sum is monotonically non-increasing, giving a cheap scalar fixpoint
test. For adversarial long-chain graphs
:func:`connected_components_star` (alternating large-star/small-star,
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) drops rounds to O(log^2 n) - same join/agg shuffle shape per
round, diameter-independent; both are registry-gated against the same
oracle.

The DuckDB oracle computes the same components via a recursive-CTE
transitive closure - exponentially more expensive, viable only at
oracle scale, which is exactly the point of having the LSH+iterative
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import DEDUP_MINHASH_ORACLE_SQL, dedup_minhash_query

MAX_ROUNDS = 20


def connected_components(pairs: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """(doc_a, doc_b) undirected edges -> (doc_id, cluster_id) where
    cluster_id is the component's minimum doc_id."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            # lazy (r14): the fixpoint sum below materializes the
            # checkpoint as a side effect - one job per round instead
            # of a dedicated materialization job plus the sum job.
            # INVARIANT (ADVICE r14): the probe action must compute
            # EVERY partition (a global sum does; isEmpty/limit/first
            # would not) or the unevaluated partitions get recomputed
            # in an extra job when the checkpoint finalizes.
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:  # labels only decrease -> fixpoint
            break
        prev_sum = cur_sum
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., SoCC'14): every node
    connects its strictly-larger neighbors to the minimum of its
    closed neighborhood. Output edges are always (larger, smaller)."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("minv"))
        .select("u", F.least("minv", "u").alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node links its smaller-or-equal
    neighborhood (and itself) to that neighborhood's minimum."""
    m = edges.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        edges.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = m.select("u", F.col("m").alias("v"))
    return rewired.union(self_link).filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    pairs: DataFrame, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """(doc_a, doc_b) edges -> (doc_id, cluster_id) via alternating
    large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14).

    Converges in O(log^2 n) rounds regardless of graph DIAMETER -
    the property min-label propagation lacks: on a 10k-node chain,
    propagation needs 10k rounds (10k shuffles); this needs ~15.
    Per round: one groupBy + one join on the shrinking edge list,
    the same shuffle shape as one propagation step, so the 100 TB
    plan is strictly better whenever components can be deep.

    Fixpoint test is exact set equality (counts match and either-way
    difference is empty), not a hash heuristic - the edge list at
    round k is tiny relative to the input, so the extra anti-join is
    noise."""
    edges = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Fixpoint loop job budget (r14): the previous round's cardinality
    # is carried in a driver int instead of re-counting the checkpointed
    # edge list every round - count(nxt) is already a job per round; the
    # second count was pure fixed cost (distinct edges are checkpointed,
    # so the count is stable by construction). exceptAll still only runs
    # when the counts tie (Python `and` short-circuit).
    n_edges = edges.count()
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        n_nxt = nxt.count()
        if n_nxt == n_edges and nxt.exceptAll(edges).isEmpty():
            edges = nxt
            break
        edges = nxt
        n_edges = n_nxt
    # At fixpoint every edge is (member, component-min); roots have no
    # outgoing edge and label themselves.
    roots = edges.groupBy("u").agg(F.min("v").alias("root"))
    return nodes.join(roots, nodes.node == roots.u, "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce("root", "node").alias("cluster_id"),
    )


def dedup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: cluster the verified MinHash near-dup pairs and
    emit per-doc cluster assignment plus the keep/drop verdict
    (canonical = the component's min doc_id)."""
    pairs = dedup_minhash_query(spark, sf_dir)
    comp = connected_components(pairs)
    return comp.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def dedup_clusters_star_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry twin of :func:`dedup_clusters_query` running the
    O(log^2 n)-round star algorithm instead of diameter-bound
    propagation; identical output contract, same oracle."""
    pairs = dedup_minhash_query(spark, sf_dir)
    comp = connected_components_star(pairs)
    return comp.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


DEDUP_CLUSTERS_ORACLE_SQL = f"""
WITH RECURSIVE pairs AS (
{DEDUP_MINHASH_ORACLE_SQL}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    WHERE e.dst != r.src
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
)
SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical FROM comp
"""


# ---------------------------------------------------------------------------
# Leakage-safe train/validation/test split
# ---------------------------------------------------------------------------
#
# A hash-split over doc_id silently leaks: two near-duplicate documents
# can land in train and test, inflating eval scores (the classic
# contamination mechanism the dedup literature warns about - see e.g.
# Lee et al., "Deduplicating Training Data Makes Language Models
# Better", ACL'22 §5). The leakage-safe split hashes the near-dup
# *cluster*, not the document, so every member of a duplicate group
# lands in the same partition by construction.
#
# Scale shape: the expensive part is the LSH pair detection + CC, both
# already bucketed / O(log n)-round (above); the split itself is one
# broadcast-or-shuffle left join of (doc_id -> cluster_id) onto the
# corpus plus pure column arithmetic - no extra shuffle beyond the
# join. The multiplicative hash is engine-portable integer arithmetic
# (identical in Spark and DuckDB), so the oracle checks the exact
# assignment, not just the ratios.

SPLIT_HASH_MOD = 1_000_003  # prime; bounds the product below 2^63
SPLIT_MULT = 2_654_435_761  # Knuth multiplicative-hash constant (2^32/phi)


def leakage_safe_split(docs: DataFrame, comp: DataFrame,
                       train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """(doc_id) corpus + (doc_id, cluster_id) components ->
    (doc_id, cluster_id, split) with whole clusters assigned to one
    split. Documents in no component are their own singleton cluster."""
    labeled = docs.join(comp.select("doc_id", "cluster_id"), "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    bucket = (
        (F.col("cluster_id") % F.lit(SPLIT_HASH_MOD)).cast("long")
        * F.lit(SPLIT_MULT) % F.lit(2**32) % F.lit(100)
    )
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "validation")
        .otherwise("test")
    )
    return labeled.select("doc_id", "cluster_id", split.alias("split"))


def leakage_safe_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 80/10/10 split of the documents corpus where
    MinHash-LSH near-duplicate clusters never straddle splits."""
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = connected_components(dedup_minhash_query(spark, sf_dir))
    return leakage_safe_split(docs, comp)


LEAKAGE_SAFE_SPLIT_ORACLE_SQL = f"""
WITH RECURSIVE pairs AS (
{DEDUP_MINHASH_ORACLE_SQL}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    WHERE e.dst != r.src
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
),
labeled AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
bucketed AS (
  SELECT doc_id, cluster_id,
         (cluster_id % 1000003) * 2654435761 % 4294967296 % 100 AS bucket
  FROM labeled
)
SELECT doc_id, cluster_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM bucketed
"""
