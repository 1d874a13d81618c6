"""Z-order (Morton curve) data-layout planning - the multi-dimension
clustering technique behind Delta OPTIMIZE ZORDER / Iceberg sort
orders, which is how a 100-TB table stays prunable on TWO query
dimensions at once (a single-column sort clusters one dimension and
shreds the other; bit-interleaving the two bucket ranks keeps both
dimensions' min/max file ranges narrow, so data skipping works for
either predicate).

The operator is the LAYOUT PLANNER: assign each row a Morton code
from its two bucket ranks, range-partition rows into files by that
code, and emit the per-file zone map (row count + min/max of both
dimensions) - exactly the statistics a lakehouse transaction log
records for file skipping. Everything is deterministic (ties broken
on the unique order key), so a DuckDB twin reproduces it hash-exact.

Scale shape: two ntile windows (bucket ranks), one ntile on the
Morton code (the range partition), one groupBy(file) - all linear,
no joins. On a real cluster the global sorts are what
``repartitionByRange`` already implements via reservoir-sampled
range bounds; the window spelling here is its deterministic,
oracle-checkable twin at bench scale. The zone-map output is
file-count-sized, not row-sized.

Reference scope: the reference has no layout planner (it bulk-loads
into Elasticsearch / Redshift and lets the store index); this is part
of the LLM-pipeline extension surface where the engine, not a serving
store, owns 100-TB table layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table

#: bucket-rank bits per dimension (256 buckets each)
Z_BITS = 8
#: target file count for the planned layout
N_FILES = 32


def morton_col(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two integer columns:
    result bit 2k is a's bit k, bit 2k+1 is b's bit k. Pure integer
    expression - stays inside whole-stage codegen."""
    out = F.lit(0)
    for k in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a, k).bitwiseAND(F.lit(1)), 2 * k)
            + F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        )
    return out


def zorder_plan(
    df: DataFrame,
    key_col: str,
    dim_a: str,
    dim_b: str,
    n_files: int = N_FILES,
) -> DataFrame:
    """Per-file zone map for a Z-ordered layout of ``df`` on
    (dim_a, dim_b). Bucket ranks come from ntile(2^Z_BITS) per
    dimension (rank-based, so skewed value distributions still fill
    the curve evenly); files from ntile(n_files) on the Morton code;
    ties broken on ``key_col`` for determinism."""
    n_buckets = 1 << Z_BITS
    wa = Window.orderBy(dim_a, key_col)
    wb = Window.orderBy(dim_b, key_col)
    bucketed = df.select(
        F.col(key_col).alias("row_key"),
        (F.ntile(n_buckets).over(wa) - 1).alias("bucket_a"),
        (F.ntile(n_buckets).over(wb) - 1).alias("bucket_b"),
    ).withColumn("zval", morton_col(F.col("bucket_a"), F.col("bucket_b")))
    wz = Window.orderBy("zval", "row_key")
    return (
        bucketed.withColumn("file_id", F.ntile(n_files).over(wz))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("bucket_a").alias("a_min"),
            F.max("bucket_a").alias("a_max"),
            F.min("bucket_b").alias("b_min"),
            F.max("bucket_b").alias("b_max"),
        )
        .orderBy("file_id")
    )


def skipping_fraction(plan_rows: list, dim: str) -> float:
    """Average fraction of files a single-bucket point predicate on
    ``dim`` ('a' or 'b') must read, given a zone-map plan (list of
    rows with {dim}_min/{dim}_max). The data-skipping effectiveness
    metric: lower is better, 1/n_files is perfect clustering."""
    n_buckets = 1 << Z_BITS
    lo, hi = f"{dim}_min", f"{dim}_max"
    hits = sum(
        sum(1 for r in plan_rows if r[lo] <= c <= r[hi])
        for c in range(n_buckets)
    )
    return hits / (n_buckets * len(plan_rows))


def zorder_repartition(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    n_files: int = N_FILES,
) -> DataFrame:
    """The cluster-scale write path: same Morton code, but files come
    from ``repartitionByRange`` (reservoir-sampled range bounds - no
    global sort, no single-partition window), which is what an actual
    100-TB OPTIMIZE ZORDER job runs. Bucket ranks here use value
    buckets (min/max scaled), avoiding the rank windows entirely; the
    deterministic ntile spelling in :func:`zorder_plan` exists for the
    hash-exact oracle, this one for throughput. Returns the input
    with a ``zval`` column, partitioned so each output partition is
    one layout file."""
    n_buckets = 1 << Z_BITS
    stats = df.select(
        F.min(dim_a).alias("a_lo"), F.max(dim_a).alias("a_hi"),
        F.min(dim_b).alias("b_lo"), F.max(dim_b).alias("b_hi"),
    )
    def bucket(col: str, lo: str, hi: str) -> Column:
        return F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(col) - F.col(lo))
                * n_buckets
                / (F.col(hi) - F.col(lo) + 1)
            ).cast("int"),
        )

    with_buckets = df.join(F.broadcast(stats)).select(
        df["*"],
        bucket(dim_a, "a_lo", "a_hi").alias("_ba"),
        bucket(dim_b, "b_lo", "b_hi").alias("_bb"),
    )
    return (
        with_buckets.withColumn("zval", morton_col(F.col("_ba"), F.col("_bb")))
        .drop("_ba", "_bb")
        .repartitionByRange(n_files, "zval")
    )


def zorder_layout_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: Z-order layout plan for ``orders`` on
    (o_custkey, o_orderdate) - the two columns an account-history
    workload filters by."""
    orders = load_table(spark, sf_dir, "orders")
    return zorder_plan(orders, "o_orderkey", "o_custkey", "o_orderdate")


ZORDER_LAYOUT_ORACLE_SQL = f"""
WITH bucketed AS (
  SELECT o_orderkey AS row_key,
         ntile({1 << Z_BITS}) OVER (ORDER BY o_custkey, o_orderkey) - 1
           AS bucket_a,
         ntile({1 << Z_BITS}) OVER (ORDER BY o_orderdate, o_orderkey) - 1
           AS bucket_b
  FROM orders
),
coded AS (
  SELECT row_key, bucket_a, bucket_b,
         {" + ".join(
             f"(((bucket_a >> {k}) & 1) << {2 * k})"
             f" + (((bucket_b >> {k}) & 1) << {2 * k + 1})"
             for k in range(Z_BITS)
         )} AS zval
  FROM bucketed
),
filed AS (
  SELECT bucket_a, bucket_b,
         ntile({N_FILES}) OVER (ORDER BY zval, row_key) AS file_id
  FROM coded
)
SELECT file_id,
       count(*) AS n_rows,
       min(bucket_a) AS a_min,
       max(bucket_a) AS a_max,
       min(bucket_b) AS b_min,
       max(bucket_b) AS b_max
FROM filed
GROUP BY file_id
ORDER BY file_id
"""
