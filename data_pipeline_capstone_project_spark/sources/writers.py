"""Batch sinks (SURVEY §2.2).

Each function re-expresses one reference sink as a declarative Spark
write; the ES upsert sink (K1) lives in
:mod:`..streaming.upsert_stream` as the ``foreachBatch`` merge.

- K2 parquet overwrite (``spark_image.py:203-204``) - the reference
  emitted 200 tiny files from default shuffle partitions
  (``README.md:351``); here AQE partition coalescing plus an optional
  explicit file-count target fixes that.
- K3 CSV put (``get_elastic_data.py:102-118``) - header row, one file
  per logical dataset (the reference wrote a single S3 object).
- K5 INSERT INTO ... SELECT (``load_fact.py:32``).
- K6 TRUNCATE-then-load full refresh (``stage_redshift.py:48``,
  ``load_fact.py:30-31``) - ``mode("overwrite")``.

Scale notes: partitioned parquet with a date/key layout is what makes
ST6-style retention (drop old partitions) and partition pruning work at
100 TB; ``coalesce`` for small outputs happens *after* the heavy plan,
so it never caps upstream parallelism (unlike ``repartition(1)`` before
the agg, which would).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet_overwrite(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    target_files: int | None = None,
) -> None:
    """K2/K6: full-refresh parquet. ``partition_by`` gives the pruning
    layout (e.g. ingest date for retention); ``target_files`` caps
    output file count for small results (the 200-tiny-files fix)."""
    out = df.coalesce(target_files) if target_files else df
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """K3: header CSV; ``single_file`` mirrors the reference's one
    S3 object per run (fine for agg outputs, never for raw data)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def insert_overwrite_table(df: DataFrame, table: str) -> None:
    """K5+K6: TRUNCATE + INSERT INTO ... SELECT as one atomic
    ``insertInto`` overwrite (needs an existing saved table)."""
    df.write.mode("overwrite").insertInto(table, overwrite=True)


def save_as_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: tuple[int, str] | None = None,
) -> None:
    """Create-or-replace a managed table; ``bucket_by=(n, key)`` writes
    the co-located layout the no-shuffle joins rely on
    (tests/test_bucketing.py)."""
    writer = df.write.mode("overwrite").option("path", path)
    if bucket_by:
        n, key = bucket_by
        writer = writer.bucketBy(n, key).sortBy(key)
    writer.saveAsTable(table)


def compact(
    spark,
    path: str,
    target_file_mb: int = 256,
) -> int:
    """Small-file compaction (table maintenance): rewrite a parquet
    prefix into files of roughly ``target_file_mb`` each and return the
    new file count.

    Streaming ingest (availableNow micro-batches) and over-partitioned
    writes accumulate small files; at 100 TB the file-listing and
    per-file open costs dominate scans long before data volume does.
    Compaction = read + coalesce to ceil(bytes/target) + atomic swap
    (write tmp, replace). Local filesystem rename stands in for the
    object-store commit protocol.
    """
    import math
    import shutil

    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + ".compact_tmp"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_clustered(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
) -> None:
    """Sort-clustered parquet write: range-partition on ``sort_cols``
    then sort within partitions before writing.

    Why this matters at 100 TB: parquet stores per-row-group min/max
    stats, and the reader skips whole row groups whose range cannot
    match a pushed predicate. On an unsorted write every row group
    spans nearly the full value range (no skipping possible); after
    clustering, row-group ranges are narrow and mostly disjoint, so a
    selective range filter reads a small fraction of the file. This
    is the poor-man's z-order for the single-dimension case - the
    standard layout for time-partitioned fact tables queried by time
    range (SURVEY ST6's 180-day retention scans).

    ``repartitionByRange`` gives global clustering (file-level ranges
    are disjoint too, enabling file skipping); ``sortWithinPartitions``
    orders inside each file so row groups subdivide the range.
    """
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 12,
    n_files: int = 8,
) -> None:
    """Z-order (Morton-curve) clustered write over TWO columns.

    1-D sort clustering (:func:`write_clustered`) makes range scans on
    the sort key skip files, but a filter on any OTHER column still
    reads everything. Interleaving the bits of two rank-scaled keys
    orders rows along a space-filling curve, so every file covers a
    small square in (a, b) space - and a selective range on EITHER
    column skips most files. This is the layout Delta/Iceberg expose
    as OPTIMIZE ZORDER BY; here it is ~20 lines of expressions.

    Keys are min-max scaled to ``bits`` levels (one cheap global agg;
    rank-scaling via approxQuantile handles skewed distributions, not
    needed for these fixtures). The interleave is a statically
    unrolled OR of 2*bits shift terms - well inside the codegen
    method budget (see README lesson 4).

    File routing is by the top ``log2(n_files)`` bits of z, not by
    range-partitioning the raw z value: sampled range boundaries land
    on data quantiles, so a file can straddle a bit boundary of the
    curve and a 1/n range filter then touches one extra file
    (observed: 5-of-8 where theory says 4). Range-partitioning the
    DISCRETE bucket id instead is exact - a range partitioner never
    splits one key value across partitions - so every file covers a
    whole z-prefix square and the skip counts are deterministic.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a).cast("double"),
        F.max(col_a).cast("double"),
        F.min(col_b).cast("double"),
        F.max(col_b).cast("double"),
    ).first()
    levels = float(1 << bits)

    def bucket(col: str, lo: float, hi: float):
        span = (hi - lo) or 1.0
        raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * levels)
        return F.least(raw, F.lit((1 << bits) - 1)).cast("long")

    ba, bb = bucket(col_a, lo_a, hi_a), bucket(col_b, lo_b, hi_b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        term_a = F.shiftleft(F.shiftright(ba, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term_b = F.shiftleft(F.shiftright(bb, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z.bitwiseOR(term_a).bitwiseOR(term_b)
    file_bits = max(1, (n_files - 1).bit_length())
    zfile = F.shiftright(z, 2 * bits - file_bits)
    (
        df.withColumn("__z", z)
        .withColumn("__zfile", zfile)
        .repartitionByRange(n_files, "__zfile")
        .sortWithinPartitions("__z")
        .drop("__z", "__zfile")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink - the warehouse-native columnar alternative to parquet
    (Redshift COPY accepts both, ``stage_redshift.py:77-82`` handles
    the columnar path). Same pushdown/pruning behavior as parquet in
    Spark; kept thin because format choice is a write-time option, not
    an architecture."""
    df.write.mode("overwrite").orc(path)


def write_text_lines(df: DataFrame, col: str, path: str) -> None:
    """Single-column text sink (one line per row) - the lowest common
    denominator for exporting document corpora to line-oriented
    tools."""
    df.select(F.col(col).cast("string").alias("value")).write.mode(
        "overwrite"
    ).text(path)
