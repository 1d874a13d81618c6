"""Incremental MinHash-LSH near-dup detection over a document stream.

The batch LSH operator (:func:`..operators.dedup.dedup_minhash_query`)
recomputes all pairs from scratch; at 100 TB with a daily arrival of
~0.1% new documents that is a 1000x waste. This operator maintains a
persistent LSH *index* — two append-only keyed stores,
``(doc_id, band, bucket)`` and ``(doc_id, shs)`` — and per micro-batch
only does work proportional to |batch| x bucket-collision rate:

1. shingle + band the NEW docs (identical coefficients to the batch
   operator, via the shared :func:`..operators.dedup.bands_of_shingles`);
2. equi-join the batch's bands against index ∪ batch on
   ``(band, bucket)`` — candidates therefore always involve >= 1 new
   doc; prior-vs-prior pairs were emitted by an earlier batch and are
   never recomputed;
3. verify candidates with exact Jaccard (``array_intersect``) against
   the shingle store, emit verified pairs normalized to
   ``doc_a < doc_b``, and append the batch's bands + shingles to the
   index.

Correctness gate: the union of all per-batch emissions must equal the
from-scratch batch result, so the registry entry shares
``DEDUP_MINHASH_ORACLE_SQL`` verbatim — the incremental path is
hash-checked against the recompute-the-world semantics it replaces.

At scale: both stores are keyed tables (Delta/Iceberg partitioned by
``band`` / bucketed by ``doc_id``); the band join is a shuffle on
(band, bucket) sized by the batch, not the corpus, and the shingle
verification join touches only candidate doc_ids (a semi-joined read
of the store, not a full scan). Reference parity: this is the
streaming twin of its idempotent per-PUT ingest (SURVEY ST1) applied
to the dedup problem the reference never solved.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import (
    JACCARD_THRESHOLD,
    bands_of_shingles,
    shingles_of_docs,
)
from ..sources.readers import load_table

_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
    ]
)
_SHINGLES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shs", T.ArrayType(T.LongType())),
    ]
)
_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)


def _store(
    spark: SparkSession, path: str, schema: T.StructType,
    exclude_epoch: int | None = None,
) -> DataFrame:
    """Read the accumulated store: one ``e<epoch>`` subdirectory per
    merged micro-batch. ``exclude_epoch`` drops the CURRENT epoch's
    directory from the read so a foreachBatch replay (at-least-once)
    recomputes from exactly the prior-epoch state - the epoch's own
    partial output from a crashed attempt is invisible and gets
    overwritten, never double-counted."""
    if os.path.isdir(path):
        dirs = [
            os.path.join(path, d)
            for d in sorted(os.listdir(path))
            if d.startswith("e") and d != f"e{exclude_epoch}"
        ]
        if dirs:
            return spark.read.schema(schema).parquet(*dirs)
    return spark.createDataFrame([], schema)


def lsh_index_merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    bands_dir: str,
    shingles_dir: str,
    pairs_dir: str,
    epoch_id: int = 0,
) -> None:
    """Process one micro-batch of (doc_id, text) against the index.

    Idempotent under foreachBatch's at-least-once replay: every store
    write goes to an ``e<epoch>`` directory with overwrite semantics
    and every store READ excludes the current epoch, so a crashed
    attempt's partial output is simply rewritten - the previous
    append-mode design double-counted a replayed batch in all three
    stores."""
    # A file-source micro-batch arrives with the staged file's layout —
    # often ONE partition (one file per trigger). Shingling + banding
    # are the CPU-heavy phases; left as-is they run single-threaded per
    # batch. Spread the batch before hashing — the shuffle moves only
    # (doc_id, text), far cheaper than serializing the shingle work.
    # Sized to the stream's shuffle-partition setting, NOT
    # defaultParallelism: AQE is disabled inside streaming, so an
    # over-wide repartition here becomes a storm of unmergeable
    # per-task overheads on every downstream shuffle.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if batch.rdd.getNumPartitions() < n_shuffle:
        batch = batch.repartition(n_shuffle)
    # persist, not eager localCheckpoint: both are compute-once, but
    # persist materializes DURING the first consuming job instead of
    # paying a dedicated materialization job per batch — at 3 batches
    # x 2 intermediates that is 6 fewer job launches per invocation.
    sh_new = shingles_of_docs(batch).persist()
    bands_new = bands_of_shingles(sh_new).persist()

    bands_all = _store(
        spark, bands_dir, _BANDS_SCHEMA, exclude_epoch=epoch_id
    ).unionByName(bands_new)
    sh_all = _store(
        spark, shingles_dir, _SHINGLES_SCHEMA, exclude_epoch=epoch_id
    ).unionByName(sh_new)

    # Candidates: new docs vs (index ∪ batch). Normalizing to
    # (least, greatest) makes within-batch pairs (seen from both
    # sides) collapse under distinct and match the batch operator's
    # doc_a < doc_b convention.
    probe = bands_new.select(F.col("doc_id").alias("new_id"), "band", "bucket")
    build = bands_all.select(F.col("doc_id").alias("other_id"), "band", "bucket")
    cands = (
        probe.join(build, ["band", "bucket"])
        .filter(F.col("new_id") != F.col("other_id"))
        .select(
            F.least("new_id", "other_id").alias("doc_a"),
            F.greatest("new_id", "other_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sh_all.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    sb = sh_all.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    common = F.size(F.array_intersect("shs_a", "shs_b"))
    verified = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (common / (F.size("shs_a") + F.size("shs_b") - common)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    # The three epoch-directory writes are independent (distinct
    # outputs; `verified`'s store reads captured their directory
    # listings at plan-build time, before any e<epoch> dir exists), so
    # they overlap in a driver thread pool (guide §2.6) instead of
    # paying three sequential job launches per micro-batch - at three
    # batches per invocation that is nine serialized tiny jobs saved.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        futures = [
            pool.submit(
                lambda df=df, d=d: df.write.mode("overwrite").parquet(
                    os.path.join(d, f"e{epoch_id}")
                )
            )
            for df, d in (
                (verified, pairs_dir),
                (bands_new, bands_dir),
                (sh_new, shingles_dir),
            )
        ]
        for f in futures:
            f.result()
    bands_new.unpersist()
    sh_new.unpersist()


def streaming_lsh_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: three-batch incremental ingest of the documents
    table (doc_id % 3 arrival order, one file per micro-batch) whose
    accumulated pair log must equal the from-scratch batch LSH result
    — same oracle SQL, hash-compared."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="stream_lsh_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    bands_dir, shingles_dir, pairs_dir = (
        os.path.join(work, d) for d in ("bands", "shingles", "pairs")
    )
    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    try:
        # Concurrent staging (guide §2.6): three independent
        # single-task writes; pair-log union is arrival-order
        # invariant, the stamp just keeps epoch numbering stable.
        from . import stage_waves_concurrently

        wave_dirs = [os.path.join(src, f"wave{w}") for w in range(3)]
        stage_waves_concurrently(
            [
                lambda w=w, o=o: docs.filter(
                    F.col("doc_id") % 3 == w
                ).coalesce(1).write.parquet(o)
                for w, o in enumerate(wave_dirs)
            ],
            wave_dirs,
        )
        stream = (
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        from . import sized_state_partitions

        with sized_state_partitions(spark):
            q = (
                stream.writeStream.foreachBatch(
                    lambda batch, epoch: lsh_index_merge_batch(
                        spark, batch, bands_dir, shingles_dir, pairs_dir,
                        epoch_id=epoch,
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        pairs = _store(spark, pairs_dir, _PAIRS_SCHEMA)
        # Distributed materialization at the harness boundary: the
        # staged inputs are deleted in the finally block, so the result
        # must be computed eagerly - but in the executors' block
        # manager (localCheckpoint), never as a driver collect(). At
        # 100x the result stays partitioned across the cluster.
        return pairs.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
