"""Batch readers.

Replaces the reference's ingest surface with declarative Spark sources:

- S3 JSON object gets (reference ``s3-to-es_aws.py:146-171``,
  ``statsApp.py:78-103``)  -> ``spark.read.schema(...).json`` over a
  lake prefix, with the file-metadata envelope projected from Spark's
  ``_metadata`` hidden column instead of boto3 head fields.
- Redshift ``COPY ... json/csv/parquet`` (``stage_redshift.py:56-82``)
  -> ``spark.read.{json,csv,parquet}`` with the same load semantics
  (BLANKSASNULL / EMPTYASNULL / TRUNCATECOLUMNS / IGNOREHEADER).
- The image/binary store (``spark_image.py:182-183``) ->
  ``format("binaryFile")``.

All readers take explicit schemas (no runtime inference) so column
pruning and predicate pushdown hit the scan, which is what matters at
100 TB: a scan that reads 3 of 25 columns and skips non-matching
row groups is the difference between minutes and hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_SCHEMAS


def _events_ts_physical(path: str) -> str:
    """Physical parquet type of ``events.ts`` ('ns' or 'us').

    The driver has shipped both encodings across rounds: TIMESTAMP(NANOS)
    (which Spark's vectorized reader rejects) and plain TIMESTAMP(MICROS).
    Sniffing the footer once per load keeps the reader correct under
    either; footer reads are O(KB) regardless of table size.
    """
    try:
        import pyarrow.parquet as pq

        return "ns" if str(pq.read_schema(path).field("ts").type) == "timestamp[ns]" else "us"
    except Exception:
        return "us"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table with its declared schema.

    When ``events.ts`` is physically TIMESTAMP(NANOS) it is scanned as
    raw int64 nanos (``spark.sql.legacy.parquet.nanosAsLong``) and
    truncated to a microsecond timestamp, matching how nanos-unaware
    readers like DuckDB downcast.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _events_ts_physical(path) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
        return (
            spark.read.schema(raw)
            .parquet(path)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_json_lake(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    with_envelope: bool = True,
) -> DataFrame:
    """Read a file-per-record JSON lake prefix.

    ``with_envelope`` adds the reference's document envelope
    (objectKey / createdDate / content_length; ``s3-to-es_aws.py:164-168``)
    from the scan's own file metadata - no extra I/O, and createdDate
    (file modification time) is the latest-wins ordering key.
    """
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    if with_envelope:
        df = df.select(
            "*",
            F.col("_metadata.file_path").alias("objectKey"),
            F.col("_metadata.file_modification_time").alias("createdDate"),
            F.col("_metadata.file_size").alias("content_length"),
        )
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV load with Redshift-COPY-equivalent semantics
    (``IGNOREHEADER 1`` -> header=True; ``EMPTYASNULL`` -> emptyValue
    treated as null, Spark's default for typed columns)."""
    reader = spark.read.option("header", header).option("nullValue", "")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def blanks_as_null(df: DataFrame, *cols: str, truncate_to: int | None = None) -> DataFrame:
    """Apply ``BLANKSASNULL EMPTYASNULL TRUNCATECOLUMNS`` column
    semantics (reference ``stage_redshift.py:63-64``) to string cols."""
    for c in cols or [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]:
        expr = F.when(F.trim(F.col(c)) == "", None).otherwise(F.col(c))
        if truncate_to is not None:
            expr = F.substring(expr, 1, truncate_to)
        df = df.withColumn(c, expr)
    return df


def read_binary_store(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Binary/image store scan (reference ``spark_image.py:182-183``).

    Uses ``binaryFile`` (path, modificationTime, length, content) as the
    universal substrate; image decode happens in the multimodal
    operators, not at scan time, so corrupt files can be dropped
    per-record instead of failing the scan.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.option("recursiveFileLookup", True).load(path)
