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


#: (path, mtime_ns, size) -> {column: physical arrow type string}.
#: Footer reads are O(KB) regardless of table size; keying on the
#: file's stat identity (not just path) means a regenerated file with a
#: different temporal encoding - the exact scenario this adaptive
#: reader exists for - is re-sniffed instead of decoded with stale
#: physical types.
_PHYSICAL_CACHE: dict[tuple[str, int, int], dict[str, str]] = {}


def _physical_types(path: str) -> dict[str, str]:
    import os

    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (path, -1, -1)
    if key not in _PHYSICAL_CACHE:
        try:
            import pyarrow.parquet as pq

            sch = pq.read_schema(path)
            _PHYSICAL_CACHE[key] = {f.name: str(f.type) for f in sch}
        except Exception:
            _PHYSICAL_CACHE[key] = {}
    return _PHYSICAL_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table with its declared schema,
    adapting to the file's actual temporal encoding.

    The driver REGENERATES the testdata between rounds and has already
    changed physical types once (events.ts went TIMESTAMP(NANOS) ->
    TIMESTAMP(MICROS) between rounds 1 and 2, silently corrupting every
    ts-derived value by 1000x under the old fixed reader). This reader
    sniffs the footer and handles the three temporal encodings Spark
    cannot freely coerce at scan time:

    - TIMESTAMP(NANOS): scanned as int64 nanos
      (``spark.sql.legacy.parquet.nanosAsLong``) and truncated to
      micros, matching how nanos-unaware readers like DuckDB downcast;
    - DATE where a TIMESTAMP is declared (or vice versa): read with the
      physical type, then cast to the declared type after the scan;
    - everything else: read directly with the declared schema.
    """
    path = f"{sf_dir}/{name}.parquet"
    declared = TESTDATA_SCHEMAS[name]
    phys = _physical_types(path)

    if any(t == "timestamp[ns]" for t in phys.values()):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.LongType() if phys.get(f.name) == "timestamp[ns]" else f.dataType,
                    True,
                )
                for f in declared.fields
            ]
        )
        df = spark.read.schema(raw).parquet(path)
        for f in declared.fields:
            if phys.get(f.name) == "timestamp[ns]":
                df = df.withColumn(
                    f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000"))
                )
        return df

    casts: list[str] = []
    read_fields = []
    for f in declared.fields:
        p = phys.get(f.name, "")
        if p.startswith("date") and isinstance(f.dataType, T.TimestampType):
            read_fields.append(T.StructField(f.name, T.DateType(), True))
            casts.append(f.name)
        elif p.startswith("timestamp") and isinstance(f.dataType, T.DateType):
            read_fields.append(T.StructField(f.name, T.TimestampType(), True))
            casts.append(f.name)
        else:
            read_fields.append(f)
    df = spark.read.schema(T.StructType(read_fields)).parquet(path)
    for i, f in enumerate(declared.fields):
        if f.name in casts:
            df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
    return df


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
