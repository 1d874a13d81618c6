"""Schema-on-read semantics (SURVEY §1.3: the lake's implicit,
evolving schema - 5 post media-types x 2 connection-types with
differing key sets, plus ES dynamic mapping - re-expressed as explicit
nullable superset schemas).

Two contracts a long-lived 100 TB lake depends on:
- **evolution**: old files stay readable when new files add columns
  (mergeSchema union read, missing values null);
- **resilience**: one malformed JSON record quarantines into
  ``_corrupt_record`` instead of failing the scan (PERMISSIVE mode,
  the COPY TRUNCATECOLUMNS/BLANKSASNULL spirit).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

import pytest
# quick smoke lane (VERDICT r13 item 8): this file is part of the
# ~1-minute `-m quick` subset; the full suite stays the snapshot gate
pytestmark = pytest.mark.quick



def test_parquet_merge_schema_evolution(spark, tmp_path):
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, caption string"
    ).write.parquet(os.path.join(out, "wave=1"))
    spark.createDataFrame(
        [(2, "b", 42)], "id long, caption string, like_count long"
    ).write.parquet(os.path.join(out, "wave=2"))
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) >= {"id", "caption", "like_count"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["like_count"] is None  # old file: null-backfilled
    assert rows[2]["like_count"] == 42


def test_permissive_json_quarantines_corrupt_record(spark, tmp_path):
    src = tmp_path / "lake"
    src.mkdir()
    (src / "good.json").write_text('{"id": "1", "like_count": 10}\n')
    (src / "bad.json").write_text('{"id": "2", "like_count": ###}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("like_count", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(src))
        .cache()  # corrupt-record column requires a materialized scan
    )
    good = df.filter(F.col("_corrupt_record").isNull()).collect()
    bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert [(r["id"], r["like_count"]) for r in good] == [("1", 10)]
    assert len(bad) == 1 and "###" in bad[0]["_corrupt_record"]
    df.unpersist()


def test_load_table_adapts_to_date_regeneration(spark, tmp_path):
    """The driver regenerates testdata between rounds and has already
    switched temporal encodings once (TIMESTAMP(NANOS) -> MICROS,
    which corrupted 14 queries under a fixed reader). load_table must
    keep the declared schema stable if a timestamp column ships as
    DATE."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_capstone_project_spark.sources.readers import load_table

    t = pq.read_table("/root/testdata/sf0.001/orders.parquet")
    idx = t.schema.get_field_index("o_orderdate")
    t2 = t.set_column(
        idx, pa.field("o_orderdate", pa.date32()), t.column(idx).cast(pa.date32())
    )
    pq.write_table(t2, str(tmp_path / "orders.parquet"))
    df = load_table(spark, str(tmp_path), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    ref = load_table(spark, "/root/testdata/sf0.001", "orders")
    assert df.count() == ref.count()
    assert (
        df.select("o_orderkey", "o_orderdate")
        .exceptAll(ref.select("o_orderkey", "o_orderdate"))
        .count()
        == 0
    )
