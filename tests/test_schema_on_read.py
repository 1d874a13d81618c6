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
