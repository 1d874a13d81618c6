"""Two engine capabilities covered as tests rather than registry
queries, each with a documented reason to stay off the hot path.

- **RocksDB state store**: the default HDFS-backed state store keeps
  all streaming state on the JVM heap - fine at fixture scale, OOM at
  100 TB key cardinality. RocksDB spills state to local disk with
  bounded memory; it is a config swap, so the test proves the swap
  works (provider is honored, dedup semantics unchanged) rather than
  benchmarking it.
- **Python UDTF** (SURVEY §2.10: the reference has none): supported
  end-to-end, but a UDTF runs row-at-a-time Python - the JVM
  split+posexplode plan computes the identical result entirely inside
  codegen, which is why no registry query uses a UDTF. The test pins
  both facts: the API works, and the JVM equivalence that justifies
  avoiding it.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rocksdb_state_store_dedup(spark, sf_dir, tmp_path):
    """Streaming dedup under the RocksDB provider must equal DISTINCT
    over the input - same semantics, disk-backed state. The provider
    class is a per-query SQL conf (read at stream start), so it is
    set on the shared session and restored."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey")
        .limit(500)
    )
    dup = orders.union(orders.limit(200))  # re-deliveries
    dup.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "o_orderkey long, o_custkey long"
    ).parquet(src)
    try:
        q = (
            stream.dropDuplicates(["o_orderkey"])
            .writeStream.format("memory")
            .queryName("rocksdb_dedup")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table("rocksdb_dedup").count()
        assert got == orders.count()
    finally:
        spark.catalog.dropTempView("rocksdb_dedup")
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)


def test_udtf_matches_jvm_explode(spark, sf_dir):
    """A lateral-joined Python UDTF must agree with the codegen'd
    split+posexplode plan - the equivalence that keeps UDTFs out of
    every hot path in this engine."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            if text:
                for i, w in enumerate(text.split()):
                    yield w, i

    spark.udtf.register("split_words", SplitWords)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length(F.trim("text")) > 0)
        .limit(50)
    )
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT doc_id, word, pos FROM udtf_docs, "
        "LATERAL split_words(text)"
    )
    via_jvm = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "word"),
    ).select("doc_id", "word", "pos")
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, via_jvm.collect())
    )
    spark.catalog.dropTempView("udtf_docs")


def test_fused_sql_inference_plan_is_one_codegen_span(spark, sf_dir):
    """The ICDE'25 fusion claim, pinned: featurization + scoring live
    inside whole-stage codegen - no Python eval node, no exchange,
    exactly one parquet scan."""
    from data_pipeline_capstone_project_spark.operators.inference import (
        fused_sql_inference_query,
    )

    df = fused_sql_inference_query(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan
    assert "Exchange" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "*(1)" in plan, plan  # whole-stage codegen span exists
