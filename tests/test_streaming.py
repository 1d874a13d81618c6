from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_capstone_project_spark.streaming.upsert_stream import (
    streaming_upsert_run,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("createdDate", T.TimestampType()),
        T.StructField("like_count", T.LongType()),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_two_wave_latest_wins(spark, tmp_path):
    """Replay fixture files in two waves with overlapping keys
    (SURVEY §5 end-to-end strategy): newest createdDate wins, mirroring
    ES _version behavior (README.md:373,432)."""
    src, tgt, ckpt = (str(tmp_path / d) for d in ("src", "tgt", "ckpt"))
    os.makedirs(src)
    os.makedirs(tgt)
    t0 = dt.datetime(2021, 1, 1)
    t1 = dt.datetime(2021, 1, 2)
    order = lambda: [F.col("createdDate").desc(), F.col("id").desc()]  # noqa: E731

    _rows(
        spark, [("a", t0, 10), ("b", t0, 20)]
    ).write.parquet(f"{src}/wave1")
    streaming_upsert_run(spark, f"{src}/*", tgt, ckpt, SCHEMA, ["id"], order)
    state1 = {r["id"]: r["like_count"] for r in spark.read.schema(SCHEMA).parquet(tgt).collect()}
    assert state1 == {"a": 10, "b": 20}

    # wave 2: update b, insert c; a must survive untouched
    _rows(
        spark, [("b", t1, 99), ("c", t1, 30)]
    ).write.parquet(f"{src}/wave2")
    streaming_upsert_run(spark, f"{src}/*", tgt, ckpt, SCHEMA, ["id"], order)
    state2 = {r["id"]: r["like_count"] for r in spark.read.schema(SCHEMA).parquet(tgt).collect()}
    assert state2 == {"a": 10, "b": 99, "c": 30}


def test_stateful_running_stats(spark):
    """applyInPandasWithState: per-key state accumulates across the two
    deterministic micro-batches - batch 2 rows must show cumulative
    counts (wave1 + wave2) and the lifted max (value + 1000)."""
    from data_pipeline_capstone_project_spark.streaming.stateful import (
        streaming_stateful_query,
    )

    out = streaming_stateful_query(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user, "no emissions"
    for user, emits in by_user.items():
        assert len(emits) in (1, 2)  # wave2 only covers event_id % 3 == 0
        if len(emits) == 2:
            first, second = sorted(emits, key=lambda r: r["cum_events"])
            assert second["cum_events"] == first["cum_events"] + second["batch_events"]
            assert second["cum_max"] >= first["cum_max"]


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running with no new files is a no-op (checkpoint log skips
    processed files) - at-least-once delivery stays correct."""
    src, tgt, ckpt = (str(tmp_path / d) for d in ("src", "tgt", "ckpt"))
    os.makedirs(src)
    os.makedirs(tgt)
    t0 = dt.datetime(2021, 1, 1)
    order = lambda: [F.col("createdDate").desc(), F.col("id").desc()]  # noqa: E731
    _rows(spark, [("a", t0, 1)]).write.parquet(f"{src}/w")
    streaming_upsert_run(spark, f"{src}/*", tgt, ckpt, SCHEMA, ["id"], order)
    before = spark.read.schema(SCHEMA).parquet(tgt).collect()
    streaming_upsert_run(spark, f"{src}/*", tgt, ckpt, SCHEMA, ["id"], order)
    after = spark.read.schema(SCHEMA).parquet(tgt).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_incremental_lsh_equals_batch(spark, sf_dir):
    """The three-batch incremental LSH index must emit exactly the
    from-scratch batch pair set: every pair once (no re-emission on
    later batches), including pairs whose docs arrived in different
    micro-batches (the index lookup path)."""
    from data_pipeline_capstone_project_spark.operators.dedup import (
        dedup_minhash_query,
    )
    from data_pipeline_capstone_project_spark.streaming.lsh_dedup_stream import (
        streaming_lsh_dedup_query,
    )

    batch = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_query(spark, sf_dir).collect()
    }
    inc_rows = streaming_lsh_dedup_query(spark, sf_dir).collect()
    inc = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in inc_rows}

    assert len(inc_rows) == len(inc)  # no pair emitted twice
    assert inc.keys() == batch.keys()
    for k, j in batch.items():
        assert abs(inc[k] - j) < 1e-12
    # the interesting path: at least one pair crossed micro-batches
    assert any(a % 3 != b % 3 for a, b in inc), "no cross-batch pair exercised"


def test_stream_stream_join_matches_batch_and_crosses_batches(spark, sf_dir):
    """The watermarked stream-stream interval join must equal the
    batch join (no late drops: watermark > corpus span) and must match
    across micro-batches - a view arriving in wave 1 joined to a
    purchase arriving in wave 2 proves buffered state, not
    within-batch luck."""
    from data_pipeline_capstone_project_spark.streaming.join_stream import (
        streaming_join_query,
    )
    from data_pipeline_capstone_project_spark.sources.readers import load_table

    got = {
        (r["purchase_id"], r["view_id"]): r["lag_us"]
        for r in streaming_join_query(spark, sf_dir).collect()
    }

    events = load_table(spark, sf_dir, "events")
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
        F.col("user_id").alias("vu"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        "user_id",
    )
    batch = p.join(
        v,
        (F.col("user_id") == F.col("vu"))
        & (F.col("vts") <= F.col("pts"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
    )
    expect = {
        (r["purchase_id"], r["view_id"]): r["lag"]
        for r in batch.select(
            "purchase_id",
            "view_id",
            (F.unix_micros("pts") - F.unix_micros("vts")).alias("lag"),
        ).collect()
    }
    assert got == expect
    assert any(pid % 2 != vid % 2 for pid, vid in got), "no cross-batch match"


def test_streaming_session_equals_batch_sessionize(spark, sf_dir):
    """Native session_window in the stream must produce exactly the
    batch gaps-and-islands sessions: same (user, start, size) triples,
    close = last event + gap."""
    from data_pipeline_capstone_project_spark.operators.analytics import (
        SESSION_GAP_MIN,
        sessionize_query,
    )
    from data_pipeline_capstone_project_spark.streaming.session_stream import (
        streaming_session_query,
    )

    stream_rows = {
        (r["user_id"], r["session_start_us"], r["n_events"]): r["session_close_us"]
        for r in streaming_session_query(spark, sf_dir).collect()
    }
    batch_rows = {
        (r["user_id"], r["session_start_us"], r["n_events"]): r["session_end_us"]
        for r in sessionize_query(spark, sf_dir).collect()
    }
    assert stream_rows.keys() == batch_rows.keys()
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    for k, close in stream_rows.items():
        assert close == batch_rows[k] + gap_us


def test_multi_sink_epoch_overwrite_is_idempotent(spark, sf_dir, tmp_path):
    """Re-executing the same epoch must not change either sink;
    writing the same data under a NEW epoch must (the epoch directory
    is the dedup key - this is the mechanism, not an accident)."""
    from data_pipeline_capstone_project_spark.operators.upsert import latest_wins  # noqa: F401  (import parity)
    from data_pipeline_capstone_project_spark.streaming.multi_sink import (
        fanout_batch,
    )
    from data_pipeline_capstone_project_spark.sources.readers import load_table

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    detail, agg = str(tmp_path / "detail"), str(tmp_path / "agg")
    fanout_batch(batch, 0, detail, agg)
    n0 = spark.read.parquet(detail).count()
    fanout_batch(batch, 0, detail, agg)  # replay: absorbed
    assert spark.read.parquet(detail).count() == n0
    fanout_batch(batch, 1, detail, agg)  # genuinely new epoch: appends
    assert spark.read.parquet(detail).count() == 2 * n0


def test_transform_state_emission_log(spark, sf_dir):
    from data_pipeline_capstone_project_spark.streaming.transform_state import (
        streaming_transform_state_query,
    )

    rows = streaming_transform_state_query(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, emits in by_user.items():
        # exactly one emission per micro-batch the key appeared in
        assert 1 <= len(emits) <= 2
        emits.sort(key=lambda r: r.cum_events)
        # cumulative state is monotone and consistent with the batch
        # delta; batch-1 emission has cum == batch
        assert emits[0].cum_events == emits[0].batch_events
        if len(emits) == 2:
            assert (
                emits[1].cum_events
                == emits[0].cum_events + emits[1].batch_events
            )
            assert emits[1].cum_cents >= emits[0].cum_cents


def test_late_data_drops_are_visible(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_capstone_project_spark.sources.readers import load_table
    from data_pipeline_capstone_project_spark.streaming.late_data import (
        streaming_late_data_query,
    )

    emitted = {
        r.window_start: r.n_events
        for r in streaming_late_data_query(spark, sf_dir).collect()
    }
    assert emitted
    events = load_table(spark, sf_dir, "events")
    full = {
        r.ws: r.n
        for r in events.groupBy(
            F.window("ts", "1 day").start.alias("ws")
        ).agg(F.count("*").alias("n")).collect()
    }
    # every emitted window is a real data window, and at least one
    # CLOSED window emitted fewer events than the full batch count -
    # the engine really dropped the late wave there
    assert set(emitted) <= set(full)
    dropped_windows = [w for w in emitted if emitted[w] < full[w]]
    accepted_windows = [w for w in emitted if emitted[w] == full[w]]
    assert dropped_windows, "no window shows late-row drops"
    assert accepted_windows, "no open window accepted the late wave"
    # drops happen strictly BEFORE acceptances in event time (the
    # watermark frontier separates them)
    assert max(dropped_windows) < min(accepted_windows)


def test_lsh_merge_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: replaying the SAME epoch (crash
    between store writes, then retry) must leave the three stores
    exactly as a single application would - the per-epoch overwrite
    directories + exclude-current-epoch reads guarantee it."""
    import os

    from data_pipeline_capstone_project_spark.sources.readers import load_table
    from data_pipeline_capstone_project_spark.streaming.lsh_dedup_stream import (
        _PAIRS_SCHEMA,
        _store,
        lsh_index_merge_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 != 0)
    dirs = [str(tmp_path / d) for d in ("bands", "shingles", "pairs")]
    lsh_index_merge_batch(spark, b0, *dirs, epoch_id=0)
    lsh_index_merge_batch(spark, b1, *dirs, epoch_id=1)
    once = sorted(map(tuple, _store(spark, dirs[2], _PAIRS_SCHEMA).collect()))
    # replay epoch 1 (simulated retry after partial write)
    lsh_index_merge_batch(spark, b1, *dirs, epoch_id=1)
    twice = sorted(map(tuple, _store(spark, dirs[2], _PAIRS_SCHEMA).collect()))
    assert twice == once
    # and the epoch layout is one dir per epoch, no appended dupes
    assert sorted(os.listdir(dirs[2])) == ["e0", "e1"]


def test_upsert_merge_batch_promote_is_crash_safe(spark, tmp_path):
    """Simulate the worst crash window of the upsert table promote
    (live demoted to .old, tmp half-written): recover_table must
    restore the previous complete version, and re-merging the replayed
    batch must land on the same final table."""
    import os
    import shutil

    from pyspark.sql import types as T

    from data_pipeline_capstone_project_spark.streaming.upsert_stream import (
        merge_batch,
        recover_table,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    target = str(tmp_path / "table")
    b1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], schema)
    b2 = spark.createDataFrame([(1, "a2", 2), (3, "c", 1)], schema)
    order = [F.col("ver").desc(), F.col("k")]
    merge_batch(spark, b1, target, ["k"], order, schema)
    v1 = sorted(map(tuple, spark.read.schema(schema).parquet(target).collect()))

    # crash mid-promote: table demoted, tmp garbage
    os.replace(target, target + ".old")
    os.makedirs(target + ".tmp")
    with open(os.path.join(target + ".tmp", "junk"), "w") as fh:
        fh.write("partial")
    recover_table(target)
    assert sorted(map(tuple, spark.read.schema(schema).parquet(target).collect())) == v1
    assert not os.path.isdir(target + ".old")
    assert not os.path.isdir(target + ".tmp")

    merge_batch(spark, b2, target, ["k"], order, schema)
    # replay of b2 (at-least-once) is a latest-wins no-op
    merge_batch(spark, b2, target, ["k"], order, schema)
    final = sorted(map(tuple, spark.read.schema(schema).parquet(target).collect()))
    assert final == [(1, "a2", 2), (2, "b", 1), (3, "c", 1)]
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_streaming_topk_incremental_equals_batch(spark, sf_dir):
    """The monotone-merge claim: the three-wave incremental result is
    EXACTLY the batch top-k (same cosine fold, same tie-break), and
    every wave contributes at least one surviving row at the default
    fixture (so the merge is exercised, not vacuous)."""
    from data_pipeline_capstone_project_spark.streaming.topk_stream import (
        N_WAVES,
        QUERY_VEC_ID,
        TOPK,
        streaming_topk_query,
    )
    from data_pipeline_capstone_project_spark.operators.similarity import (
        cosine,
    )
    from pyspark.sql import functions as F

    res = streaming_topk_query(spark, sf_dir).collect()
    assert len(res) == TOPK
    assert [r["rank"] for r in sorted(res, key=lambda r: r["rank"])] == list(
        range(1, TOPK + 1)
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    batch = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("qv")).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(TOPK)
        .collect()
    )
    got = sorted(res, key=lambda r: r["rank"])
    assert [(r["doc_id"], r["cos"]) for r in got] == [
        (r["doc_id"], r["cos"]) for r in batch
    ]
    waves = {r["doc_id"] % N_WAVES for r in got}
    assert len(waves) == N_WAVES


def test_streaming_topk_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: a batch may be re-run AFTER the
    state parquet was already overwritten with its contribution.
    Re-merging the same batch must leave the state unchanged - no
    duplicate doc_ids occupying top-k slots (ADVICE r8)."""
    import shutil

    from pyspark.sql import functions as F

    from data_pipeline_capstone_project_spark.streaming.topk_stream import (
        QUERY_VEC_ID,
        TOPK,
        _STATE_SCHEMA,
        merge_topk_batch,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    batch = emb.filter(F.col("vec_id") != QUERY_VEC_ID)
    state = str(tmp_path / "state")

    merge_topk_batch(batch, qv, state)
    first = sorted(
        map(tuple, spark.read.schema(_STATE_SCHEMA).parquet(state).collect())
    )
    # the replay: same batch, state already holds its contribution
    merge_topk_batch(batch, qv, state)
    second = sorted(
        map(tuple, spark.read.schema(_STATE_SCHEMA).parquet(state).collect())
    )
    assert first == second
    ids = [r[0] for r in second]
    assert len(ids) == len(set(ids)) == min(TOPK, len(ids))
    shutil.rmtree(str(tmp_path), ignore_errors=True)
