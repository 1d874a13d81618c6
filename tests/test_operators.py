from __future__ import annotations

import datetime as dt

import pytest

# quick smoke lane (VERDICT r13 item 8): this file is part of the
# ~1-minute `-m quick` subset; the full suite stays the snapshot gate
pytestmark = pytest.mark.quick
from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.asof import asof_query
from data_pipeline_capstone_project_spark.operators.flatten import (
    flatten_posts,
    prune_stats,
)
from data_pipeline_capstone_project_spark.operators.quality import (
    DataQualityError,
    require_no_nulls,
    require_rows,
)
from data_pipeline_capstone_project_spark.operators.topk import top_k_query
from data_pipeline_capstone_project_spark.operators.upsert import latest_wins_query
from data_pipeline_capstone_project_spark.schemas import POST_SCHEMA, STATS_SCHEMA


def test_latest_wins_unique_per_key(spark, sf_dir):
    df = latest_wins_query(spark, sf_dir)
    assert df.groupBy("user_id", "event_type").count().filter("count > 1").count() == 0


def test_top_k_bounded(spark, sf_dir):
    df = top_k_query(spark, sf_dir)
    assert df.groupBy("user_id").count().filter("count > 6").count() == 0
    assert df.agg(F.max("rn")).collect()[0][0] <= 6


def test_asof_carries_last_signup(spark, sf_dir):
    rows = asof_query(spark, sf_dir).filter("user_id = 0").collect()
    # followers_asof is null before the first signup, then non-null.
    seen_value = False
    for r in sorted(rows, key=lambda r: (r["ts_us"], r["event_id"])):
        if r["followers_asof"] is not None:
            seen_value = True
        elif seen_value:
            pytest.fail("followers_asof reverted to null after being set")


def _post_row(**kw):
    base = dict(
        id="17859950232510465",
        ig_id="drop-me",
        owner={"id": "17841400036094485", "username": "u", "followers_count": 1234},
        username="drop-me",
        is_comment_enabled=True,
        caption="cap",
        hashtags="a,b",
        mentioned_users=None,
        media_type="IMAGE",
        media_url="https://cdn/a.jpg?x=1",
        thumbnail_url=None,
        permalink="p",
        shortcode="s",
        timestamp=dt.datetime(2021, 2, 20, 17, 5, 52),
        like_count=10,
        comments_count=2,
        views=None,
        sticker_taps=None,
        tap_backs=None,
        swipe_ups=None,
        impressions=None,
        reach=None,
        engagement=None,
        saved=None,
        video_view=None,
        children=None,
    )
    base.update(kw)
    return base


def test_flatten_posts_reference_chain(spark):
    df = spark.createDataFrame(
        [
            _post_row(),
            # STORY_VIDEO: only thumbnail_url (README.md:56); Basic
            # connection: no owner.followers_count -> -1 sentinel.
            _post_row(
                id="2",
                media_type="STORY_VIDEO",
                media_url=None,
                thumbnail_url="https://cdn/t.mp4?sig=2",
                owner={"id": "9", "username": "u2", "followers_count": None},
            ),
        ],
        schema=POST_SCHEMA,
    )
    out = flatten_posts(df)
    for dropped in ("ig_id", "username", "is_comment_enabled", "owner"):
        assert dropped not in out.columns
    rows = {r["id"]: r for r in out.collect()}
    assert rows["17859950232510465"]["owner_id"] == "17841400036094485"
    assert rows["17859950232510465"]["followers"] == 1234
    assert rows["17859950232510465"]["media_ext"] == ".jpg"
    assert (
        rows["17859950232510465"]["fohr_media"]
        == "instagram_graph_image_store/17841400036094485/17859950232510465"
    )
    assert rows["2"]["followers"] == -1
    assert rows["2"]["media_ext"] == ".mp4"


def test_prune_stats_drops_business_clicks(spark):
    df = spark.createDataFrame([], schema=STATS_SCHEMA)
    out = prune_stats(df)
    assert "ig_id" not in out.columns
    assert "website_clicks" not in out.columns
    assert "followers_count" in out.columns


def test_quality_gates(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert require_rows(orders) > 0
    assert require_no_nulls(orders, "o_orderkey") == 0
    with pytest.raises(DataQualityError):
        require_rows(orders.filter("o_orderkey < 0"))
    nullable = orders.withColumn(
        "x", F.when(F.col("o_orderkey") % 2 == 0, F.col("o_orderkey"))
    )
    with pytest.raises(DataQualityError):
        require_no_nulls(nullable, "x")


def test_json_lake_ingest_latest_wins(spark, sf_dir):
    """Two-wave JSON lake: re-delivered ids (orderkey % 5 == 0) must
    carry the wave-2 price bump; unchanged ids keep wave-1 values; the
    file-metadata envelope is present on every surviving row."""
    from data_pipeline_capstone_project_spark.sources.ingest_lake import (
        json_lake_ingest_query,
    )

    out = json_lake_ingest_query(spark, sf_dir)
    rows = {r["id"]: r for r in out.collect()}
    orders = {
        r["o_orderkey"]: r
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    assert len(rows) == len(orders)  # one row per key after dedup
    for key, o in orders.items():
        r = rows[str(key)]
        expect = o["o_totalprice"] + (1000.0 if key % 5 == 0 else 0.0)
        assert abs(r["price"] - expect) < 1e-6
        assert r["envelope_ok"]
        if key % 7 == 0:
            assert r["followers"] == -1
        else:
            assert r["followers"] == o["o_custkey"] * 10


def test_set_ops_fused_matches_operator_form(spark, sf_dir):
    """The single-scan flag-aggregation rewrite must return exactly the
    rows of the real UNION/INTERSECT/EXCEPT plan (which scans events
    once per set-op leg). Equivalence here is what licenses running the
    fused form at scale."""
    from data_pipeline_capstone_project_spark.operators.relational import (
        set_ops_fused_query,
        set_ops_query,
    )

    op_rows = {r["op"]: r["n_users"] for r in set_ops_query(spark, sf_dir).collect()}
    fused_rows = {
        r["op"]: r["n_users"] for r in set_ops_fused_query(spark, sf_dir).collect()
    }
    assert op_rows == fused_rows
    assert set(op_rows) == {"union", "intersect", "except"}
    # |A∪B| ≥ |A∩B| + |A\B| (the missing term is |B\A| ≥ 0)
    assert op_rows["union"] >= op_rows["intersect"] + op_rows["except"] > 0


def test_semi_join_no_fanout(spark, sf_dir):
    """left_semi must emit each qualifying customer exactly once even
    when many orders match (an inner join would fan out)."""
    from data_pipeline_capstone_project_spark.operators.relational import (
        semi_join_query,
    )

    out = semi_join_query(spark, sf_dir)
    assert out.count() == out.select("c_custkey").distinct().count()


def test_inference_featurizes_jvm_side(spark, sf_dir):
    """The mapInPandas inference seam must receive only the 3 numeric
    features - raw text crossing the Arrow boundary would move ~100x
    the bytes and put tokenization in Python. Also pin the score
    contract: bounded in (0, 1]."""
    from data_pipeline_capstone_project_spark.operators.inference import (
        doc_score_inference_query,
    )

    df = doc_score_inference_query(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    map_line = next(l for l in plan.splitlines() if "MapInPandas" in l)
    assert "text" not in map_line  # features only, no raw text
    scores = [r["score"] for r in df.collect()]
    assert scores and all(0.0 < s <= 1.0 for s in scores)
