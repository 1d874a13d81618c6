"""K4 binary put sink: keyset fan-out, write-if-absent idempotency
observed on the store itself, and the two-pass census contract."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.binary_sink import (
    _keyset,
    binary_put_sink_query,
    put_pass,
)
from data_pipeline_capstone_project_spark.sources.readers import load_table


def test_keyset_mirrors_reference_fan_out():
    # carousel: original + event_id%3+1 children
    ks = _keyset(7, 3, "click")
    assert [k[0] for k in ks] == ["original", "child", "child"]  # 7%3+1=2
    assert ks[0][1] == "posts/3/7/original.jpg"
    assert ks[1][1] == "posts/3/7/child1.jpg"
    # video: original + thumbnail
    ks = _keyset(10, 3, "view")
    assert [k[0] for k in ks] == ["original", "thumbnail"]
    # plain image: original only
    assert [k[0] for k in _keyset(11, 3, "purchase")] == ["original"]
    # sizes are the closed-form the oracle predicts
    assert _keyset(100, 1, "view")[0][2] == 64 + 100 % 191
    assert _keyset(100, 1, "view")[1][2] == 16 + 100 % 31


def test_two_pass_census_and_store_contents(spark, sf_dir):
    posts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 200 == 0)
        .select("event_id", "user_id", "event_type")
    )
    expected_objects = sum(
        len(_keyset(r["event_id"], r["user_id"], r["event_type"]))
        for r in posts.collect()
    )
    store = tempfile.mkdtemp(prefix="put_sink_test_")
    try:
        p1 = {r["kind"]: r for r in put_pass(posts, store, 1).collect()}
        # the store really holds every object at its computed key+size
        on_disk = 0
        byte_total = 0
        for root, _, files in os.walk(store):
            for f in files:
                on_disk += 1
                byte_total += os.path.getsize(os.path.join(root, f))
        assert on_disk == expected_objects
        assert sum(r["n_written"] for r in p1.values()) == expected_objects
        assert sum(r["bytes_written"] for r in p1.values()) == byte_total
        assert all(r["n_skipped"] == 0 for r in p1.values())
        # second pass: pure skips, zero bytes
        p2 = {r["kind"]: r for r in put_pass(posts, store, 2).collect()}
        assert all(r["n_written"] == 0 for r in p2.values())
        assert all(r["bytes_written"] == 0 for r in p2.values())
        assert {k: r["n_skipped"] for k, r in p2.items()} == {
            k: r["n_written"] for k, r in p1.items()
        }
    finally:
        import shutil

        shutil.rmtree(store, ignore_errors=True)


def test_registry_query_shape(spark, sf_dir):
    rows = binary_put_sink_query(spark, sf_dir).collect()
    kinds = {r["kind"] for r in rows}
    # the tiny sf0.001 slice may miss a media kind entirely; the
    # oracle derives the same kinds from the same data either way
    assert kinds <= {"original", "child", "thumbnail"}
    assert "original" in kinds
    assert {r["pass_no"] for r in rows} == {1, 2}
    by_pass = {}
    for r in rows:
        by_pass.setdefault(r["pass_no"], {})[r["kind"]] = r
    assert all(r["n_skipped"] == 0 for r in by_pass[1].values())
    assert all(r["n_written"] == 0 for r in by_pass[2].values())


def test_local_store_put_if_absent_is_atomic():
    """O_CREAT|O_EXCL: exactly one of N put attempts on a key reports
    written, and the first payload wins."""
    import shutil

    from data_pipeline_capstone_project_spark.operators.binary_sink import (
        LocalFsBlobStore,
    )

    root = tempfile.mkdtemp(prefix="blob_store_test_")
    try:
        store = LocalFsBlobStore(root)
        assert store.put_if_absent("a/b/key.bin", b"first") is True
        assert store.put_if_absent("a/b/key.bin", b"second") is False
        with open(os.path.join(root, "a/b/key.bin"), "rb") as f:
            assert f.read() == b"first"
        # a fresh instance (fresh mkdir cache) still sees the object
        assert LocalFsBlobStore(root).put_if_absent("a/b/key.bin", b"x") is False
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_store_root_resolution(spark, monkeypatch):
    """SPARK_GRAFT_BLOB_STORE_ROOT routes the registry entry's store
    to an injected (shared) root; without it a non-local master is the
    narrow 'no store configured' seam."""
    import shutil

    import pytest as _pytest

    from data_pipeline_capstone_project_spark.operators import binary_sink

    shared = tempfile.mkdtemp(prefix="shared_store_")
    try:
        monkeypatch.setenv("SPARK_GRAFT_BLOB_STORE_ROOT", shared)
        root = binary_sink._resolve_store_root(spark)
        assert root.startswith(shared)
        monkeypatch.delenv("SPARK_GRAFT_BLOB_STORE_ROOT")

        class FakeConf:
            def get(self, k, d=None):
                return "spark://remote-master:7077"

        class FakeSpark:
            conf = FakeConf()

        with _pytest.raises(NotImplementedError, match="no shared store"):
            binary_sink._resolve_store_root(FakeSpark())
    finally:
        shutil.rmtree(shared, ignore_errors=True)
