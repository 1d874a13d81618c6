"""K4: the reference's binary put side-effect, as a real Spark sink.

Reference behavior (`s3Posts-to-ES-lambda/s3-to-es_aws.py:100-125`):
for each post, an existence check (``KeyCount < 1``) guards an
``s3.put_object`` of the ORIGINAL media under a computed key, plus
every CHILD image when the post is a carousel, or the THUMBNAIL when
it is a video - i.e. an idempotent keyed blob store populated from
the post stream. SURVEY §2 declared K4 out of engine scope (the HTTP
fetch is infrastructure), but the PUT semantics themselves - computed
keyset per post, per-kind fan-out, write-if-absent idempotency - are
query semantics and are implemented here (r8), closing the item:

* the media mix is derived from ``event_type`` exactly like the
  reference derives it from the post payload shape: ``click`` posts
  are carousels (1-3 children), ``view`` posts are videos (original +
  thumbnail), everything else is a single image;
* payload sizes are closed-form in ``event_id`` so the DuckDB oracle
  predicts every byte written without observing the filesystem;
* the sink is ``mapInPandas`` over the post slice: each batch writes
  its objects through an INJECTABLE blob-store object (r10, VERDICT
  r9 item 5): `LocalFsBlobStore` - atomic O_CREAT|O_EXCL
  write-if-absent over any path every executor mounts - today, any
  object implementing the same one-method ``put_if_absent`` protocol
  (an S3 ``If-None-Match: *`` client) at 100 TB; each batch emits the
  OBSERVED per-kind (written, skipped, bytes) counts - the result
  reports what the side effect actually did, not what the input
  implied. The registry entry resolves its root from
  ``SPARK_GRAFT_BLOB_STORE_ROOT`` (shared-filesystem injection
  without code), falls back to a tempdir on single-host masters, and
  on a multi-node master without a configured store raises the
  narrow "no shared store configured" seam;
* the registry query runs the sink TWICE against the same store and
  returns both passes' censuses: pass 1 must write everything and
  skip nothing, pass 2 must write NOTHING and skip everything - the
  reference's KeyCount-guard idempotency (S9's sink-side dual),
  hash-checked end to end.

Scale shape: one scan of the bounded post slice per pass, zero
shuffles before the tiny per-kind aggregation; object writes are
embarrassingly parallel (distinct event ids -> distinct key
prefixes, no cross-partition collisions). Payload bytes never leave
the executors and never reach the driver.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

#: post slice: bounded, deterministic, scale-proportional
PUT_SLICE_MOD = 200

CAROUSEL_TYPE = "click"
VIDEO_TYPE = "view"


def _keyset(event_id: int, user_id: int, event_type: str) -> list[tuple]:
    """The computed keys + closed-form payload sizes for one post:
    [(kind, key, size)]. Mirrors the reference's original/children/
    thumbnail fan-out under ``posts/{user}/{post}/``."""
    prefix = f"posts/{user_id}/{event_id}"
    out = [("original", f"{prefix}/original.jpg", 64 + event_id % 191)]
    if event_type == CAROUSEL_TYPE:
        for i in range(1, event_id % 3 + 2):
            out.append(
                ("child", f"{prefix}/child{i}.jpg",
                 32 + (event_id * 7 + i * 13) % 97)
            )
    elif event_type == VIDEO_TYPE:
        out.append(("thumbnail", f"{prefix}/thumbnail.jpg",
                    16 + event_id % 31))
    return out


def _payload(key: str, size: int) -> bytes:
    """Deterministic filler bytes (content is not oracle-checked -
    sizes are; a keyed LCG keeps distinct objects distinct). crc32,
    not hash(): str hashing is salted per process and executors must
    agree."""
    import zlib

    seed = (zlib.crc32(key.encode()) & 0x7FFFFFFF) or 1
    out = bytearray(size)
    x = seed
    for i in range(size):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out[i] = (x >> 16) & 0xFF
    return bytes(out)


class LocalFsBlobStore:
    """Write-if-absent blob store over a filesystem path - the
    injectable store seam (VERDICT r9 item 5). The PROTOCOL is the
    single method ``put_if_absent(key, data) -> bool`` (True = this
    call created the object); any object implementing it can be passed
    to `put_pass` / `binary_put_census` - at 100 TB that is an
    object-store client issuing a conditional put (S3
    ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``), which gives
    the same created-by-this-call answer server-side. Instances are
    cloudpickled into the executor tasks, so they must stay tiny and
    hold no open handles.

    The local implementation is correct on ANY master whose executors
    mount ``root`` (local[N], local-cluster, a real cluster over
    NFS/FUSE): existence is probed by O_CREAT|O_EXCL, so two
    concurrent writers of one key can never both report "written" -
    the census stays exact without a coordination shuffle."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._made_dirs: set[str] = set()  # one mkdir per prefix, not per object

    def put_if_absent(self, key: str, data: bytes) -> bool:
        path = os.path.join(self.root, key)
        parent = os.path.dirname(path)
        if parent not in self._made_dirs:
            os.makedirs(parent, exist_ok=True)
            self._made_dirs.add(parent)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # the reference's KeyCount < 1 existence guard
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return True


def put_pass(posts: DataFrame, store, pass_no: int) -> DataFrame:
    """One write-if-absent pass over the post slice -> per-kind
    censuses of what the side effect ACTUALLY did. ``store`` is any
    object with the `LocalFsBlobStore.put_if_absent` protocol (a str
    is accepted as a local root for convenience)."""
    if isinstance(store, str):
        store = LocalFsBlobStore(store)

    def write_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict[str, list[int]] = {}
            for eid, uid, etype in zip(
                pdf["event_id"], pdf["user_id"], pdf["event_type"]
            ):
                for kind, key, size in _keyset(int(eid), int(uid), etype):
                    c = counts.setdefault(kind, [0, 0, 0])
                    if store.put_if_absent(key, _payload(key, size)):
                        c[0] += 1
                        c[2] += size
                    else:
                        c[1] += 1
            yield pd.DataFrame(
                [
                    {
                        "kind": kind,
                        "n_written": c[0],
                        "n_skipped": c[1],
                        "bytes_written": c[2],
                    }
                    for kind, c in counts.items()
                ]
            )

    return (
        posts.mapInPandas(
            write_batches,
            "kind string, n_written long, n_skipped long, bytes_written long",
        )
        .groupBy("kind")
        .agg(
            F.sum("n_written").alias("n_written"),
            F.sum("n_skipped").alias("n_skipped"),
            F.sum("bytes_written").alias("bytes_written"),
        )
        .select(F.lit(pass_no).alias("pass_no"), "*")
    )


def binary_put_census(spark: SparkSession, sf_dir: str, store) -> DataFrame:
    """Two write-if-absent passes against one store; pass 1 writes the
    full keyset, pass 2 skips all of it. ``store`` is any
    `LocalFsBlobStore`-protocol object (injectable seam: a local/NFS
    path today, an object-store client with conditional puts at
    100 TB)."""
    posts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % PUT_SLICE_MOD == 0)
        .select("event_id", "user_id", "event_type")
    )
    first = put_pass(posts, store, 1).localCheckpoint(eager=True)
    second = put_pass(posts, store, 2).localCheckpoint(eager=True)
    return first.unionByName(second).orderBy("pass_no", "kind")


def _resolve_store_root(spark: SparkSession) -> str:
    """Registry-entry store-root policy: SPARK_GRAFT_BLOB_STORE_ROOT
    (a path mounted on every executor - how a shared filesystem is
    injected without code) wins; a single-host master may fall back to
    a driver tempdir; a multi-node master without a configured store
    fails loudly rather than silently diverging (each executor would
    see its own empty /tmp, pass 2 would rewrite everything, and the
    census would break)."""
    configured = os.environ.get("SPARK_GRAFT_BLOB_STORE_ROOT")
    if configured:
        return tempfile.mkdtemp(prefix="binary_put_store_", dir=configured)
    master = spark.conf.get("spark.master", "")
    if master.startswith("local") or "localhost" in master:
        return tempfile.mkdtemp(prefix="binary_put_store_")
    raise NotImplementedError(
        "binary_put_sink: no shared store configured - set "
        "SPARK_GRAFT_BLOB_STORE_ROOT to a path mounted on every "
        "executor, or call binary_put_census() with an object-store "
        f"client implementing put_if_absent (spark.master={master!r})"
    )


def binary_put_sink_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the idempotency census over a fresh
    LocalFsBlobStore at the resolved store root."""
    root = _resolve_store_root(spark)
    try:
        return binary_put_census(spark, sf_dir, LocalFsBlobStore(root))
    finally:
        shutil.rmtree(root, ignore_errors=True)


BINARY_PUT_SINK_ORACLE_SQL = f"""
WITH sel AS (
  SELECT event_id, user_id, event_type FROM events
  WHERE event_id % {PUT_SLICE_MOD} = 0
),
objs AS (
  SELECT 'original' AS kind, 64 + event_id % 191 AS sz FROM sel
  UNION ALL
  SELECT 'thumbnail', 16 + event_id % 31 FROM sel
  WHERE event_type = '{VIDEO_TYPE}'
  UNION ALL
  SELECT 'child', 32 + (event_id * 7 + i * 13) % 97
  FROM (SELECT event_id, unnest(range(1, event_id % 3 + 2)) AS i
        FROM sel WHERE event_type = '{CAROUSEL_TYPE}')
),
agg AS (SELECT kind, count(*) AS n, sum(sz) AS b FROM objs GROUP BY kind)
SELECT 1 AS pass_no, kind, CAST(n AS BIGINT) AS n_written,
       CAST(0 AS BIGINT) AS n_skipped, CAST(b AS BIGINT) AS bytes_written
FROM agg
UNION ALL
SELECT 2, kind, 0, CAST(n AS BIGINT), 0 FROM agg
ORDER BY pass_no, kind
"""
