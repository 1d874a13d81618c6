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
  its objects to the store root (file per key - locally a directory,
  at 100 TB an object-store client with If-None-Match) and emits the
  OBSERVED per-kind (written, skipped, bytes) counts - the result
  reports what the side effect actually did, not what the input
  implied;
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


def put_pass(posts: DataFrame, store_root: str, pass_no: int) -> DataFrame:
    """One write-if-absent pass over the post slice -> per-kind
    censuses of what the side effect ACTUALLY did."""

    def write_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        made_dirs: set[str] = set()  # one mkdir syscall per prefix, not per object
        for pdf in batches:
            counts: dict[str, list[int]] = {}
            for eid, uid, etype in zip(
                pdf["event_id"], pdf["user_id"], pdf["event_type"]
            ):
                for kind, key, size in _keyset(int(eid), int(uid), etype):
                    path = os.path.join(store_root, key)
                    c = counts.setdefault(kind, [0, 0, 0])
                    # the reference's KeyCount < 1 existence guard
                    if os.path.exists(path):
                        c[1] += 1
                        continue
                    parent = os.path.dirname(path)
                    if parent not in made_dirs:
                        os.makedirs(parent, exist_ok=True)
                        made_dirs.add(parent)
                    with open(path, "wb") as f:
                        f.write(_payload(key, size))
                    c[0] += 1
                    c[2] += size
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


def binary_put_sink_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: two write-if-absent passes against one fresh
    store; pass 1 writes the full keyset, pass 2 skips all of it."""
    # The store root is a driver-local tempdir probed with
    # os.path.exists inside executor tasks: correct ONLY when every
    # executor shares the driver's filesystem (local / local-cluster
    # on one host). On a real cluster the store must be a shared
    # filesystem or object store; fail loudly rather than silently
    # diverging (each executor would see its own empty /tmp, pass 2
    # would rewrite everything, and the census would break).
    master = spark.conf.get("spark.master", "")
    if not (master.startswith("local") or "localhost" in master):
        raise NotImplementedError(
            "binary_put_sink's write-if-absent store uses a "
            "driver-local tempdir; on a multi-node cluster route "
            "store_root to a shared filesystem/object store "
            f"(spark.master={master!r})"
        )
    posts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % PUT_SLICE_MOD == 0)
        .select("event_id", "user_id", "event_type")
    )
    store = tempfile.mkdtemp(prefix="binary_put_store_")
    try:
        first = put_pass(posts, store, 1).localCheckpoint(eager=True)
        second = put_pass(posts, store, 2).localCheckpoint(eager=True)
        return first.unionByName(second).orderBy("pass_no", "kind")
    finally:
        shutil.rmtree(store, ignore_errors=True)


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
