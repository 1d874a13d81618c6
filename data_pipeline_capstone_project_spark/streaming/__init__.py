"""Streaming package. ``sized_state_partitions`` is the shared
deployment-sizing pattern: stateful micro-batch cost scales with the
number of state stores (one per shuffle partition per stateful
operator per batch, each with checkpoint I/O), not with rows - so the
partition count must be sized to the stream's key volume. At fixture
scale that is 8; on a 1000-executor cluster it is thousands. The count
is baked into the checkpoint at first start, making this a
per-deployment decision, not a tunable."""

import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager

from .upsert_stream import streaming_upsert_run, streaming_upsert_query  # noqa: F401

#: Serializes sized_state_partitions users. The helper mutates the
#: SESSION-GLOBAL spark.sql.shuffle.partitions for the duration of a
#: stream run (streaming reads the conf from the owning session at
#: query start - there is no per-query override), so two interleaved
#: uses from different threads would race on save/restore and any
#: concurrent batch query on the same session would silently run with
#: the stream's partition count. The lock makes concurrent stream
#: launches queue instead; batch work on OTHER threads of the same
#: session during a stream run is still the caller's responsibility
#: (run such work on spark.newSession(), which has its own SQLConf).
_CONF_LOCK = threading.Lock()


@contextmanager
def sized_state_partitions(spark, n: int = 8):
    with _CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def stage_waves_concurrently(writes, ordered_wave_dirs) -> None:
    """Run the self-staging wave writes CONCURRENTLY, then stamp
    strictly increasing modification times so the file stream's
    mtime-ordered listing batches the waves in the declared order.

    r14 optimization (guide §2.6 "overlap independent jobs"): every
    self-staging stream used to pay its wave writes back-to-back -
    each a single-task job whose wall is dominated by job launch +
    parquet commit, not data (measured ~1 s per write at sf0.1, so a
    4-wave stage cost ~4 s before the stream even started). The
    writes are independent (distinct output directories), so a small
    driver-side thread pool overlaps them; Spark's scheduler happily
    runs several tiny jobs at once and job descriptions are
    thread-local.

    Correctness: several streams' OUTPUT depends on wave arrival
    order (watermark advancement in late_data/session, per-batch
    emission in stateful/transform_state). FileStreamSource processes
    new files oldest-modification-time first (latestFirst=false, the
    default), and concurrent writes would otherwise land with
    near-identical mtimes - so after all writes finish, every visible
    file in ``ordered_wave_dirs[i]`` is re-stamped to a common base
    time plus ``10*i`` seconds. The staged BYTES are identical to the
    sequential version; only the wall-clock cost changes, and the
    explicit stamp makes the batch order deterministic where the
    sequential version relied on write-completion timing.

    ``writes``: zero-arg callables, each staging one wave directory.
    ``ordered_wave_dirs``: wave directories in required arrival
    order; nested one level under distinct parents is fine (the stamp
    walks each directory).

    DRIVER-LOCAL POSIX ASSUMPTION (ADVICE r14): the mtime re-stamp
    uses ``os.walk``/``os.utime`` against the driver's own filesystem,
    which is exactly right for these self-staging fixtures (tempdirs
    on the driver). An object-store deployment cannot re-stamp
    mtimes; there the equivalent is staging waves under distinct
    prefixes and starting the stream per prefix, or encoding arrival
    order in the source (e.g. a manifest column) instead of listing
    order.
    """
    with ThreadPoolExecutor(max_workers=min(4, len(writes))) as pool:
        futures = [pool.submit(w) for w in writes]
        for f in futures:
            f.result()  # surface the first failure, if any
    base = time.time() - 600  # past-dated: never "newer than now"
    for i, d in enumerate(ordered_wave_dirs):
        ts = base + 10.0 * i
        for root, _, files in os.walk(d):
            for name in files:
                os.utime(os.path.join(root, name), (ts, ts))
