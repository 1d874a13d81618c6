"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` (single JVM); at production scale the
same configs apply per-executor. Everything here is standard Apache Spark
configuration:

- AQE on (runtime partition coalescing, skew-join splitting) so plans
  self-correct at 100 TB without hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant.
- UTC session timezone so results compare bit-for-bit against the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for every pandas interchange path (Pandas UDFs,
  toPandas) - the only sanctioned Python hot path.
"""

from __future__ import annotations

import os
import re
import zipfile

import threading

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: serializes the package-zip rebuild (see ship_package)
_SHIP_LOCK = threading.Lock()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas-UDF bodies (applyInPandas/mapInPandas) are module-level
    functions, which cloudpickle serializes BY REFERENCE - workers
    re-import the module. On a real cluster that is exactly what you
    want (ship one zip instead of pickling code per task), and it is
    done the standard way: zip the package and ``addPyFile`` it.
    Idempotent; rebuilds only when sources are newer than the zip.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join("/tmp", "data_pipeline_capstone_project_spark.zip")
    # Serialized (r15): concurrent sessions/queries (e.g. bench.py's
    # threaded warm pass) used to race the rebuild - two threads both
    # wrote zip_path+".tmp" and the second os.replace lost. The lock
    # plus a per-call tmp name makes the rebuild safe from any number
    # of threads; the replace stays atomic for concurrent readers.
    with _SHIP_LOCK:
        newest = max(
            os.path.getmtime(os.path.join(root, f))
            for root, _, files in os.walk(pkg_dir)
            for f in files
            if f.endswith(".py")
        )
        if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest:
            tmp = f"{zip_path}.{os.getpid()}.{threading.get_ident()}.tmp"
            with zipfile.ZipFile(tmp, "w") as zf:
                for root, _, files in os.walk(pkg_dir):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                            zf.write(full, rel)
            os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)


# Scan-partition sizing for binary-heavy tables (image/audio/video
# payload columns): the default 128 MB maxPartitionBytes is tuned for
# columnar row data; a partition of multi-MB blobs decoded through
# Arrow batches wants to be smaller so each task's working set (raw
# payloads + decoded pixels) stays inside executor memory. Pass as
# ``extra_conf=BINARY_SCAN_CONF`` (or merge into your own) when a job
# is dominated by binaryFile / image-source scans - the fixture-scale
# registry queries don't need it, a 100 TB media store does.
BINARY_SCAN_CONF = {
    "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(8 * 1024 * 1024),
}


def get_spark(
    app_name: str = "data_pipeline_capstone_project_spark",
    cpus: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cpus`` controls ``local[N]`` and the shuffle-partition count; at
    cluster scale you would drop ``master`` and let the resource manager
    decide, keeping the rest of the config identical.

    ``SPARK_GRAFT_MASTER`` overrides the master URL entirely - e.g.
    ``local-cluster[2,16,8192]`` runs 2 separate executor JVMs with 16
    cores / 8 GiB each, exercising cross-process broadcast
    serialization, Python-worker package shipping, and network shuffle
    that single-JVM ``local[N]`` can never falsify. In that mode the
    package zip is shipped automatically (executor Python workers
    re-import Pandas-UDF modules by reference).
    """
    n = str(cpus or _DEFAULT_CPUS)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Static conf (read when the codegen cache is built): the
        # default 100-entry Janino class cache thrashes in sessions
        # that run the whole 200-query registry - by the time the
        # iterative ops (pagerank, star-CC) execute late in a bench
        # pass their classes have been evicted and every generated
        # plan recompiles, which measured as a 10-38 s first-run
        # spike (tools/profile_cold_run.py: ~half the query-cold cost
        # is driver-side compile gap). 2000 entries hold the full
        # registry's working set; per-entry cost is one compiled
        # class + source text.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # Multi-process masters are matched explicitly (ADVICE r9): the
    # legal single-thread "local" master and typos must NOT take this
    # branch, which force-sets executor memory and ships the package
    # zip - both wrong for an in-process executor.
    multiproc = master.startswith(("local-cluster", "spark://", "yarn", "k8s://"))
    if multiproc:
        # multi-process executors (local-cluster / standalone): each
        # executor JVM gets its own heap. For local-cluster the master
        # string already fixes MiB/worker - request exactly that, or
        # Spark refuses to launch ("Asked to launch cluster with X
        # MiB/worker but requested Y MiB/executor").
        mem = os.environ.get("SPARK_GRAFT_EXECUTOR_MEM")
        if mem is None:
            m = re.match(r"local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]", master)
            mem = f"{m.group(1)}m" if m else "8g"
        builder = builder.config("spark.executor.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if multiproc:
        ship_package(spark)
    return spark
