"""Round-15 optimization profiler: per-query timing + sub-phase
breakdown on demand.

Usage:
    python tools/profile_r15.py time q1 q2 ...      # 3x noop-timed runs
    python tools/profile_r15.py explain q1 q2 ...   # formatted plans ->
                                                    # plans/r14/<q>_<tag>.txt
Env:
    SPARK_GRAFT_PROFILE_RUNS   (default 3)
    SPARK_GRAFT_PROFILE_TAG    (default "before") explain file suffix
    SPARK_GRAFT_SF_DIR         (default /root/testdata/sf0.1)

Mirrors bench.py's run_once (noop sink + session scrub) so numbers are
comparable with BENCH_DETAIL entries.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_capstone_project_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-r14")
    queries = entrymod.queries()
    if not names:
        names = list(queries)

    if mode == "explain":
        tag = os.environ.get("SPARK_GRAFT_PROFILE_TAG", "before")
        out_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r15",
        )
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            mode_obj = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode_obj)
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"{name}: {path} ({plan.count('Exchange')} Exchange)")
        return

    assert mode == "time", mode
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    warm_dir = "/root/testdata/sf0.001"
    results: dict[str, list[float]] = {}

    def scrub() -> None:
        spark.catalog.clearCache()
        gc.collect()
        try:
            jvm = spark.sparkContext._jvm
            jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        except Exception:
            pass

    for name in names:
        try:
            queries[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"warm {name} failed: {exc}", file=sys.stderr)
        scrub()
    for r in range(runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"r15-prof {name} run{r}")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = round(time.perf_counter() - t0, 3)
            results.setdefault(name, []).append(el)
            scrub()
    print(json.dumps(
        {n: {"min": min(v), "runs": v} for n, v in results.items()},
        indent=1,
    ))
    os._exit(0)


if __name__ == "__main__":
    main()
