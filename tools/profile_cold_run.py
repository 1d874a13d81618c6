"""Diagnose the iterative ops' cold-run spike (VERDICT r8 item 2).

`pagerank` and `dedup_clusters_star` cost 2-6x their steady-state on
their FIRST invocation in a fresh JVM (and up to 12x in the driver's
loaded bench). This tool attributes that cost: it runs each query N
times in a fresh session with the Spark event log enabled, then
splits every run's wall time into

  - in-job time: union of [job start, job end] intervals (executor
    work, scheduling), and
  - driver gap: wall - in-job union = planning, analysis, Catalyst
    optimization and wholestage-codegen Janino COMPILATION - the
    things that happen between actions and are cached after the
    first run (codegen class cache, resolved-plan fragments).

If the cold/warm delta lives in the driver gap, the spike is compile
cost, not plan shape - bounded per PROCESS, amortized across any
production run that executes more than one action, and mitigated by
the same-plan codegen cache. If it lives in in-job time, the first
run does extra executor work (persist materialization) that later
runs reuse.

Usage: python tools/profile_cold_run.py [query ...] [--runs N]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/sparkevents_coldrun"


def _union_span(ivs: list[tuple[int, int]]) -> int:
    total = 0
    cur_a = cur_b = None
    for a, b in sorted(ivs):
        if cur_a is None:
            cur_a, cur_b = a, b
        elif a <= cur_b:
            cur_b = max(cur_b, b)
        else:
            total += cur_b - cur_a
            cur_a, cur_b = a, b
    if cur_a is not None:
        total += cur_b - cur_a
    return total


def main() -> None:
    from data_pipeline_capstone_project_spark.session import get_spark
    import __spark_entry__ as entrymod

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    if not names:
        names = ["pagerank", "dedup_clusters_star"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    for name in names:
        shutil.rmtree(EVDIR, ignore_errors=True)
        os.makedirs(EVDIR, exist_ok=True)
        spark = get_spark(
            f"coldrun-{name}",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file:{EVDIR}",
                "spark.eventLog.compress": "false",
            },
        )
        fn = entrymod.queries()[name]
        windows = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            windows.append((t0 * 1000, time.time() * 1000))
        spark.catalog.clearCache()
        spark.stop()

        jobs: list[tuple[int, int]] = []
        starts: dict[int, int] = {}
        paths = [
            p
            for pat in ("*", "*/*")
            for p in glob.glob(f"{EVDIR}/{pat}")
            if os.path.isfile(p) and "appstatus" not in p
        ]
        for path in paths:
            for line in open(path, errors="replace"):
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    starts[ev["Job ID"]] = ev["Submission Time"]
                elif ev.get("Event") == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in starts:
                        jobs.append((starts[jid], ev["Completion Time"]))

        print(f"\n== {name} ({sf_dir}) ==")
        for i, (w0, w1) in enumerate(windows):
            inside = [
                (max(a, w0), min(b, w1)) for a, b in jobs
                if b > w0 and a < w1
            ]
            n_jobs = len(inside)
            in_job = _union_span([(int(a), int(b)) for a, b in inside])
            wall = w1 - w0
            print(
                f"run {i + 1}: wall {wall / 1000:6.2f}s  "
                f"in-job {in_job / 1000:6.2f}s  "
                f"driver-gap {(wall - in_job) / 1000:6.2f}s  "
                f"({n_jobs} jobs)"
            )


if __name__ == "__main__":
    main()
