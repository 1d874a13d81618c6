"""Benchmark harness: runs every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line per completed
pass (best-so-far; the LAST line is authoritative).

Each query is fully materialized through the ``noop`` sink (executes
the complete physical plan including all columns - unlike ``count()``,
which lets Catalyst prune the projection).

Noise-immune methodology (VERDICT r11 item 1). The r11 closing
artifact diverged 53% from a clean pass on identical code
(streaming_stateful 2.5 <-> 37.6 s) because per-query best-of-3 runs
BACK-TO-BACK: a 30-second host-noise burst lands on all three runs of
whichever query is underneath it, and no amount of min() rescues it.
The measured phase is therefore N full passes over the registry in
RANDOMIZED (per-pass) order, scored as per-query min across passes:
a burst now taxes one run of many different queries, and every one of
them keeps two clean runs in other passes. On top of that:

* per-pass canary probes (the flagship, single-shot, every ~25
  queries) build a host-health timeline; a pass whose median canary
  is >= SPARK_GRAFT_BENCH_CANARY_RATIO (default 1.5) x the best
  pass's median is marked degraded and excluded from scoring (unless
  every pass is degraded),
* /proc/stat iowait+steal deltas are recorded per pass - loadavg
  cannot see co-tenant steal or I/O stalls (observed r8/r10),
* the r5-r11 machinery (entry quiet-gate on 1-min AND 5-min loadavg,
  whole-run retry, per-query spread retry) is retained.

Delivery hardening (VERDICT r12 item 1: two consecutive rounds of
unparseable driver artifacts - rc=124 timeout and a JSON line that
only printed at the very end):

* a best-so-far summary JSON line is flushed to stdout after EVERY
  completed pass AND every ~25 queries inside a pass, so a timeout
  kill still leaves the driver a parseable line (the driver takes the
  last one); every non-final line carries ``"partial": true`` so a
  last-line parser can never score a mid-pass total as authoritative
  (ADVICE r13).
* a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default 1350 s
  since r14 - two measured passes + retry tail on a healthy host)
  degrades the run gracefully instead of overrunning: later passes
  are skipped when the remaining budget cannot fit them, and the
  whole-run retry / spread retries are skipped when over budget.
  Artifacts record how much was skipped.
* the canary ratio is split (ADVICE r12): pass rejection keeps
  SPARK_GRAFT_BENCH_CANARY_RATIO (1.5); the whole-run-retry trigger
  uses SPARK_GRAFT_BENCH_RETRY_RATIO (3.0, the pre-r12 sensitivity).

Representativeness hardening (VERDICT r13 item 1 - the r13 driver
artifact parsed but was ONE cold pass 3.7x off the committed
estimator because the time-boxed warm got cut on a degraded host and
pass 0 ran cold):

* the sf0.001 warm pass is UNCONDITIONAL - it is never time-boxed
  away. It costs ~1-2 min on a healthy host and is what separates a
  steady-state measurement from a codegen/page-cache-cold one; a
  budget too small for warm+one-pass produces junk either way, so
  warmth is bought first.
* a query that fails inside a measured pass is retried ONCE
  immediately (r13's driver pass recorded n_failed=1 on a
  driver-green query from a "Python worker failed to connect back"
  flake under loadavg 7).
* the SESSION-ACCUMULATION SCRUB: a 205-query pass in one long-lived
  session degrades monotonically (position audit: 1.2x steady over
  the first 21 queries decaying to 2-4x past position 150; pass
  walls 1100-1500 s against a 272 s steady-state sum) because
  streaming state-store providers stay loaded and the async
  ContextCleaner falls behind on localCheckpoint/broadcast blocks.
  run_once and the warm loop now call StateStore.stop() after every
  query and System.gc() every 10th - measured effect: pass-0 wall
  1100 s -> 468 s, single-pass total 1113 s -> 410 s, flat position
  profile.
* single-pass min-repair: when only one measured pass fits the
  budget, the remaining budget re-runs the slowest observations
  (biggest first), min-merging - a single cold run otherwise has no
  second chance at its steady-state cost.

Artifact safety (VERDICT r13 item 2): the per-query detail sidecar
defaults to BENCH_DETAIL_LAST.json (gitignored) or
$SPARK_GRAFT_BENCH_DETAIL - a bench invocation can no longer clobber
the committed closing artifact BENCH_DETAIL.json (which the r13
driver run overwrote in the working tree). Closing runs copy the
sidecar to BENCH_DETAIL.json deliberately.
"""

from __future__ import annotations

import gc
import json
import os
import random
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_capstone_project_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

CANARY = "q1_history"

HEADLINE = [
    "q1_history",
    "rolling_engagement",
    "latest_wins",
    "top_k_per_group",
    "recent_n_per_user",
    "asof_enrichment",
    "posts_flatten",
    "anti_join",
    "scalar_suite",
    "quality_gates",
    "pricing_summary",
]


def read_cpu_stat() -> dict:
    """Aggregate jiffies from /proc/stat - iowait and steal are the
    host-level signals loadavg is blind to."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        v = [int(x) for x in parts[1:9]]
        return {
            "iowait": v[4],
            "steal": v[7],
            "total": sum(v),
        }
    except Exception:  # pragma: no cover - non-Linux fallback
        return {"iowait": 0, "steal": 0, "total": 0}


def cpu_delta(a: dict, b: dict) -> dict:
    tot = max(b["total"] - a["total"], 1)
    return {
        "iowait_frac": round((b["iowait"] - a["iowait"]) / tot, 5),
        "steal_frac": round((b["steal"] - a["steal"]) / tot, 5),
        "jiffies": tot,
    }


def main() -> None:
    t0_wall = time.monotonic()
    # 1350 s (r14): the 900 s default could never fit warm (~250 s) +
    # two measured sf0.1 passes (~450 s each), so every driver run
    # scored single-observation timings; 1350 fits two passes + the
    # retry tail on a healthy host while staying under the driver
    # ceiling observed across r13 (rc=0 at ~1450 s elapsed). Even a
    # kill mid-run leaves the driver a parseable best-so-far line.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "1350"))

    def elapsed() -> float:
        return time.monotonic() - t0_wall

    def remaining() -> float:
        return budget - elapsed()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("bench")
    queries = entrymod.queries()
    # Smoke/test subset (never set by the driver): lets the delivery
    # path - partial lines, final line, sidecar - be exercised in
    # seconds instead of a full 205-query pass.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep_names = {n.strip() for n in only.split(",") if n.strip()}
        queries = {n: f for n, f in queries.items() if n in keep_names}

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # Run-scoped sidecar (VERDICT r13 item 2): never write to the
    # committed closing artifact by default.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(repo_dir, "BENCH_DETAIL_LAST.json"),
    )
    detail_name = os.path.basename(detail_path)
    # Cross-run host reference (r12): read the PREVIOUS run's canary
    # before this run overwrites the sidecar (incremental emission
    # writes it early now). Prefer the last run-scoped sidecar; fall
    # back to the committed closing artifact.
    prev_canary = None
    for cand in (detail_path, os.path.join(repo_dir, "BENCH_DETAIL.json")):
        try:
            with open(cand) as f:
                prev = json.load(f)
        except Exception:
            continue
        # same-sf runs only: comparing a sf0.01 canary against a
        # sf0.1 one would manufacture a bogus host factor
        if prev.get("sf") == sf and prev.get("canary_best"):
            prev_canary = prev.get("canary_best")
            break

    run_count = [0]

    def run_once(name: str) -> float:
        """One materialized run; caller handles exceptions."""
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        el = round(time.perf_counter() - t0, 3)
        # Release persisted relations before the next query: the
        # iterative ops persist inside their plans, and 200 queries'
        # worth of leftover blocks otherwise bleed GC pressure into
        # later measurements. ContextCleaner only reclaims broadcasts
        # once Python-side references die, hence the explicit
        # gc.collect (measured: 3-22 s spread on late-positioned
        # iterative queries without it).
        spark.catalog.clearCache()
        gc.collect()
        # Session-accumulation scrub (r14): a full registry pass in
        # ONE long-lived session degrades monotonically - the r14
        # position audit measured median observed/steady ratios of
        # 1.2x over the first 21 queries decaying to 2-4x past
        # position 150 (pass walls of 1100-1500 s against a 272 s
        # steady-state sum). Two accumulators drive it: streaming
        # queries leave their state-store providers loaded (the
        # maintenance pool keeps servicing every store ever opened -
        # r11's bench tail logged 'Could not unload state store
        # provider'), and localCheckpoint blocks + broadcasts await
        # the ASYNC ContextCleaner, which falls behind while queries
        # keep the executors saturated. StateStore.stop() unloads all
        # providers and parks the maintenance thread (the next
        # streaming query restarts it transparently); a periodic
        # JVM-side System.gc() forces reference processing so the
        # cleaner's queue actually drains (every query would cost
        # ~0.3-1 s each; every 10th amortizes it).
        try:
            jvm = spark.sparkContext._jvm
            jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
            run_count[0] += 1
            if run_count[0] % 10 == 0:
                jvm.System.gc()
        except Exception:  # pragma: no cover - defensive
            pass
        return el

    def emit(
        timings: dict, errors: list, detail: dict, final: bool = False
    ) -> None:
        """One summary JSON line to stdout (driver parses the LAST
        line) + refresh the sidecar detail file. Called after every
        completed pass, every ~25 queries inside a pass, and once at
        the very end (``final=True`` - the only emission whose stdout
        line omits ``"partial": true``; ADVICE r13)."""
        total = round(sum(t for t in timings.values() if t >= 0), 3)
        canary_best = timings.get(CANARY)
        host_factor = None
        if prev_canary and canary_best and canary_best > 0:
            host_factor = round(canary_best / prev_canary, 3)
        detail = dict(detail)
        detail.update(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "canary_best": canary_best,
                "host_factor_vs_prev": host_factor,
                "sf": sf,
                "elapsed_sec": round(elapsed(), 1),
                "budget_sec": budget,
            }
        )
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        # The stdout line must stay short enough to survive the
        # driver's bounded tail capture (round-1 BENCH recorded
        # parsed=null on a ~3 KB line): headline + slowest only.
        slowest = sorted(timings, key=timings.get, reverse=True)[:8]
        keep = {
            n: timings[n] for n in timings if n in HEADLINE or n in slowest
        }
        line = {
            "metric": "total_query_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": keep,
            "sf": sf,
            "n_queries": len(timings),
            "n_failed": len(errors),
            "passes_done": detail.get("passes_done"),
            "canary": canary_best,
            "host_vs_prev": host_factor,
            "detail": detail_name,
        }
        if not final:
            # ADVICE r13: a last-line parser must be able to tell a
            # mid-pass best-so-far total from the authoritative final
            # summary without cross-checking n_queries.
            line["partial"] = True
        print(json.dumps(line, separators=(",", ":")))
        sys.stdout.flush()

    # Warm JVM/codegen/Python-worker paths: one full pass at the
    # smallest scale factor, so timings reflect steady-state execution
    # (what a long-running cluster job sees), not first-query JIT
    # cost. UNCONDITIONAL (VERDICT r13 item 1a): the r12 time-box cut
    # the warm on a degraded host and pass 0 then ran cold - 1021 s
    # vs the 272.6 s committed estimator. Warmth is bought before
    # breadth: ~1-2 min on a healthy host, and a budget too small to
    # fit warm + one measured pass produces junk either way.
    warm_dir = "/root/testdata/sf0.001"
    warmed = 0
    warm_wall = 0.0
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        t_warm0 = time.monotonic()
        # r15 (VERDICT r14 item 2): the warm pass cost ~250-300 s of
        # the 1350 s budget, which is why the 32-core driver run fit
        # only ONE measured pass. Warmth stays UNCONDITIONAL (r13
        # mandate) but is bought cheaper: the NON-streaming queries
        # are independent sub-second jobs at sf0.001, so a small
        # driver thread pool overlaps them (guide §2.6) - the warm
        # pass only needs every code path exercised, not timed.
        # Streaming queries warm SEQUENTIALLY afterwards: they mutate
        # session-global state (sized_state_partitions serializes via
        # a lock, state-store providers load per query) and the
        # periodic StateStore.stop() scrub would race a concurrently
        # RUNNING stream. The scrub runs between batches only, never
        # concurrently with any query.
        from concurrent.futures import ThreadPoolExecutor

        def _warm_scrub() -> None:
            spark.catalog.clearCache()
            gc.collect()
            try:
                jvm = spark.sparkContext._jvm
                st = jvm.org.apache.spark.sql.execution.streaming
                st.state.StateStore.stop()
                jvm.System.gc()
            except Exception:  # pragma: no cover - defensive
                pass

        def _warm_one(name: str) -> bool:
            try:
                queries[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                return True
            except Exception as exc:  # pragma: no cover - defensive
                print(f"warm {name} failed: {exc}", file=sys.stderr)
                return False

        batch_names = [n for n in queries if not n.startswith("streaming_")]
        stream_names = [n for n in queries if n.startswith("streaming_")]
        # Scrub between bounded batches (same every-~10th cadence as
        # before), with no query in flight during the scrub.
        group = max(1, min(10, len(batch_names)))
        with ThreadPoolExecutor(max_workers=3) as pool:
            for i in range(0, len(batch_names), group):
                chunk = batch_names[i : i + group]
                warmed += sum(pool.map(_warm_one, chunk))
                _warm_scrub()
        for name in stream_names:
            warmed += _warm_one(name)
        _warm_scrub()
        warm_wall = round(time.monotonic() - t_warm0, 1)
        print(
            f"warm pass: {warmed}/{len(queries)} warmed in "
            f"{warm_wall:.0f}s",
            file=sys.stderr,
        )

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # Quiet-machine gate (VERDICT r5 item 2 / r10): recording the
    # round-over-round baseline from a contended machine manufactures
    # phantom regressions. Wait (bounded by BOTH the quiet-wait knob
    # and 15% of the wall budget) for the 1-minute and 5-minute
    # loadavg to drop below their thresholds - the 5-min bound catches
    # the "recently hammered" state (r10: 1-min 1.30, 5-min 6.52).
    quiet_load = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "1.5"))
    quiet_wait = min(
        float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "300")),
        0.15 * budget,
    )
    quiet_load5 = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD5", "3.0"))
    waited = 0.0
    # r15 (VERDICT r14 item 2): the loadavg quiet-wait burned up to
    # 0.15 x budget (~200 s) even when the host was actually healthy -
    # the warm pass itself inflates loadavg, so the gate could wait on
    # OUR OWN load. When a previous same-sf canary exists, one probe
    # of the flagship decides directly: if the machine runs it within
    # SPARK_GRAFT_BENCH_QUIET_CANARY (default 1.2) x the previous
    # run's best, measured passes start immediately; the canary/
    # degraded-pass machinery still guards everything downstream.
    quiet_canary_ratio = float(
        os.environ.get("SPARK_GRAFT_BENCH_QUIET_CANARY", "1.25")
    )
    if prev_canary and CANARY in queries:
        try:
            # min of two probes: the first sf-dir run after the
            # sf0.001 warm pays the page-cache-cold read, the second
            # is steady - one cold draw must not veto a healthy host.
            probe = min(run_once(CANARY), run_once(CANARY))
            if probe <= quiet_canary_ratio * prev_canary:
                quiet_wait = 0.0
                print(
                    f"quiet-gate: canary probe {probe:.2f}s <= "
                    f"{quiet_canary_ratio} x prev best {prev_canary:.2f}s "
                    "- host healthy, skipping loadavg wait",
                    file=sys.stderr,
                )
            else:
                print(
                    f"quiet-gate: canary probe {probe:.2f}s vs prev best "
                    f"{prev_canary:.2f}s - degraded, keeping loadavg wait",
                    file=sys.stderr,
                )
        except Exception:  # pragma: no cover - defensive
            pass
    while (
        os.getloadavg()[0] >= quiet_load or os.getloadavg()[1] >= quiet_load5
    ) and waited < quiet_wait:
        print(
            f"quiet-gate: loadavg {os.getloadavg()[0]:.2f}/"
            f"{os.getloadavg()[1]:.2f} (1m>={quiet_load} or "
            f"5m>={quiet_load5}), waiting ({waited:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(10.0)
        waited += 10.0
    load_start = os.getloadavg()

    canary_ratio = float(
        os.environ.get("SPARK_GRAFT_BENCH_CANARY_RATIO", "1.5")
    )
    # Whole-run-retry trigger sensitivity is a SEPARATE knob (ADVICE
    # r12: one value silently served both purposes and the retry
    # trigger default dropped 3.0 -> 1.5). 3.0 restores the pre-r12
    # retry behavior; pass rejection stays at 1.5.
    retry_ratio = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_RATIO", "3.0"))

    def score(
        all_runs: dict,
        run_pass_idx: dict,
        passes_meta: list,
    ) -> tuple[dict, list, list]:
        """Per-query min over runs from non-degraded passes.
        Returns (timings, errors, degraded_pass_indices)."""
        medians = [
            pm["canary_median"]
            for pm in passes_meta
            if pm["canary_median"] is not None
        ]
        degraded: list[int] = []
        if medians:
            best = min(medians)
            degraded = [
                i
                for i, pm in enumerate(passes_meta)
                if pm["canary_median"] is not None
                and pm["canary_median"] >= canary_ratio * best
            ]
        timings: dict[str, float] = {}
        errors: list[str] = []
        for name in all_runs:
            rs = all_runs[name]
            if not rs:
                timings[name] = -1.0
                errors.append(name)
                continue
            clean = [
                el
                for el, p in zip(rs, run_pass_idx[name])
                if p not in degraded
            ]
            timings[name] = min(clean if clean else rs)
        return timings, errors, degraded

    def measured_phase(
        phase_seed: int, on_pass=None
    ) -> tuple[dict, dict, list, dict]:
        """Up to ``runs`` interleaved full passes, randomized order
        each pass; budget-aware (a pass only starts if the remaining
        budget fits the previous pass's wall plus margin, and at
        least one pass always runs). ``on_pass(timings, errors,
        meta)`` fires after each completed pass for incremental
        emission. Returns (timings, all_runs, errors, meta)."""
        all_runs: dict[str, list[float]] = {n: [] for n in queries}
        run_pass_idx: dict[str, list[int]] = {n: [] for n in queries}
        fail_msgs: dict[str, str] = {}
        infra_retried: list[str] = []
        passes_meta: list[dict] = []
        names = list(queries)
        probe_every = max(10, len(names) // 8)
        emit_every = max(20, len(names) // 8)
        skipped_passes = 0

        def intra_pass_emit(p: int) -> None:
            """Mid-pass best-so-far line (r13): a kill landing INSIDE
            a long pass (sf0.1 pass 0 has taken 25 min on a noisy
            host) must still leave the driver a parseable line.
            Clearly flagged: in_progress, queries timed so far."""
            if on_pass is None:
                return
            t, e, d = score(all_runs, run_pass_idx, passes_meta)
            timed = {k: v for k, v in t.items() if v >= 0}
            on_pass(
                timed,
                [],
                {
                    "passes_done": p,
                    "passes_planned": runs,
                    "in_progress": {
                        "pass": p,
                        "queries_timed": len(timed),
                        "of": len(names),
                    },
                },
            )

        for p in range(runs):
            if p > 0:
                # Margin: later passes run warm, so the last pass's
                # wall is already an overestimate; 1.05x + 40 s
                # covers the scoring/retry/emission tail.
                need = passes_meta[-1]["wall_sec"] * 1.05 + 40
                if remaining() < need:
                    skipped_passes = runs - p
                    print(
                        f"budget: skipping passes {p}..{runs - 1} "
                        f"(need ~{need:.0f}s, have {remaining():.0f}s)",
                        file=sys.stderr,
                    )
                    break
            order = names[:]
            random.Random(phase_seed * 1000 + p).shuffle(order)
            canary_probes: list[float] = []
            cpu0 = read_cpu_stat()
            t_pass0 = time.perf_counter()
            for i, name in enumerate(order):
                if i % probe_every == 0 and name != CANARY:
                    try:
                        canary_probes.append(run_once(CANARY))
                    except Exception:  # pragma: no cover - defensive
                        pass
                # One immediate retry on failure (VERDICT r13 item
                # 1c): the r13 driver pass recorded n_failed=1 on a
                # driver-green query from a transient "Python worker
                # failed to connect back" under loadavg 7. A real
                # failure fails twice and is still recorded.
                for attempt in (0, 1):
                    try:
                        el = run_once(name)
                        all_runs[name].append(el)
                        run_pass_idx[name].append(p)
                        if attempt:
                            infra_retried.append(name)
                        break
                    except Exception as exc:  # pragma: no cover
                        fail_msgs[name] = str(exc)[:300]
                        print(
                            f"pass {p} {name} FAILED "
                            f"(attempt {attempt}): {exc}",
                            file=sys.stderr,
                        )
                if (i + 1) % emit_every == 0 and (i + 1) < len(order):
                    intra_pass_emit(p)
            passes_meta.append(
                {
                    "canary_probes": canary_probes,
                    "canary_median": (
                        round(statistics.median(canary_probes), 3)
                        if canary_probes
                        else None
                    ),
                    "cpu": cpu_delta(cpu0, read_cpu_stat()),
                    "loadavg_end": os.getloadavg(),
                    "wall_sec": round(time.perf_counter() - t_pass0, 1),
                }
            )
            print(
                f"pass {p}: wall {passes_meta[-1]['wall_sec']}s canary "
                f"{passes_meta[-1]['canary_median']} cpu "
                f"{passes_meta[-1]['cpu']}",
                file=sys.stderr,
            )
            if on_pass is not None:
                t, e, d = score(all_runs, run_pass_idx, passes_meta)
                for i in d:
                    passes_meta[i]["degraded"] = True
                on_pass(
                    t,
                    e,
                    {
                        "passes_done": p + 1,
                        "passes_planned": runs,
                        "phase_meta": {
                            "passes": passes_meta,
                            "degraded_passes": d,
                            "fail_msgs": fail_msgs,
                        },
                    },
                )
        timings, errors, degraded = score(all_runs, run_pass_idx, passes_meta)
        for i in degraded:
            passes_meta[i]["degraded"] = True
        meta = {
            "passes": passes_meta,
            "degraded_passes": degraded,
            "fail_msgs": fail_msgs,
            "infra_retried": infra_retried,
            "skipped_passes": skipped_passes,
        }
        return timings, all_runs, errors, meta

    base_detail = {
        "runs_per_query": runs,
        "methodology": (
            "interleaved-randomized-passes r14 "
            "(budgeted, session-scrubbed)"
        ),
        "loadavg_start": load_start,
        "quiet_gate": {
            "threshold": quiet_load,
            "threshold_5min": quiet_load5,
            "waited_sec": waited,
        },
        "canary_ratio": canary_ratio,
        "retry_ratio": retry_ratio,
        "warm_queries": warmed,
        "warm_wall_sec": warm_wall,
    }

    def on_pass_phase1(t, e, pass_info):
        d = dict(base_detail)
        d.update(pass_info)
        d["partial"] = pass_info["passes_done"] < pass_info["passes_planned"]
        emit(t, e, d)

    timings, spreads, errors, phase_meta = measured_phase(12, on_pass_phase1)
    phase1_wall = sum(pm["wall_sec"] for pm in phase_meta["passes"])

    # Whole-run retry (VERDICT r7 #1): if the host was contended for
    # the WHOLE phase - end loadavg above the bar after a quiesce
    # window, or every pass degraded relative to a recovered canary -
    # re-measure once and score whichever phase ended healthier.
    # Budget-gated: only when the remaining budget fits another phase.
    retry_load = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_LOAD", "4.0"))
    quiesce = float(os.environ.get("SPARK_GRAFT_BENCH_QUIESCE", "60"))
    load_raw = os.getloadavg()
    if load_raw[0] >= retry_load and quiesce > 0 and remaining() > quiesce:
        time.sleep(quiesce)
    load_end = os.getloadavg()
    # Post-phase canary: if the recovered machine now runs the
    # flagship >= retry_ratio faster than the best the whole phase
    # could record, the phase was measured on a degraded host.
    post_canary: list[float] = []
    if timings.get(CANARY, 0) > 0 and remaining() > 30:
        for _ in range(3):
            try:
                post_canary.append(run_once(CANARY))
            except Exception:  # pragma: no cover - defensive
                break
    phase1_degraded = bool(
        post_canary
        and timings.get(CANARY, 0) > 0
        and min(post_canary) * retry_ratio <= timings[CANARY]
    )
    retry_fits = remaining() > phase1_wall * 1.1 + 60
    whole_run_retry: dict = {
        "threshold": retry_load,
        "fired": False,
        "budget_allowed": retry_fits,
        "phase1_loadavg_raw": load_raw,
        "phase1_loadavg_end": load_end,
        "post_canary": post_canary,
        "canary_phase_min": timings.get(CANARY),
        "phase1_was_degraded": phase1_degraded,
    }
    if (load_end[0] >= retry_load or phase1_degraded) and retry_fits:
        print(
            f"whole-run retry: end loadavg {load_end[0]:.2f} (bar "
            f"{retry_load}) / post canary {post_canary} vs phase min "
            f"{timings.get(CANARY)} - re-measuring",
            file=sys.stderr,
        )
        whole_run_retry["fired"] = True
        whole_run_retry["phase1_timings"] = timings
        whole_run_retry["phase1_all_runs"] = spreads
        whole_run_retry["phase1_meta"] = phase_meta

        def on_pass_phase2(t2, e2, pass_info):
            # A kill during phase 2 must still leave a sane last
            # line: emit whichever phase currently wins the adoption
            # rule (fewer errors, then canary).
            if len(e2) != len(errors):
                use2 = len(e2) < len(errors)
            else:
                use2 = t2.get(CANARY, 1e9) < timings.get(CANARY, 1e9)
            d = dict(base_detail)
            d.update(pass_info)
            d["partial"] = True
            d["whole_run_retry_in_progress"] = True
            emit(t2 if use2 else timings, e2 if use2 else errors, d)

        timings2, spreads2, errors2, phase_meta2 = measured_phase(
            13, on_pass_phase2
        )
        if quiesce > 0 and remaining() > quiesce:
            time.sleep(quiesce)
        load_end2 = os.getloadavg()
        whole_run_retry["phase2_loadavg_end"] = load_end2
        # A phase that FAILED queries never beats one that measured
        # them cleanly (ADVICE r8); tie-break on the canary, then on
        # end loadavg.
        if len(errors2) != len(errors):
            adopt2 = len(errors2) < len(errors)
        elif phase1_degraded:
            adopt2 = timings2.get(CANARY, 1e9) < timings.get(CANARY, 1e9)
        else:
            adopt2 = load_end2[0] < load_end[0]
        if adopt2:
            timings, spreads, errors, phase_meta = (
                timings2,
                spreads2,
                errors2,
                phase_meta2,
            )
            whole_run_retry["adopted"] = "phase2"
        else:
            whole_run_retry["adopted"] = "phase1"

    # Single-pass min-repair (r14): when the budget fit only ONE
    # measured pass, every timing is a single observation - and the
    # committed closing artifacts show a query's first same-session
    # run reads 1.2-4x its steady state even after the scrub. Spend
    # whatever budget remains re-running the slowest observations
    # (biggest excess first), min-merging - the exact mechanism the
    # multi-pass min provides when the budget affords it.
    single_pass_retried = 0
    if len(phase_meta["passes"]) == 1:
        for name in sorted(
            (n for n in timings if timings[n] > 0.3),
            key=lambda n: -timings[n],
        ):
            if remaining() < timings[name] + 15:
                continue  # a cheaper one may still fit - keep scanning
            try:
                el = run_once(name)
            except Exception as exc:  # pragma: no cover - defensive
                print(
                    f"single-pass retry {name} FAILED: {exc}",
                    file=sys.stderr,
                )
                continue
            spreads[name] = spreads.get(name, []) + [el]
            timings[name] = min(timings[name], el)
            single_pass_retried += 1
        if single_pass_retried:
            print(
                f"single-pass min-repair: re-ran {single_pass_retried} "
                f"slowest queries ({remaining():.0f}s budget left)",
                file=sys.stderr,
            )

    # Per-query spread retry (VERDICT r5 item 2): a query whose runs
    # still disagree by > spread_cap even across interleaved passes
    # was unlucky in every pass; re-run it twice now and score from
    # the retry runs only (ADVICE r6). Budget-gated per query.
    spread_cap = float(os.environ.get("SPARK_GRAFT_BENCH_SPREAD", "2.0"))
    retried: list[str] = []
    for name in list(timings):
        times = spreads.get(name) or []
        if timings[name] <= 0.05 or len(times) < 2:
            continue  # failed, trivial, or incomplete - nothing to rescue
        if max(times) / max(min(times), 1e-9) <= spread_cap:
            continue
        if remaining() < max(times) * 2 + 20:
            print(
                f"budget: skipping spread retry for {name}",
                file=sys.stderr,
            )
            continue
        retried.append(name)
        retry_times: list[float] = []
        for _ in range(2):
            try:
                retry_times.append(run_once(name))
            except Exception as exc:  # pragma: no cover - defensive
                print(f"retry {name} FAILED: {exc}", file=sys.stderr)
                break
        spreads[name] = spreads[name] + retry_times
        if retry_times:
            # min over the UNION of pass runs and retry runs (r13): a
            # query cannot spuriously run FASTER than it runs, so the
            # smallest observation is always the best cost estimate.
            # The pre-r13 "score from the retry runs only" (ADVICE r6)
            # made a burst landing on the retry REPLACE a clean pass
            # min (observed: lang_id passes min 0.43 s, retries
            # [6.8, 5.2] -> scored 5.2).
            timings[name] = min(timings[name], min(retry_times))
        print(
            f"retry {name}: {timings[name]}s {spreads[name]}",
            file=sys.stderr,
        )

    final_detail = dict(base_detail)
    final_detail.update(
        {
            "all_runs": spreads,
            "loadavg_end": os.getloadavg(),
            "phase_meta": phase_meta,
            "whole_run_retry": whole_run_retry,
            "spread_retried": retried,
            "single_pass_retried": single_pass_retried,
            "passes_done": len(phase_meta["passes"]),
            "passes_planned": runs,
            "partial": bool(phase_meta.get("skipped_passes")),
        }
    )
    emit(timings, errors, final_detail, final=True)
    sys.stderr.flush()
    # Hard exit: after a registry full of streaming/foreachBatch runs,
    # spark.stop() has been observed to hang the process even though
    # the JSON line is already printed. The driver consumes stdout
    # only; kill the JVM with the process.
    os._exit(0)


if __name__ == "__main__":
    main()
