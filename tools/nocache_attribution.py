"""Attribute the steady-state (JIT-warm, cache-cold) headline walls:
executor-active time vs driver gap (round-11 resumption).

bench.py's warm-nocache pass is the recurring-compute number, but a
wall alone doesn't say WHERE the next optimization round should dig:
a query can be slow because its stages are slow (executor compute /
shuffle — guide §2) or because the driver is busy between jobs
(plan build, analysis, py4j, action overhead — guide §7.3). This tool
runs every headline query like the bench's nocache pass (JIT-warmed
first, cache-cold per query) with the event log on, then splits each
wall using the stage submission/completion intervals of the query's
own jobs (matched via setJobDescription). Cache clearing here is
spark.catalog.clearCache() + release_caches() before each measured
run; bench.py's nocache loop calls only clearCache() — an equivalent
cache-cold state, since clearCache() drops the tracked persists'
entries too (release_caches() additionally resets the module-level
tracking list, which bench.py doesn't need):

- stage_union_s : wall-clock during which >=1 of the query's stages
                  was in flight (interval union — concurrent stages
                  don't double-count)
- task_sum_s    : total task time (parallelism = task_sum/stage_union)
- driver_gap_s  : wall - stage_union — time with NO stage in flight:
                  driver-side plan/analysis/py4j/AQE re-planning and
                  job-boundary scheduling

Caveat: stages launched from driver-side threads that do not inherit
the setJobDescription local property (e.g. broadcast-exchange thread
pools on some Spark versions) are not attributed to any query; their
in-flight time would be counted as driver gap. ``unattributed_s``
reports the interval union of such stages inside the measured window
so the gap-share headline can be sanity-checked against it.

Prints one JSON line; run on a quiet box and read it next to the
cpu canary. Usage: python tools/nocache_attribution.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warmups", type=int, default=2)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf
    evdir = tempfile.mkdtemp(prefix="nocache_ev_")

    from bench import HEADLINE, cpu_canary

    from disq_spark.operators.dedup import release_caches
    from disq_spark.queries import all_queries
    from disq_spark.session import get_session

    spark = get_session(
        "disq_spark_nocache_attr",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    qs = all_queries()

    # JIT/codegen warm-up passes (same role as bench.py's cold+warm
    # passes before its nocache loop) — not measured, not labeled.
    for _ in range(args.warmups):
        for name in HEADLINE:
            qs[name](spark, args.sf).count()
        release_caches()
        spark.catalog.clearCache()

    measure_start = time.time()
    walls: dict[str, float] = {}
    for name in HEADLINE:
        spark.catalog.clearCache()
        release_caches()
        sc.setJobDescription(f"attr:{name}")
        t0 = time.time()
        qs[name](spark, args.sf).count()
        walls[name] = time.time() - t0
    sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    with open(os.path.join(evdir, app_id)) as fh:
        events = [json.loads(line) for line in fh]

    stage_to_q: dict[int, str] = {}
    for ev in events:
        if ev.get("Event") == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get("spark.job.description", "")
            if desc.startswith("attr:"):
                for sid in ev.get("Stage IDs", []):
                    stage_to_q[sid] = desc[5:]

    intervals: dict[str, list[tuple[float, float]]] = {}
    unattributed: list[tuple[float, float]] = []
    task_sum: dict[str, float] = {}
    for ev in events:
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            q = stage_to_q.get(si["Stage ID"])
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            if sub is None or comp is None:
                continue
            if q:
                intervals.setdefault(q, []).append((sub / 1e3, comp / 1e3))
            elif sub / 1e3 >= measure_start:
                # stage inside the measured window with no attr: job
                # description — would otherwise be silently counted as
                # driver gap (see module docstring caveat)
                unattributed.append((sub / 1e3, comp / 1e3))
        elif ev.get("Event") == "SparkListenerTaskEnd":
            q = stage_to_q.get(ev["Stage ID"])
            info = ev.get("Task Info") or {}
            if q:
                task_sum[q] = task_sum.get(q, 0.0) + (
                    info.get("Finish Time", 0) - info.get("Launch Time", 0)
                ) / 1e3

    def union(iv: list[tuple[float, float]]) -> float:
        tot, cur_s, cur_e = 0.0, None, None
        for s, e in sorted(iv):
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    tot += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            tot += cur_e - cur_s
        return tot

    per_q = {}
    for name in HEADLINE:
        w = walls[name]
        su = union(intervals.get(name, []))
        ts = task_sum.get(name, 0.0)
        per_q[name] = {
            "wall_s": round(w, 3),
            "stage_union_s": round(su, 3),
            "driver_gap_s": round(w - su, 3),
            "task_sum_s": round(ts, 3),
            "parallelism": round(ts / su, 1) if su > 0.05 else None,
        }
    tot_w = sum(v["wall_s"] for v in per_q.values())
    tot_g = sum(v["driver_gap_s"] for v in per_q.values())
    print(
        json.dumps(
            {
                "metric": "nocache_attribution",
                "sf": args.sf,
                "total_wall_s": round(tot_w, 3),
                "total_driver_gap_s": round(tot_g, 3),
                "driver_gap_share": round(tot_g / tot_w, 3),
                "unattributed_s": round(union(unattributed), 3),
                "canary_sec": cpu_canary(),
                "queries": per_q,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
