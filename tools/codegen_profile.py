"""Per-headline-query janino compile cost, read from Spark's CodegenMetrics.

Backs OPTIMIZATION_r11.md §7.1: how much of the bench's cold pass is
whole-stage-codegen COMPILATION (janino), as opposed to HotSpot JIT
warm-up and first-touch engine work that no metric isolates. One fresh
JVM, each headline query built and executed once, metric deltas recorded
around the action:

- compile_n  : METRIC_COMPILATION_TIME histogram count delta
               (number of janino compilations the query triggered)
- compile_ms : delta of the sum of the histogram's reservoir values.
               Codahale's ExponentiallyDecayingReservoir SAMPLES (1028
               entries, time-decayed), so this is approximate once the
               run exceeds ~1k compilations — the whole headline set
               triggers a few hundred, where the reservoir is lossless
               in practice.
- classes    : METRIC_GENERATED_CLASS_BYTECODE_SIZE count delta
               (generated classes, several per compilation unit)

Caches are drained between queries (same discipline as bench.py's
nocache pass) so shared cached subtrees don't hide a query's codegen.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/codegen_profile.py
Prints one JSON line; progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE

    from disq_spark.operators.dedup import release_caches
    from disq_spark.queries import all_queries
    from disq_spark.session import get_session

    spark = get_session("disq_spark_codegen_profile")
    qs = all_queries()
    jvm = spark._jvm
    cg = getattr(getattr(jvm.org.apache.spark.metrics.source, "CodegenMetrics$"), "MODULE$")
    h_time = cg.METRIC_COMPILATION_TIME()
    h_cls = cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE()

    def snap() -> tuple[int, int, int]:
        return (
            h_time.getCount(),
            sum(h_time.getSnapshot().getValues()),
            h_cls.getCount(),
        )

    per: dict = {}
    for name in HEADLINE:
        n0, ms0, c0 = snap()
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        wall = time.time() - t0
        release_caches(blocking=False)
        spark.catalog.clearCache()
        n1, ms1, c1 = snap()
        per[name] = {
            "compile_n": n1 - n0,
            "compile_ms": ms1 - ms0,
            "classes": c1 - c0,
            "first_run_s": round(wall, 3),
        }
        print(f"# {name}: compiles={n1 - n0} janino_ms={ms1 - ms0} "
              f"classes={c1 - c0} wall={wall:.2f}", file=sys.stderr)
    out = {
        "metric": "codegen_profile",
        "sf_dir": sf_dir,
        "queries": per,
        "total_compile_ms": sum(v["compile_ms"] for v in per.values()),
        "total_compile_n": sum(v["compile_n"] for v in per.values()),
        "total_classes": sum(v["classes"] for v in per.values()),
        "total_first_run_s": round(sum(v["first_run_s"] for v in per.values()), 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
