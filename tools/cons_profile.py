#!/usr/bin/env python
"""Profile per-query CONSTRUCTION cost (driver-side py4j expression
building + any construction-time jobs such as fences/fixpoints).

For each registered query: time ``queries()[name](spark, sf_dir)`` —
no action on the result — and count the Spark jobs that ran during
construction.  Queries whose construction spawns zero jobs spend the
whole interval in pure Python/py4j expression building (guide §5: the
driver should do almost no work).  Output JSON maps
``name -> [cons_seconds, n_jobs_at_construction]``.

Steady-state convention: each query is constructed twice and the
SECOND time is reported — process-level memos (``_exprs.const_cols``,
the scan memo) are warm in the bench's best-of-2 loop, so run 2 is
what the driver's timing actually sees.

Usage:
  python tools/cons_profile.py out.json [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1]
    only = set(sys.argv[2:])

    from stac_geoparquet_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="cons-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = entry_mod.queries()
    queries["q1_pricing_summary"](spark, sf_dir).count()  # JVM warmup

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    results: dict[str, list] = {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        fn = queries[name]
        best = float("inf")
        jobs = 0
        for _ in range(2):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            dt = time.perf_counter() - t0
            jobs = len(tracker.getJobIdsForGroup(None) or []) - j0
            best = dt  # report the LAST (steady-state) construction
        results[name] = [best, jobs]
        print(f"{name:44s} cons={best:6.3f} jobs={jobs}", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    tot = sum(v[0] for v in results.values())
    print(f"TOTAL construction: {tot:.1f}s over {len(results)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
