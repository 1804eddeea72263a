#!/usr/bin/env python
"""Solo-measure declared queries for the optimization round.

Usage:
  python tools/opt_probe.py q1_pricing_summary dedup_containment ...
  python tools/opt_probe.py --plans-dir plans/r10 --suffix before q21_...
  python tools/opt_probe.py --all-top 25          # slowest 25 from bench_detail.json

For each named query: builds the bench session, runs bench.py's warmup
shapes, then times the query with the noop sink (guide §1.4 — computes
every column of every row, no optimizer count-shortcut) min-of-N
(default 3), and optionally writes .explain('formatted') to
<plans-dir>/<name>_<suffix>.txt.  Prints one line per query:
  <name>  noop_s=<min>  count_s=<min>  jobs=<n>
where jobs is the number of Spark jobs the noop action spawned
(scheduling overhead proxy; fences and AQE stages add jobs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--all-top", type=int, default=0)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = list(args.names)
    if args.all_top:
        with open(os.path.join(REPO, "bench_detail.json")) as f:
            detail = json.load(f)["queries"]
        names += [
            n for n in sorted(detail, key=detail.get, reverse=True)
            if n not in names
        ][: args.all_top]

    from stac_geoparquet_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # same warmup as bench.py (JVM + codegen shapes), abbreviated
    queries["q1_pricing_summary"](spark, args.sf_dir).count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    results = {}
    for name in names:
        fn = queries[name]
        best_noop = best_count = best_cons = float("inf")
        jobs = 0
        for i in range(args.runs):
            sc.setJobDescription(f"{name} run{i}")
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            tc = time.perf_counter()
            df = fn(spark, args.sf_dir)
            best_cons = min(best_cons, time.perf_counter() - tc)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if dt < best_noop:
                best_noop = dt
            df2 = fn(spark, args.sf_dir)
            t0 = time.perf_counter()
            df2.count()
            dtc = time.perf_counter() - t0
            best_count = min(best_count, dtc)
        sc.setJobDescription(None)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        results[name] = (round(best_noop, 3), round(best_count, 3))
        print(
            f"{name:42s} noop_s={best_noop:7.3f} count_s={best_count:7.3f}"
            f" cons_s={best_cons:7.3f}",
            flush=True,
        )

    print(json.dumps({k: v[0] for k, v in results.items()}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
