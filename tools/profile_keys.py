#!/usr/bin/env python
"""Phase-level profiler for the r13 optimization round.

For each named registry key: warm at sf0.001, then time N iterations at the
target SF with the noop sink (guide §1.4 — full materialization of every
column, no driver collect in the timed region), recording per-iteration
wall and the Spark job count + job time consumed (statusTracker), so
"how many jobs did this key schedule" — the overhead-dominance signal at
bench scale — sits next to the wall clock.

Usage: python tools/profile_keys.py [--sf DIR] [--iters N] key [key...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--sink", choices=["noop", "count"], default="noop")
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    from clusterindices_spark.registry import all_queries
    from clusterindices_spark.session import get_spark

    spark = get_spark("r13-profile", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    st = spark.sparkContext.statusTracker()

    def run(key: str, sf: str) -> None:
        df = qs[key](spark, sf)
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out = {}
    for key in args.keys:
        if not args.no_warm:
            try:
                run(key, "/root/testdata/sf0.001")
            except Exception as ex:
                print(f"# warm {key} failed: {ex}", file=sys.stderr)
        walls, jobs = [], []
        for i in range(args.iters):
            jvm_before = int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())
            spark.sparkContext.setJobDescription(f"profile:{key}#{i}")
            t0 = time.monotonic()
            run(key, args.sf)
            wall = round(time.monotonic() - t0, 3)
            jvm_after = int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())
            spark.sparkContext.setJobDescription(None)
            walls.append(wall)
            jobs.append(jvm_after - jvm_before)
        out[key] = {"walls": walls, "jobs": jobs}
        print(f"{key}: walls={walls} jobs={jobs}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
