#!/usr/bin/env python
"""Dump executed .explain("formatted") plans for named registry keys.

Usage: python tools/dump_plans.py <tag> key [key ...]
Writes $SPARK_GRAFT_PLANS_DIR (default plans/r14)/<key>_<tag>.txt (runs each
query once so the AQE plan is final, mirroring tools/plan_report.py).
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from clusterindices_spark.registry import all_queries
    from clusterindices_spark.session import get_spark

    spark = get_spark("dump-plans", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "plans/r14")
    os.makedirs(plans_dir, exist_ok=True)
    for key in keys:
        df = queries[key](spark, sf_dir)
        nrows = len(df.collect())  # finalize adaptive plan for THIS df
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = f"{plans_dir}/{key}_{tag}.txt"
        with open(path, "w") as f:
            f.write(f"# {key} @ {sf_dir} rows={nrows}\n\n")
            f.write(buf.getvalue())
        print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
