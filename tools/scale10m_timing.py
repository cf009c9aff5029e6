#!/usr/bin/env python
"""Per-row cost comparison for the >=10M events window/lag arm (VERDICT
r10 item 4 'no key >2x its per-row 1M cost').

Runs each SCALE10M_KEYS Spark query (collect, no oracle) against BOTH the
1M scale fixture's events and the 10M scale10m fixture, in one session,
and reports sec-per-Mrow side by side. Spark side only — the DuckDB
oracle's cost is not the engine under grade, and the correctness half is
tools/hostile_gate.py --variants scale10m.

Usage: python tools/scale10m_timing.py [--root1m /tmp/hostile/scale]
           [--root10m /tmp/hostile10/scale10m]
Appends a table to reports/hostile_gate_scale10m.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_gate import SCALE10M_KEYS


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root1m", default="/tmp/hostile/scale")
    ap.add_argument("--root10m", default="/tmp/hostile10/scale10m")
    ap.add_argument("--report", default="reports/hostile_gate_scale10m.md")
    args = ap.parse_args()

    from clusterindices_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("scale10m-timing")
    qs = e.queries()

    def nrows(root):
        return (
            spark.read.parquet(os.path.join(root, "events.parquet")).count()
        )

    n1, n10 = nrows(args.root1m), nrows(args.root10m)
    rows = []
    worst = 0.0
    for k in SCALE10M_KEYS:
        per = {}
        for label, root, n in (("1m", args.root1m, n1),
                               ("10m", args.root10m, n10)):
            t0 = time.monotonic()
            out_n = len(qs[k](spark, root).collect())
            sec = time.monotonic() - t0
            per[label] = (sec, sec / (n / 1e6), out_n)
            print(f"{k} @{label}: {sec:.1f}s ({per[label][1]:.2f} s/Mrow, "
                  f"{out_n} rows)", flush=True)
        ratio = per["10m"][1] / max(per["1m"][1], 1e-9)
        worst = max(worst, ratio)
        rows.append((k, per["1m"], per["10m"], ratio))

    lines = [
        "",
        "## Per-row cost: 1M hostile vs 10M scale10m "
        "(tools/scale10m_timing.py)",
        "",
        f"events rows: 1M fixture {n1:,} / 10M fixture {n10:,} "
        f"(5M-row single-user hot partition). Spark side, one session, "
        f"collect()-materialized.",
        "",
        "| key | 1M s (s/Mrow) | 10M s (s/Mrow) | per-row ratio |",
        "|---|---|---|---|",
    ]
    for k, p1, p10, ratio in rows:
        lines.append(
            f"| {k} | {p1[0]:.1f} ({p1[1]:.2f}) | "
            f"{p10[0]:.1f} ({p10[1]:.2f}) | {ratio:.2f}x |"
        )
    lines.append("")
    lines.append(
        f"worst per-row ratio: {worst:.2f}x "
        f"({'PASS' if worst <= 2.0 else 'FAIL'} against the <=2x gate)"
    )
    with open(args.report, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {args.report}; worst ratio {worst:.2f}x")
    return 0 if worst <= 2.0 else 1


if __name__ == "__main__":
    sys.exit(main())
