#!/usr/bin/env python
"""Isolated warmed A/B for the r12 noisy bench moves (VERDICT r12 "What's
wrong" #3 / "Next round" #4).

BENCH_r12 vs BENCH_r11 at sf0.1 moved four keys outside the documented
±15% noise band with no code change to any of them:
  dedup_components   4.45 -> 6.00 s (+35%)   dedup_near_minhash 2.99 -> 3.81 s
  tpch_q18           0.96 -> 1.47 s (+53%)   tpch_q21           1.17 -> 1.64 s
The r12 run's auto-rerun fired 3x (vs 0 in r11) — a noisy-host signature —
but the standing discipline (r10 wemmert adjudication) requires an
isolated warmed session with a control key before writing "host steal"
in BASELINE.md.

Method (the r10 recipe):
  - ONE warmed session; 1 warm-up + N timed iterations per key,
    ALTERNATING keys each round (steal hits all arms equally; the ratio
    to history is the signal).
  - control key sd_index (stable 0.59-0.87 s across r6-r12): if control
    reads inflated too, the session itself is inflated and per-key reads
    are scaled by the control's inflation factor before judging.
  - verdict per key: median vs its bench_history band (min..max of
    r8-r11 rows). Inside (scaled) band -> r12 number was host noise.
    Above band by >25% scaled -> structural; bisect the r12 commits.

Usage: python tools/bench_ab.py [--sf /root/testdata/sf0.1] [--iters 5]
Report: reports/bench_ab_r13.md
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SUSPECTS = ["dedup_components", "dedup_near_minhash", "tpch_q18", "tpch_q21"]
CONTROL = "sd_index"


def _history_band(key):
    """min/max wall from bench_history.jsonl rows r8+ (post noise-robust
    bench), excluding the r12 run under adjudication (its line is the
    claim being tested, not evidence)."""
    walls = []
    path = "/root/repo/reports/bench_history.jsonl"
    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    # keep all but the last run per file-order for the suspect keys
    runs = [r for r in rows if key in r.get("queries", {})]
    for r in runs[:-1]:
        walls.append(r["queries"][key])
    return (min(walls), max(walls), walls[-1] if walls else None, len(walls))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--report", default="reports/bench_ab_r13.md")
    args = ap.parse_args()

    import __spark_entry__ as e
    from clusterindices_spark.session import get_spark

    spark = get_spark("bench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    keys = SUSPECTS + [CONTROL]

    # warm-up round (JIT + page cache + session caches)
    for k in keys:
        qs[k](spark, args.sf).collect()

    walls: dict[str, list[float]] = {k: [] for k in keys}
    for i in range(args.iters):
        for k in keys:  # alternating: steal hits all arms of a round
            t0 = time.monotonic()
            qs[k](spark, args.sf).collect()
            w = round(time.monotonic() - t0, 3)
            walls[k].append(w)
            print(f"iter{i + 1} {k}: {w}s", flush=True)

    lines = [
        "# r12 noisy bench moves — isolated warmed A/B (tools/bench_ab.py)",
        "",
        f"sf: {args.sf}; {args.iters} timed iterations/key, alternating, "
        f"one warmed session; control: {CONTROL}",
        "",
        "| key | median (this A/B) | history band (pre-r12) | r12 bench | "
        "verdict |",
        "|---|---|---|---|---|",
    ]
    ctl_med = statistics.median(walls[CONTROL])
    lo_c, hi_c, _, _ = _history_band(CONTROL)
    # control inflation factor vs its own historical midpoint
    ctl_mid = (lo_c + hi_c) / 2
    infl = ctl_med / ctl_mid if ctl_mid else 1.0
    lines.append(
        f"| {CONTROL} (control) | {ctl_med:.2f} s | {lo_c:.2f}-{hi_c:.2f} s"
        f" | — | session inflation ×{infl:.2f} |"
    )
    verdicts = {}
    with open("/root/repo/BENCH_r12.json") as f:
        _b = json.load(f)
        # the driver's BENCH_rN.json wraps the bench line under "parsed"
        r12 = (_b.get("parsed") or _b)["queries"]
    for k in SUSPECTS:
        med = statistics.median(walls[k])
        lo, hi, _, n = _history_band(k)
        scaled = med / max(infl, 1.0)  # discount session-wide inflation only
        if scaled <= hi * 1.25:
            v = "host noise — r12 number not structural"
        else:
            v = "STRUCTURAL — exceeds pre-r12 band by >25% after scaling"
        verdicts[k] = (med, scaled, v)
        lines.append(
            f"| {k} | {med:.2f} s (scaled {scaled:.2f}) | {lo:.2f}-{hi:.2f} s"
            f" ({n} runs) | {r12.get(k, float('nan')):.2f} s | {v} |"
        )
        print(f"{k}: median {med:.2f}s scaled {scaled:.2f}s -> {v}",
              flush=True)

    lines += [
        "",
        "raw walls per iteration:",
        "```",
        json.dumps(walls, indent=0),
        "```",
    ]
    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"report: {args.report}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
