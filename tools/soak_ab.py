#!/usr/bin/env python
"""Isolated A/B for the soak-gate pass-2 5x slowdowns (VERDICT r12 "What's
wrong" #1 / "Next round" #2).

reports/soak_gate.md (r12) flagged kmeans_sweep_best_k 11.25->64.92 s and
bisecting_sweep_small 7.82->41.87 s on the second same-session pass — the
gate's own dead-cache signature — but only the 1.5x total-wall rule gates,
so the suspects were reported-and-ignored. This script discriminates the
three candidate causes in ONE session:

  Phase A (isolated repeats): run each suspect key 4x back-to-back.
      - monotone growth        -> per-invocation state accumulation in the
                                  sweep itself (persist/unpersist bug)
      - flat after warm-up     -> not self-inflicted
  Phase B (pollution probe): run a mixed batch of ~30 other registry keys
      (the soak gate's inter-pass workload in miniature), then the
      suspects again.
      - slowdown reappears     -> cross-key session pollution (codegen /
                                  broadcast / cleaner backlog), scoped to
                                  whatever the batch touched
      - still flat             -> the r12 numbers were host noise /
                                  MLlib-fit variance; pin in BASELINE.md

Usage: python tools/soak_ab.py [--sf /root/testdata/sf0.001]
Report: reports/soak_ab.md
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SUSPECTS = ["kmeans_sweep_best_k", "bisecting_sweep_small"]
# mixed batch approximating the soak inter-pass workload: ML-free keys
# spanning the cache-touching families (IVF/PQ memos, pins, roundtrips,
# CC localCheckpoints) plus plain relational/text churn
BATCH = [
    "dedup_components", "dedup_components_star", "similarity_ann_ivf",
    "similarity_ann_pq", "similarity_ann_ivfpq", "embedding_pq_codes",
    "source_orc_roundtrip", "source_csv_roundtrip", "source_xml_roundtrip",
    "tpch_q1", "tpch_q9", "tpch_q18", "tpch_q21", "dedup_exact",
    "dedup_near_minhash", "text_tokens_stats", "text_tfidf_topterms",
    "events_user_lifecycle", "events_histogram", "window_fill_forward",
    "agg_rollup", "agg_cube", "join_sortmerge", "join_broadcast",
    "stream_tumbling_agg", "stream_session_windows", "curation_pipeline",
    "embedding_whiten", "embedding_normalize", "multimodal_dhash",
]


def _run(qs, k, spark, sf):
    t0 = time.monotonic()
    n = len(qs[k](spark, sf).collect())
    return round(time.monotonic() - t0, 2), n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--report", default="reports/soak_ab.md")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import __spark_entry__ as e
    from clusterindices_spark.session import get_spark

    spark = get_spark("soak-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    batch = [k for k in BATCH if k in qs]

    lines = [
        "# Soak pass-2 slowdown A/B (tools/soak_ab.py)",
        "",
        f"sf: {args.sf}; suspects: {SUSPECTS}; batch: {len(batch)} keys",
        "",
    ]

    # Phase A: isolated repeats
    phase_a = {}
    for k in SUSPECTS:
        walls = []
        for i in range(args.reps):
            w, _ = _run(qs, k, spark, args.sf)
            walls.append(w)
            print(f"A {k} rep{i + 1}: {w}s", flush=True)
        phase_a[k] = walls
        lines.append(
            f"- Phase A {k}: " + " -> ".join(f"{w}s" for w in walls)
        )

    # Phase B: pollution probe
    t0 = time.monotonic()
    for k in batch:
        try:
            qs[k](spark, args.sf).collect()
        except Exception as ex:  # batch keys are context, not the subject
            print(f"B batch {k}: {type(ex).__name__}", flush=True)
    lines.append(
        f"- Phase B batch ({len(batch)} keys): "
        f"{round(time.monotonic() - t0, 1)}s"
    )
    phase_b = {}
    for k in SUSPECTS:
        walls = []
        for i in range(2):
            w, _ = _run(qs, k, spark, args.sf)
            walls.append(w)
            print(f"B {k} rep{i + 1}: {w}s", flush=True)
        phase_b[k] = walls
        lines.append(
            f"- Phase B {k} (post-batch): "
            + " -> ".join(f"{w}s" for w in walls)
        )

    lines.append("")
    verdicts = []
    for k in SUSPECTS:
        a = phase_a[k]
        warm = min(a[1:])  # steady-state isolated wall
        mono = all(b >= 1.5 * x for x, b in zip(a, a[1:]))
        post = min(phase_b[k])
        if mono:
            v = (f"{k}: MONOTONE isolated growth {a} — per-invocation "
                 "state accumulation in the sweep itself")
        elif post >= 3 * warm:
            v = (f"{k}: flat isolated ({a}) but {post}s after the mixed "
                 f"batch (warm {warm}s) — cross-key session pollution")
        else:
            v = (f"{k}: flat isolated ({a}) and flat post-batch "
                 f"({phase_b[k]}) — r12 numbers were fit-variance/host "
                 "noise; pin allowance in BASELINE.md")
        verdicts.append(v)
        lines.append(f"**{v}**")
        print(v, flush=True)

    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"report: {args.report}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
