#!/usr/bin/env python
"""Partition/AQE-variation invariance gate (VERDICT r11 "Next round" #2).

Order-dependence is the silent-wrongness class the fuzz gates keep finding
one key at a time (the r2 round6_stable lesson: float aggregation order
varies with the physical plan, so a result that hashes green under one
shuffle layout can drift under another). This gate systematizes the
detector: run every oracle-backed queries() key under

    spark.sql.shuffle.partitions ∈ {1, 7, 200}  ×  AQE {on, off}

in ONE session (both are runtime-settable confs) and assert the canonical
row multiset — check_oracle's exact canonicalizer, the driver-hash stand-in
— is BIT-IDENTICAL across all six physical layouts. Any key whose result
depends on partition count or adaptive re-planning is, by construction, a
key whose driver hash is a coin flip on a real cluster.

partitions=1 forces everything through single-reducer sorts (max
serialization, no partial-order variety); 7 is a prime that never divides
the fixture key cardinalities evenly; 200 (the Spark default) over-shards
the sf0.01 fixtures so most groups land alone. AQE on/off toggles runtime
coalescing/skew-splitting, i.e. a different physical plan for the same
logical plan.

Usage:
  python tools/invariance_gate.py                       # all oracle keys
  python tools/invariance_gate.py --sf /root/testdata/sf0.001 tpch_q1
  python tools/invariance_gate.py --all                 # + rows-only keys
Report: reports/invariance_gate.md. Exit 0 iff zero drift.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import _rows  # the driver-hash stand-in canonicalizer

CONFIGS = [
    (p, aqe) for p in (1, 7, 200) for aqe in ("true", "false")
]


def _digest(canon_rows) -> str:
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(repr(r).encode())
        h.update(b"\x00")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--report", default="reports/invariance_gate.md")
    ap.add_argument("--all", action="store_true",
                    help="include rows-only keys (default: oracle-backed)")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e

    from clusterindices_spark.session import get_spark

    spark = get_spark("invariance-gate")
    qs, oracles = e.queries(), e.oracle_sql()
    keys = args.keys or [
        k for k in qs if args.all or k in oracles
    ]

    base_p = spark.conf.get("spark.sql.shuffle.partitions")
    base_aqe = spark.conf.get("spark.sql.adaptive.enabled")

    results = []  # (key, status, detail, sec)
    n_pass = 0
    t_start = time.monotonic()
    for ki, k in enumerate(keys):
        t0 = time.monotonic()
        ref = None  # (config, digest, canon_rows) from the first config
        status, detail = "PASS", ""
        for p, aqe in CONFIGS:
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            label = f"p={p},aqe={aqe}"
            try:
                df = qs[k](spark, args.sf)
                canon = _rows(df.columns, [tuple(r) for r in df.collect()])
            except Exception as ex:
                status = "ERR"
                detail = f"{label}: {type(ex).__name__}: {str(ex)[:200]}"
                break
            dg = _digest(canon)
            if ref is None:
                ref = (label, dg, canon)
            elif dg != ref[1]:
                # multiset symmetric difference, NOT positional zip (r13
                # advice): one early insertion shifts alignment and makes
                # every later pair "differ", hiding the actual drift rows
                from collections import Counter  # noqa: PLC0415

                # repr keys: canon rows can hold lists (unhashable)
                ca = Counter(map(repr, ref[2]))
                cb = Counter(map(repr, canon))
                only_ref = sorted((ca - cb).elements())[:2]
                only_cur = sorted((cb - ca).elements())[:2]
                diffs = {"only_ref": only_ref, "only_cur": only_cur}
                extra = abs(len(canon) - len(ref[2]))
                status = "DRIFT"
                detail = (
                    f"{ref[0]} vs {label}: rows {len(ref[2])} vs "
                    f"{len(canon)} (±{extra}); first diffs: {diffs}"[:400]
                )
                break
        sec = round(time.monotonic() - t0, 1)
        results.append((k, status, detail, sec))
        if status == "PASS":
            n_pass += 1
        print(
            f"{status:5s} {k} ({sec}s)"
            + (f": {detail}" if status != "PASS" else ""),
            flush=True,
        )
    spark.conf.set("spark.sql.shuffle.partitions", base_p)
    spark.conf.set("spark.sql.adaptive.enabled", base_aqe)

    bad = [(k, s, d) for k, s, d, _ in results if s != "PASS"]
    total = time.monotonic() - t_start
    lines = [
        "# Partition/AQE-variation invariance gate "
        "(tools/invariance_gate.py)",
        "",
        f"sf: {args.sf}; keys: {len(keys)}; configs per key: "
        f"{len(CONFIGS)} (shuffle.partitions ∈ {{1, 7, 200}} × AQE on/off, "
        "one session, runtime confs)",
        f"result: **{n_pass}/{len(keys)} bit-identical across all "
        f"{len(CONFIGS)} physical layouts**; drift/err: {len(bad)}; "
        f"wall: {total:.0f}s",
        "",
    ]
    if bad:
        lines.append("## FINDINGS")
        lines.append("")
        for k, s, d in bad:
            lines.append(f"- **{k}** [{s}]: {d}")
        lines.append("")
    lines.append("## Per-key wall (sum of 6 configs)")
    lines.append("")
    for k, s, d, sec in sorted(results, key=lambda r: -r[3])[:15]:
        lines.append(f"- {k}: {s} ({sec}s)")
    lines.append(f"- … ({len(results)} keys total)")
    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nreport: {args.report}; drift/err: {len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
