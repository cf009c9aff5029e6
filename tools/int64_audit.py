"""Static int64-hazard audit over the registry's ANALYZED plans (VERDICT r7
item 3).

Two hazard classes, both invisible at gate SFs and both real at id scale:

(a) BIGINT double-division — Spark plans ``bigint / anything`` as
    ``cast(x as double) / cast(y as double)``; past 2^53 the cast loses low
    bits, so quotients (and anything keyed on them, e.g. the
    agg_bitmap_distinct word index before round 8) silently collapse.
    Detector: any ``/`` whose 120-char context contains a bigint column
    (``name#NL``) cast to double.

(b) BIGINT × BIGINT products — exact until the product (or its SUM) crosses
    2^63, then ANSI-errors in Spark while DuckDB promotes to HUGEINT and the
    engines diverge (the CUPED milli lesson). Detector: ``*`` whose operands
    both carry bigint columns and no double cast.

Classification: a hit whose operand NAMES are id-scale (user_id, vec_id,
*_key, purchase ids, …) is HIGH and must appear in ALLOW with a one-line
justification (documented bound, boundary test, or deliberate definition) —
an unallowlisted HIGH hit exits non-zero. Value-scale hits (sums, counts,
micro/milli-quantized metrics) are LOW: ratios of metrics are double BY
INTENT, and quantized-metric products carry their documented per-operator
bounds (each operator's docstring; the audit lists them for review, it does
not re-prove the bounds).

The oracle SQL gets the mirror sweep (DuckDB ``/`` is float division too;
``//`` is the integer form) so a definitional oracle can't hide the same
hazard.

Run: python tools/int64_audit.py [--sf /root/testdata/sf0.001]
Report: reports/int64_audit.md. Exits 1 on unexplained HIGH hits.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_LIKE = re.compile(
    r"^(user_id|event_id|vec_id|doc_id|purchase_id|touch_id|cluster_id"
    r"|[a-z]+_?(cust|supp|part|order|nation|region)key"
    r"|node|src|dst|id|ip_int|word|w)$"
)

# Adjacent-operand extractors (a 120-char context window grabs NEIGHBOR
# columns of a Project list and false-positives; only the tokens touching
# the operator are the operands)
CAST_D_END = re.compile(r"cast\([^()]*?([A-Za-z_]\w*)#\d+L[^()]*? as double\)\)*$")
CAST_D_BEG = re.compile(r"^\(*cast\([^()]*?([A-Za-z_]\w*)#\d+L[^()]*? as double\)")
COL_END = re.compile(r"([A-Za-z_]\w*)#\d+L\)*$")
COL_BEG = re.compile(r"^\(*([A-Za-z_]\w*)#\d+L")
LIT_END = re.compile(r"cast\((\d+) as bigint\)\)*$|(\d+)\)*$")
LIT_BEG = re.compile(r"^\(*cast\((\d+) as bigint\)|^\(*(\d+)[^.\d]")

# LOW-class bound pins (VERDICT r8 item 3): every LOW hit is annotated in
# the report with where its bound lives. Resolution: (key, kind) first,
# then the (kind,) blanket. "pinned @" names the docstring that documents
# the bound; boundary behavior for the riskiest sites is exercised by
# tests/test_int64_bounds.py (loud-not-silent past the line).
BOUND_PINS: dict[tuple, str] = {
    # blanket classes
    ("bigint/ as double",): (
        "double-by-intent: BOTH engines evaluate the identical double "
        "expression, so parity is exact at any magnitude; accuracy past "
        "the 2^53 cast horizon is bounded at 1 ulp — pinned @ "
        "clusterindices_spark/functions/aggregates.py (round6_stable "
        "docstring, shared rendering choke point)"
    ),
    ("bigint*lit",): (
        "small-literal quantizer/weight product; bound lit*max(col) < "
        "2^63 documented per operator (minhash perms: fp<1e9 * mult<=31; "
        "ewma: weight ladder bound @ analytics.py q_events_ewma_smooth; "
        "equi-depth: n_rows*n_buckets; hamming popcount word literals)"
    ),
    # per-key pins for the bigint*bigint class (each docstring carries the
    # derived bound and the loud-failure statement)
    ("events_autocorr", "bigint*bigint"): (
        "bound pinned @ analytics.py q_events_autocorr docstring: "
        "max_hourly*per-type-total < 2^63; boundary test "
        "tests/test_int64_bounds.py"
    ),
    ("events_changepoint_loc", "bigint*bigint"): (
        "bound pinned @ analytics.py q_events_changepoint_loc docstring: "
        "per-type total*#hours < 2^63; boundary test "
        "tests/test_int64_bounds.py"
    ),
    ("events_gini_activity", "bigint*bigint"): (
        "bound pinned @ analytics.py q_events_gini_activity docstring: "
        "n_users*total_events < 2^63; boundary test "
        "tests/test_int64_bounds.py"
    ),
    ("events_cuped", "bigint*bigint"): (
        "bound pinned @ analytics.py q_events_cuped docstring (r8): "
        "per-user period milli sums <= ~3.0e9; END-TO-END boundary test "
        "tests/test_int64_bounds.py"
    ),
    ("events_rolling_zscore", "bigint*bigint"): (
        "bound pinned @ analytics.py q_events_rolling_zscore docstring: "
        "per-bucket |sum(value)| <= ~6.2e5 units; END-TO-END boundary "
        "test tests/test_int64_bounds.py"
    ),
    ("events_markov_entropy", "bigint*bigint"): (
        "bound pinned @ analytics.py q_events_markov_entropy docstring: "
        "total transitions < ~1.8e12"
    ),
    ("text_burstiness", "bigint*bigint"): (
        "bound pinned @ textops.py q_text_burstiness docstring: per-term "
        "corpus count < ~3.0e9 and n_docs*sum(c^2) < 2^63; boundary test "
        "tests/test_int64_bounds.py"
    ),
    ("cluster_chi2", "bigint*bigint"): (
        "bound pinned @ assignment.py q_cluster_chi2 docstring: N < "
        "~3.0e9 points; boundary test tests/test_int64_bounds.py"
    ),
    ("cluster_external_agreement", "bigint*bigint"): (
        "bound pinned @ assignment.py external_agreement docstring: "
        "marginal/cell counts < ~3.0e9; boundary test "
        "tests/test_int64_bounds.py"
    ),
    ("cluster_agreement_ext", "bigint*bigint"): (
        "bound pinned @ assignment.py external_agreement docstring "
        "(shared n*(n-1) device): counts < ~3.0e9"
    ),
    ("c_index", "bigint*bigint"): (
        "bound pinned @ validity.py c_index_of docstring: inherited from "
        "cap_quadratic (QUADRATIC_MAX_ROWS), structurally unreachable"
    ),
    ("dedup_graph_triangles", "bigint*bigint"): (
        "bound pinned @ dedup.py triangle_census docstring: node degree "
        "< ~3.0e9"
    ),
    ("join_spatial_radius", "bigint*bigint"): (
        "bound pinned @ relational_ext.py q_join_spatial_radius "
        "docstring (r7b): planar integer-meter coords bounded by "
        "construction, d^2 <= ~1.3e13"
    ),
    ("agg_quantiles_bucketed", "bigint*bigint"): (
        "bound pinned @ relational_ext.py q_agg_quantiles_bucketed "
        "docstring: rank*bucket products bounded by n_rows*n_buckets"
    ),
    ("events_rolling_zscore", "bigint*lit"): (
        "milli re-quantization literal (div 1000) — see the q_events_"
        "rolling_zscore bound above"
    ),
}


def bound_pin(key: str, kind: str) -> str | None:
    return BOUND_PINS.get((key, kind)) or BOUND_PINS.get((kind,))


# (key, substring-of-signature) -> justification. A HIGH hit is explained if
# any ALLOW entry's key matches and its substring occurs in the signature.
# Empty as of round 8: the four real hits the first sweep surfaced
# (agg_bitmap_distinct, dedup_url_canonical, scalar_math double-division;
# curation_sample_weighted raw Knuth multiply) were all FIXED rather than
# pinned, and the bounded col*lit forms (minhash permutations: fp < 1e9,
# multiplier <= 31) classify as LOW on their small literals.
ALLOW: dict[tuple[str, str], str] = {}


def signature(fragment: str) -> str:
    """Strip expr ids so identical shapes dedup across keys/runs."""
    return re.sub(r"#\d+", "#", fragment).strip()


def sides(plan: str, op: str):
    """(left-context, right-context) for each infix occurrence of op."""
    out = []
    start = 0
    pat = f" {op} "
    while True:
        i = plan.find(pat, start)
        if i < 0:
            break
        out.append((plan[max(0, i - 130) : i], plan[i + len(pat) : i + 130]))
        start = i + len(pat)
    return out


def classify(names: set[str]) -> str:
    return "HIGH" if any(ID_LIKE.match(n) for n in names) else "LOW"


def _leading_double_cast(rs: str) -> bool:
    """True iff the RIGHT operand itself is ``cast(... as double)`` —
    matched on the cast's OWN balanced parens, not a substring scan of the
    context window. The old ``"as double)" in rs[:60]`` heuristic could
    suppress a genuine bigint*bigint hit when the operand was
    ``cast(x as bigint)`` and an unrelated double cast appeared later in
    the 60-char window (ADVICE r9 — audit false negative)."""
    rs = rs.lstrip("(")  # grouping parens around the operand
    if not rs.startswith("cast("):
        return False
    depth = 0
    for i, ch in enumerate(rs):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return rs[: i + 1].endswith(" as double)")
    # cast( truncated by the 130-char context window — fall back to the
    # conservative answer (NOT a double cast ⇒ the hit is kept, never
    # silently suppressed)
    return False


def audit_plan(key: str, plan: str):
    """Yield (kind, severity, names, signature) hits for one plan."""
    seen = set()
    for left, right in sides(plan, "/"):
        # hazardous only when a bigint col feeds the division THROUGH a
        # double cast as the adjacent operand (pure double/double division
        # never sees int64 loss)
        names = set()
        m = CAST_D_END.search(left.rstrip())
        if m:
            names.add(m.group(1))
        m = CAST_D_BEG.match(right.lstrip())
        if m:
            names.add(m.group(1))
        if not names:
            continue
        sig = signature(left[-80:] + " / " + right[:80])
        if ("div", sig) in seen:
            continue
        seen.add(("div", sig))
        yield ("bigint/ as double", classify(names), names, sig)
    for left, right in sides(plan, "*"):
        ls, rs = left.rstrip(), right.lstrip()
        if ls.endswith("as double)") or _leading_double_cast(rs):
            continue  # double math; covered by the / sweep if relevant
        lc, rc = COL_END.search(ls), COL_BEG.match(rs)
        ll = LIT_END.search(ls) if not lc else None
        rl = LIT_BEG.match(rs) if not rc else None
        sig = signature(left[-80:] + " * " + right[:80])
        if ("mul", sig) in seen:
            continue
        seen.add(("mul", sig))
        if lc and rc:  # col * col
            names = {lc.group(1), rc.group(1)}
            yield ("bigint*bigint", classify(names), names, sig)
        elif (lc and rl) or (rc and ll):  # col * literal
            col = (lc or rc).group(1)
            lit = next(g for g in (rl or ll).groups() if g is not None)
            # the Knuth-multiply lesson: id * big-literal overflows at
            # snowflake scale; small literals (<= 64) stay inside int64
            # for any id < 2^57
            if ID_LIKE.match(col) and int(lit) > 64:
                yield ("bigint*lit", "HIGH", {col, lit}, sig)
            else:
                yield ("bigint*lit", "LOW", {col, lit}, sig)


SQL_DIV = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\s*/\s*([A-Za-z_][A-Za-z0-9_]*)")


def audit_oracle(key: str, sql: str):
    for m in SQL_DIV.finditer(sql):
        a, b = m.group(1), m.group(2)
        if ID_LIKE.match(a) or ID_LIKE.match(b):
            yield ("oracle /", "HIGH", {a, b}, m.group(0))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from clusterindices_spark import registry
    from clusterindices_spark.session import get_spark

    queries, oracles = registry._load()
    keys = args.keys or list(queries)
    spark = get_spark()

    rows = []  # (key, kind, severity, names, sig, allowed_reason|None)
    errors = []
    for key in keys:
        try:
            plan = (
                queries[key](spark, args.sf)
                ._jdf.queryExecution()
                .analyzed()
                .toString()
            )
        except Exception as ex:  # a key that can't build is its own bug
            errors.append((key, repr(ex)[:200]))
            continue
        hits = list(audit_plan(key, plan))
        if key in oracles:
            hits += list(audit_oracle(key, oracles[key]))
        for kind, sev, names, sig in hits:
            reason = None
            if sev == "HIGH":
                for (k, sub), why in ALLOW.items():
                    if k == key and sub in sig:
                        reason = why
                        break
            rows.append((key, kind, sev, sorted(names), sig, reason))

    high_bad = [r for r in rows if r[2] == "HIGH" and r[5] is None]
    high_ok = [r for r in rows if r[2] == "HIGH" and r[5] is not None]
    low = [r for r in rows if r[2] == "LOW"]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "reports", "int64_audit.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("# int64 hazard audit (analyzed plans + oracle SQL)\n\n")
        f.write(
            f"keys scanned: {len(keys)}; build errors: {len(errors)}; "
            f"HIGH unexplained: {len(high_bad)}; HIGH allowlisted: "
            f"{len(high_ok)}; LOW (value-scale, double-by-intent or "
            f"documented-bound): {len(low)}\n\n"
        )
        if high_bad:
            f.write("## HIGH — UNEXPLAINED (fix or pin in ALLOW)\n\n")
            for key, kind, _, names, sig, _ in high_bad:
                f.write(f"- **{key}** [{kind}] {names}: `{sig[:160]}`\n")
            f.write("\n")
        if high_ok:
            f.write("## HIGH — allowlisted\n\n")
            for key, kind, _, names, sig, why in high_ok:
                f.write(f"- {key} [{kind}] {names}: {why}\n")
            f.write("\n")
        f.write("## LOW — value-scale hits (bound-pinned per class)\n\n")
        unpinned = 0
        for key, kind, _, names, sig, _ in low:
            pin = bound_pin(key, kind)
            if pin is None:
                unpinned += 1
            f.write(
                f"- {key} [{kind}] {names}: `{sig[:120]}`\n"
                f"  - {'bound pinned: ' + pin if pin else 'UNPINNED'}\n"
            )
        if errors:
            f.write("\n## build errors\n\n")
            for key, ex in errors:
                f.write(f"- {key}: {ex}\n")

    print(
        f"{len(keys)} keys: {len(high_bad)} HIGH unexplained, "
        f"{len(high_ok)} HIGH allowlisted, {len(low)} LOW "
        f"({unpinned} unpinned), {len(errors)} build errors -> {out}"
    )
    for key, kind, _, names, sig, _ in high_bad:
        print(f"HIGH {key} [{kind}] {sorted(names)}: {sig[:140]}")
    return 1 if (high_bad or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
