"""Cross-engine-deterministic aggregate builders.

Floating-point SUM is order-dependent; Spark's partial aggregation order
varies with partitioning, and DuckDB's differs again, so a raw SUM(double)
over many rows is not hash-stable even after round(6). The money pattern:
cast each value to DECIMAL(18,6) (deterministic per-row rounding), sum
exactly (decimal addition is associative), then cast back to double.
Shuffle/scale cost is identical to a double sum — partial + final hash agg,
map-side combine intact.

Oracle-side equivalent:
    ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE), 6)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PINF = float("inf")
_NINF = float("-inf")


def _nonfinite_flags(c: Column):
    """(has_nan, has_pinf, has_ninf) 0/1 aggregate flags over a group —
    the IEEE-special bookkeeping for exact_sum/exact_avg. NULL rows hit no
    flag (isnan(NULL) and NULL==inf are NULL → otherwise(0))."""
    return (
        F.max(F.when(F.isnan(c), 1).otherwise(0)),
        F.max(F.when(c == F.lit(_PINF), 1).otherwise(0)),
        F.max(F.when(c == F.lit(_NINF), 1).otherwise(0)),
    )


def _finite_or_zero(c: Column) -> Column:
    """The value if finite, else 0 (a placeholder — the flags decide the
    group's special result). Branch is specials→0 / otherwise→c so a NULL
    input (condition NULL) falls through as NULL and an all-NULL group
    still sums to NULL, not 0 (the inverted form zeroed NULLs)."""
    return F.when(
        F.isnan(c) | (c == F.lit(_PINF)) | (c == F.lit(_NINF)), F.lit(0.0)
    ).otherwise(c)


def _ieee_special(c: Column, finite_result: Column) -> Column:
    """Wrap an aggregate with IEEE-754 sum special semantics: NaN if any
    NaN (or both infinities present), else ±Inf if one side present, else
    the finite result. Order-independent by construction — exactly the
    value a double sum would converge to, made deterministic.

    Why: Spark's ANSI double→decimal cast silently maps NaN/±Inf to NULL
    (dropping them from the sum) while DuckDB raises loudly — the fuzz
    wave-3 float-specials knob exposed the silent-drop. Propagating the
    special is the honest IEEE semantics, centralized here and in the
    sql_* twins in lockstep."""
    has_nan, has_pinf, has_ninf = _nonfinite_flags(c)
    return (
        F.when((has_nan == 1) | ((has_pinf == 1) & (has_ninf == 1)),
               F.lit(float("nan")))
        .when(has_pinf == 1, F.lit(_PINF))
        .when(has_ninf == 1, F.lit(_NINF))
        .otherwise(finite_result)
    )


def exact_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a double expression, rounded to 6dp.
    IEEE-transparent on non-finite inputs (NaN/±Inf propagate)."""
    c = F.col(col) if isinstance(col, str) else col
    out = _ieee_special(
        c,
        F.round(
            F.sum(_finite_or_zero(c).cast("decimal(18,6)")).cast("double"), 6
        ),
    )
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum ÷ count, rounded to 6dp.
    IEEE-transparent on non-finite inputs (NaN/±Inf propagate — count
    includes the non-finite rows, as IEEE mean would).

    Oracle: sql_exact_avg (the CASE-wrapped twin).
    """
    c = F.col(col) if isinstance(col, str) else col
    # nullif(count, 0): an all-NULL group is NULL/0, which ANSI division
    # raises on while DuckDB yields NULL — latent until the wave-3
    # degenerate-table knob; NULL÷NULL → NULL matches the oracle
    out = _ieee_special(
        c,
        F.round(
            F.sum(_finite_or_zero(c).cast("decimal(18,6)")).cast("double")
            / F.nullif(F.count(c), F.lit(0)),
            6,
        ),
    )
    return out.alias(alias) if alias else out


def finite_or_null(col: Column | str) -> Column:
    """Treat a non-finite measure as MISSING (NULL) — the policy for every
    integer-micro quantized operator (fuzz wave 3): those paths cannot
    represent NaN/Inf, and the engines disagree silently (Spark floor(NaN)
    = 0 and floor(±Inf) = ±Long.MAX vs DuckDB's loud casts). NaN/±Inf are
    non-measurements, excluded exactly like NULL; the FINITE magnitude
    envelope is unchanged (values past the documented per-family bounds
    still go loud in both engines). SQL twin: sql_finite / the
    `* REPLACE` table rewrite SQL_EVENTS_FINITE_VALUE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        ~(F.isnan(c) | (c == F.lit(_PINF)) | (c == F.lit(_NINF))), c
    )


def sql_finite(expr: str) -> str:
    return f"(CASE WHEN isfinite({expr}) THEN ({expr}) END)"


# Drop-in replacement for a bare `events` table reference in oracle SQL:
# identical schema, value finite-filtered (DuckDB `SELECT * REPLACE`).
SQL_EVENTS_FINITE_VALUE = (
    "(SELECT * REPLACE ((CASE WHEN isfinite(value) THEN value END) "
    "AS value) FROM events) events"
)


_SQL_NAN = "'NaN'::DOUBLE"
_SQL_PINF = "'Infinity'::DOUBLE"
_SQL_NINF = "'-Infinity'::DOUBLE"


def _sql_flag(expr: str, probe: str) -> str:
    return f"MAX(CASE WHEN ({expr}) {probe} THEN 1 ELSE 0 END)"


def _sql_ieee_special(expr: str, finite_sql: str) -> str:
    # NOT x != x: DuckDB's total-order comparison makes NaN = NaN TRUE
    # (probed), so the classic self-inequality idiom misses NaN there
    nan_f = f"MAX(CASE WHEN isnan({expr}) THEN 1 ELSE 0 END)"
    pinf_f = _sql_flag(expr, f"= {_SQL_PINF}")
    ninf_f = _sql_flag(expr, f"= {_SQL_NINF}")
    return (
        f"(CASE WHEN {nan_f} = 1 OR ({pinf_f} = 1 AND {ninf_f} = 1) "
        f"THEN {_SQL_NAN} "
        f"WHEN {pinf_f} = 1 THEN {_SQL_PINF} "
        f"WHEN {ninf_f} = 1 THEN {_SQL_NINF} "
        f"ELSE {finite_sql} END)"
    )


def _sql_finite_or_zero(expr: str) -> str:
    return (
        f"(CASE WHEN isnan({expr}) OR ({expr}) = {_SQL_PINF} "
        f"OR ({expr}) = {_SQL_NINF} THEN 0.0 ELSE ({expr}) END)"
    )


def sql_exact_sum(expr: str) -> str:
    fin = (
        f"ROUND(CAST(SUM(CAST({_sql_finite_or_zero(expr)} "
        f"AS DECIMAL(18,6))) AS DOUBLE), 6)"
    )
    return _sql_ieee_special(expr, fin)


def sql_exact_avg(expr: str) -> str:
    fin = (
        f"ROUND(CAST(SUM(CAST({_sql_finite_or_zero(expr)} "
        f"AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}), 6)"
    )
    return _sql_ieee_special(expr, fin)


def round6_stable(col):
    """Cross-engine-stable 6dp rounding: floor(x·1e6 + 0.5)/1e6. round()'s
    half-case convention differs across engines (Spark HALF_UP on the
    decimal rendering vs DuckDB's scaled-multiply), which flips outputs
    landing exactly on a .xxxxxx5 boundary — text_quality's weighted score
    hit 0.4284375 at sf0.1. floor on identical doubles is deterministic.
    Pair with SQL_ROUND6 in the oracle. Signed inputs are PARITY-SAFE —
    both engines apply the identical floor formula, so negatives round
    half-toward-+∞ on both sides (e.g. −0.1234565 → −0.123456, not
    −0.123457). That is a deliberate contract, not a bug: do NOT "fix" a
    signed caller (embedding_dim_stats mean_x, rolling_zscore roll_mean)
    to round half-away-from-zero without changing SQL_ROUND6 in lockstep,
    or parity breaks. Where the conventional sign-symmetric rounding is
    wanted for presentation, negate-round-negate as text_zipf_fit does
    (ADVICE r4).

    int64 LOW-class accuracy bound (pinned r9, the shared choke point for
    every ``bigint/ as double`` audit hit): a BIGINT numerator/denominator
    cast to double is exact up to 2⁵³ and correct to 1 ulp beyond; since
    BOTH engines evaluate the identical double expression, parity holds at
    ANY magnitude — past 2⁵³ the only effect is that the 6th decimal may
    differ from infinite-precision by ≤1 µ-unit, identically on both
    sides. This is an accuracy bound, never a divergence bound; the
    silent-divergence class is quotient-KEYING (integer `div` rule,
    tools/int64_audit.py HIGH class).

    Non-finite transparency (fuzz wave 3): Spark's floor(double) returns
    BIGINT and silently maps NaN→0 and ±Inf→±Long.MAX, while DuckDB's
    floor stays DOUBLE and propagates the special — a silent cross-engine
    divergence on any NaN/Inf input. Pass specials through untouched
    (NaN→NaN, ±Inf→±Inf), exactly what SQL_ROUND6 computes in DuckDB
    (floor(nan)=nan, nan/1e6=nan).

    Form: greatest(least(r, c+1), c−1) rather than a CASE — CaseWhen's
    LAZY branches defeat whole-stage-codegen subexpression elimination,
    so a hot caller's input expression (e.g. the pair-scan cosine in
    embedding_pair_distance_hist: 2.28 s → 4.43 s at sf0.1) re-evaluated
    per branch; least/greatest evaluate eagerly and CSE applies. The
    clamp is exact for in-envelope inputs: finite |c| ≤ Long.MAX/1e6
    (≈9.22e12) has |r − c| ≤ 1e-6 so the bounds never bind; NaN wins
    greatest (Spark sorts NaN greatest, least skips it); ±Inf binds the
    matching bound. NULL propagates through all three legs.

    RESIDUAL out-of-envelope band (r11 ADVICE, documented by choice): for
    finite |c| > Long.MAX/1e6 Spark's floor saturates to ±Long.MAX so
    r ≈ ±9.22e12 and the clamp returns c ± 1, while DuckDB computes the
    true rounding — a bounded ≤1-unit cross-engine divergence on inputs
    ~6 orders of magnitude past any fixture/fuzz envelope. Making this
    loud is deliberately rejected: an ANSI bigint cast raises on NaN,
    breaking the non-finite transparency contract above, and a CaseWhen
    guard around the hot input re-triggers the CSE-defeat perf incident
    (embedding_pair_distance_hist 2.28→4.43 s). Callers whose inputs can
    legitimately exceed 9.22e12 must pre-scale or use _micros-guarded
    integer paths instead."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    r = F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    return F.greatest(F.least(r, c + F.lit(1.0)), c - F.lit(1.0))


SQL_ROUND6 = "(floor(({x}) * 1000000.0 + 0.5) / 1000000.0)"
