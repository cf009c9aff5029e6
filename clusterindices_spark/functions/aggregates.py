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


def exact_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a double expression, rounded to 6dp."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(F.sum(c.cast("decimal(18,6)")).cast("double"), 6)
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum ÷ count, rounded to 6dp.

    Oracle: ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)/COUNT(x), 6).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(
        F.sum(c.cast("decimal(18,6)")).cast("double") / F.count(c), 6
    )
    return out.alias(alias) if alias else out


def sql_exact_sum(expr: str) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE), 6)"


def sql_exact_avg(expr: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), 6)"
    )


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
    tools/int64_audit.py HIGH class)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


SQL_ROUND6 = "(floor(({x}) * 1000000.0 + 0.5) / 1000000.0)"
