"""Boundary tests pinning the int64-audit LOW class (VERDICT r8 item 3).

Each documented per-operator bound (see BOUND_PINS in tools/int64_audit.py
and the operator docstrings it cites) gets the two-sided check the HIGH
class already has: exact at the boundary's safe side (vs Python bignum
ground truth), LOUD ANSI failure — never a silent wrap — just past it.

Count-scale bounds (n_users x total_events etc.) cannot be reached with
materializable rows, so those pin the exact EXPRESSION SHAPE the analyzed
plan contains, evaluated on planted aggregate values. Value-scale bounds
(CUPED per-user milli sums, rolling-zscore bucket sums) ARE reachable with
a handful of rows, so those drive the REAL operator end-to-end over a
boundary-scale parquet fixture, with DuckDB parity on the safe side.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

P63 = 2**63


def _one_row(spark, schema, *vals):
    return spark.createDataFrame([tuple(vals)], schema)


def _expect_loud(df):
    """The contract past a documented bound: Spark ANSI raises — the
    failure is LOUD, never a silently wrapped product."""
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        df.collect()


# --- count-scale bounds: expression-shape pins -------------------------

def test_gini_closing_product_boundary(spark):
    # q_events_gini_activity: (2*src - (n+1)*s) / (n*s) — bound n*s < 2^63
    n = s = 3_000_000_000  # n*s = 9.0e18 < 2^63: exact
    src = n * s // 2
    df = _one_row(spark, "n bigint, s bigint, src bigint", n, s, src)
    got = df.select(
        (F.lit(2) * F.col("src") - (F.col("n") + 1) * F.col("s")).alias("num"),
        (F.col("n") * F.col("s")).alias("den"),
    ).first()
    assert got["den"] == n * s
    assert got["num"] == 2 * src - (n + 1) * s
    bad = _one_row(spark, "n bigint, s bigint, src bigint",
                   3_100_000_000, 3_100_000_000, 1)
    _expect_loud(bad.select((F.col("n") * F.col("s")).alias("x")))


def test_changepoint_stat_boundary(spark):
    # q_events_changepoint_loc: |ct*tt - t*s| — bound s*tt < 2^63
    s, tt = 1_000_000_000_000_000, 8784  # a year of hours: 8.78e18 OK
    ct, t = s - 1, tt - 1
    df = _one_row(spark, "ct bigint, t bigint, s bigint, tt bigint",
                  ct, t, s, tt)
    got = df.select(
        F.abs(F.col("ct") * F.col("tt") - F.col("t") * F.col("s")).alias("st")
    ).first()["st"]
    assert got == abs(ct * tt - t * s)
    bad = _one_row(spark, "ct bigint, tt bigint",
                   1_100_000_000_000_000_000, 10)
    _expect_loud(bad.select((F.col("ct") * F.col("tt")).alias("x")))


def test_autocorr_moment_product_boundary(spark):
    # q_events_autocorr: sum(x*y), x/y hourly counts — bound max_hourly *
    # per-type total < 2^63
    x = y = 3_030_000_000  # 9.18e18 < 2^63
    df = _one_row(spark, "x bigint, y bigint", x, y)
    assert df.select(F.sum(F.col("x") * F.col("y")).alias("sxy")).first()[
        "sxy"
    ] == x * y
    _expect_loud(
        _one_row(spark, "x bigint, y bigint", 3_100_000_000, 3_100_000_000)
        .select(F.sum(F.col("x") * F.col("y")).alias("sxy"))
    )


def test_burstiness_s_squared_boundary(spark):
    # q_text_burstiness: N*s2 - s*s — bound per-term corpus count < ~3.0e9
    s = 3_030_000_000
    df = _one_row(spark, "s bigint", s)
    assert df.select((F.col("s") * F.col("s")).alias("ss")).first()[
        "ss"
    ] == s * s
    _expect_loud(
        _one_row(spark, "s bigint", 3_100_000_000)
        .select((F.col("s") * F.col("s")).alias("ss"))
    )


def test_pair_count_boundary(spark):
    # external_agreement / c_index / triangle_census: n*(n-1) div 2 —
    # bound n < ~3.0e9
    n = 3_037_000_000  # n*(n-1) = 9.223...e18, still under 2^63 - 1
    assert n * (n - 1) < P63
    df = _one_row(spark, "n bigint", n)
    assert df.select(F.expr("n * (n - 1) div 2").alias("pc")).first()[
        "pc"
    ] == n * (n - 1) // 2
    _expect_loud(
        _one_row(spark, "n bigint", 4_300_000_000)
        .select(F.expr("n * (n - 1) div 2").alias("pc"))
    )


def test_chi2_marginal_product_boundary(spark):
    # q_cluster_chi2: row_n * col_n / grand_n — bound N < ~3.0e9
    r = c = 3_030_000_000
    df = _one_row(spark, "r bigint, c bigint", r, c)
    got = df.select((F.col("r") * F.col("c")).alias("p")).first()["p"]
    assert got == r * c
    _expect_loud(
        _one_row(spark, "r bigint, c bigint", 3_100_000_000, 3_100_000_000)
        .select((F.col("r") * F.col("c")).alias("p"))
    )


def test_markov_weighting_boundary(spark):
    # q_events_markov_entropy: n * term_micros, tm <= ~5e6 at 32 types —
    # bound total transitions < ~1.8e12
    n, tm = 1_800_000_000_000, 5_000_000  # 9.0e18 OK
    df = _one_row(spark, "n bigint, tm bigint", n, tm)
    assert df.select((F.col("n") * F.col("tm")).alias("w")).first()[
        "w"
    ] == n * tm
    _expect_loud(
        _one_row(spark, "n bigint, tm bigint", 2_000_000_000_000, 5_000_000)
        .select((F.col("n") * F.col("tm")).alias("w"))
    )


# --- value-scale bounds: END-TO-END over boundary-scale fixtures -------

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(REF_SF), reason=f"fixture dir {REF_SF} absent"
)


def _events_dir(tmp_path, rows):
    """Write an events.parquet (exact driver schema) into a fresh dir."""
    from hostile_fixtures import _write

    d = str(tmp_path)
    _write(d, "events", {
        "event_id": [r[0] for r in rows],
        "ts": [r[1] for r in rows],
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [r[4] for r in rows],
        "props": [r[5] for r in rows],
    })
    return d


def _oracle_events(sf_dir, key):
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    res = con.execute(e.oracle_sql()[key])
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def _parity(spark_df, sf_dir, key):
    from check_oracle import _eq, _rows

    scols, srows = spark_df.columns, spark_df.collect()
    dcols, drows = _oracle_events(sf_dir, key)
    assert sorted(scols) == sorted(dcols)
    sn = _rows(scols, [tuple(r) for r in srows])
    dn = _rows(dcols, drows)
    assert len(sn) == len(dn)
    for x, y in zip(sn, dn):
        assert all(_eq(a, b) for a, b in zip(x, y)), (x, y)


@needs_testdata
def test_rolling_zscore_e2e_boundary(spark, tmp_path):
    import datetime as dt

    from clusterindices_spark.operators.analytics import (
        q_events_rolling_zscore,
    )

    def mk(value):
        return [
            (i, dt.datetime(2024, 1, 1 + i // 24, i % 24), 1, "click",
             value, '{"k": 1}')
            for i in range(26)
        ]

    # under the documented per-bucket bound (|sum| <= ~6.2e5): exact, and
    # DuckDB agrees bit-for-bit
    d_ok = _events_dir(tmp_path / "ok", mk(600_000.0))
    _parity(q_events_rolling_zscore(spark, d_ok),
            d_ok, "events_rolling_zscore")
    # past it (2e6 -> 24 * (2e9 milli)^2 = 9.6e19): LOUD ANSI error
    d_bad = _events_dir(tmp_path / "bad", mk(2_000_000.0))
    _expect_loud(q_events_rolling_zscore(spark, d_bad))


@needs_testdata
def test_cuped_e2e_boundary(spark, tmp_path):
    import datetime as dt

    from clusterindices_spark.operators.analytics import q_events_cuped

    def mk(value):
        rows = []
        for u in (1, 2):  # n>=2 so variance terms are defined
            for i in range(25):  # pre period (before Jan 16)
                rows.append((u * 100 + i, dt.datetime(2024, 1, 2 + i % 10, i % 24),
                             u, "click", value * (1 + 0.1 * u), '{"k": 1}'))
            for i in range(25):  # post period
                rows.append((u * 100 + 50 + i,
                             dt.datetime(2024, 1, 17 + i % 10, i % 24),
                             u, "click", value * (1 + 0.2 * u), '{"k": 1}'))
        return rows

    # under the documented bound (aggregate form, tightened r9: sum over
    # users of x^2 < 2^63 -> per-user milli <= ~3.0e9/sqrt(n_users)):
    # value 4e4 x 25 events x factor <=1.4 -> milli sums <= 1.4e9,
    # sxx ~ 2*(1.4e9)^2 = 3.9e18 < 2^63
    d_ok = _events_dir(tmp_path / "ok", mk(40_000.0))
    _parity(q_events_cuped(spark, d_ok), d_ok, "events_cuped")
    # the r8 WRONG bound's blind spot: every per-user PRODUCT under the
    # old 9.2e18 line (milli 2.2-2.8e9, x*y <= 6.7e18) yet the SUM of
    # squares across two users crosses 2^63 -> LOUD
    d_bad = _events_dir(tmp_path / "bad", mk(80_000.0))
    _expect_loud(q_events_cuped(spark, d_bad))


@needs_testdata
def test_attribution_negative_revenue_parity(spark, tmp_path):
    """The r9 truncation-semantics note: integer `div` truncates toward
    zero, so refund-scale NEGATIVE revenue shares round toward zero on
    BOTH engines (Spark div == DuckDB //) — parity pinned end-to-end."""
    import datetime as dt

    from clusterindices_spark.operators.analytics import (
        q_events_attribution_linear,
    )

    rows = [
        # three touches then a refund purchase: -100.000001 / 3 truncates
        (1, dt.datetime(2024, 1, 5, 1), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 5, 2), 1, "click", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 5, 3), 1, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 6, 0), 1, "purchase", -100.000001, "{}"),
        # a positive purchase with two touches for contrast
        (5, dt.datetime(2024, 1, 8, 1), 2, "click", 1.0, "{}"),
        (6, dt.datetime(2024, 1, 8, 2), 2, "click", 1.0, "{}"),
        (7, dt.datetime(2024, 1, 9, 0), 2, "purchase", 99.999999, "{}"),
    ]
    d = _events_dir(tmp_path, rows)
    _parity(q_events_attribution_linear(spark, d),
            d, "events_attribution_linear")
