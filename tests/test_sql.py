"""SQL entry-point tests (clusterindices_spark.sql)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clusterindices_spark.sql import register_views, sql
from tests.conftest import SF_SMOKE


def test_register_views_is_idempotent_and_lazy(spark):
    register_views(spark, SF_SMOKE)
    register_views(spark, SF_SMOKE)  # replace, not error
    assert spark.catalog.tableExists("lineitem")
    assert spark.catalog.tableExists("documents")


def test_sql_matches_dataframe_twin(spark):
    """The SQL surface and the DataFrame API must be the same engine:
    identical results for the same logical query."""
    got = sql(
        spark,
        SF_SMOKE,
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag",
    ).collect()
    from clusterindices_spark.sources.fixtures import load_table

    want = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sql_pushes_filters_to_scan(spark):
    """SQL text goes through the same Catalyst pipeline: a WHERE on the
    view must reach the parquet scan as a pushed filter."""
    df = sql(
        spark,
        SF_SMOKE,
        "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderpriority" in plan, plan


def test_recursive_months_ladder_shape(spark):
    """The WITH RECURSIVE calendar ladder terminates at the fixture's fixed
    span: exactly 80 month rows (1995-01 .. 2001-08), every month covered,
    and order counts reconciling to the full table."""
    from clusterindices_spark.operators.sql_features import (
        q_sql_recursive_months,
    )
    from clusterindices_spark.sources.fixtures import load_table

    rows = q_sql_recursive_months(spark, SF_SMOKE).collect()
    assert len(rows) == 80
    total = sum(r["n_orders"] for r in rows)
    assert total == load_table(spark, SF_SMOKE, "orders").count()
    assert min(r["month_start"] for r in rows).isoformat() == "1995-01-01"
    assert max(r["month_start"] for r in rows).isoformat() == "2001-08-01"


def test_variant_roundtrip_types_and_missing_path(spark):
    """VARIANT roundtrip: typed variant_get returns the original values with
    original types; a missing path yields NULL, not an error."""
    from clusterindices_spark.operators.sql_features import q_scalar_variant
    from clusterindices_spark.sources.fixtures import load_table

    got = {
        r["o_orderkey"]: r
        for r in q_scalar_variant(spark, SF_SMOKE).collect()
    }
    want = {
        r["o_orderkey"]: r
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    }
    assert set(got) == set(want)
    for k, r in got.items():
        w = want[k]
        assert r["status"] == w["o_orderstatus"]
        assert r["price"] == w["o_totalprice"]  # double exact roundtrip
        assert r["priority"] == w["o_orderpriority"]
        assert r["absent"] is None


def test_observe_metrics_single_pass(spark):
    """Observation API: pipeline instrumentation (row count + sum) collected
    from the SAME job that materializes the result — no second scan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from clusterindices_spark.sources.fixtures import load_table

    obs = Observation("orders_metrics")
    df = (
        load_table(spark, SF_SMOKE, "orders")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("sum_price"),
        )
        .where(F.col("o_totalprice") > 0)
    )
    n_out = df.count()
    m = obs.get
    assert m["n"] >= n_out
    assert m["sum_price"] > 0
