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
