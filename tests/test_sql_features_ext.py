"""Spark-4 SQL feature behaviors beyond the oracle check: collation
semantics, SQL-UDF inlining (no Python boundary in the plan), session
variables, and XML roundtrip fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_collation_counts_case_variants(spark):
    from clusterindices_spark.operators.sql_features import q_scalar_collation

    r = q_scalar_collation(spark, SF_SMOKE).first()
    # the planted case noise doubles the raw distinct count; collated
    # distinct recovers the true segment count
    assert r["n_case_variants"] == 2 * r["n_ci_segments"]
    assert 0 < r["n_auto_ci"] < r["n"]


def test_sql_udf_is_inlined_no_python_eval(spark):
    from clusterindices_spark.operators.sql_features import q_sql_udf_inline

    df = q_sql_udf_inline(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert df.count() > 0


def test_session_vars_rebinding_changes_result(spark):
    from clusterindices_spark.sources.fixtures import load_table

    load_table(spark, SF_SMOKE, "orders").createOrReplaceTempView("o_v")
    spark.sql("DECLARE OR REPLACE VARIABLE cut DOUBLE DEFAULT 0.0")
    q = "EXECUTE IMMEDIATE 'SELECT COUNT(*) AS n FROM o_v WHERE o_totalprice > ?' USING cut"
    n_all = spark.sql(q).first()["n"]
    spark.sql("SET VAR cut = 400000.0")
    n_cut = spark.sql(q).first()["n"]
    assert n_cut < n_all


def test_xml_roundtrip_row_exact(spark):
    import tempfile

    from clusterindices_spark.sources.fixtures import load_table
    from clusterindices_spark.sources.readers import read_xml, write_xml

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="ci-xml-t-")
    write_xml(o, path)
    back = read_xml(
        spark, path, "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    )
    a = sorted(map(tuple, o.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
