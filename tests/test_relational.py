"""Relational-surface behavior tests beyond the oracle harness: sink
roundtrips and plan-shape assertions (the oracle gate checks values; these
check the physical plan is the one we designed for scale)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from clusterindices_spark.operators.relational import (
    q_join_broadcast,
    q_scan_project_filter,
    q_topk_orders,
)
from clusterindices_spark.sources.sinks import (
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)

from tests.conftest import SF_SMOKE


def test_sink_roundtrips(spark):
    df = q_topk_orders(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        write_parquet(df, f"{d}/p", partition_by=None)
        write_csv(df, f"{d}/c", single_file=True)
        write_json(df, f"{d}/j")
        write_orc(df, f"{d}/o")
        back_p = spark.read.parquet(f"{d}/p")
        back_c = spark.read.option("header", "true").csv(f"{d}/c")
        back_j = spark.read.json(f"{d}/j")
        back_o = spark.read.orc(f"{d}/o")
        assert back_p.count() == back_c.count() == back_j.count() == 10
        assert back_o.count() == 10 and back_o.schema == back_p.schema
        assert sorted(back_p.columns) == sorted(df.columns)


def test_partitioned_parquet_sink(spark):
    from clusterindices_spark.sources.fixtures import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory() as d:
        write_parquet(ev, f"{d}/by_type", partition_by=["event_type"])
        back = spark.read.parquet(f"{d}/by_type")
        assert back.count() == ev.count()
        # partition pruning: the partition filter must be applied at the scan
        one = spark.read.parquet(f"{d}/by_type").where(F.col("event_type") == "click")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "event_type" in plan
        assert one.count() > 0


def test_broadcast_join_plan(spark):
    plan = q_join_broadcast(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scan_pushdown(spark):
    plan = q_scan_project_filter(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    # predicate must reach the parquet scan, projection must prune columns
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_schemad_readers_roundtrip(spark):
    """CSV/JSON written by the sinks must read back value-identical through
    the explicit-schema readers (type fidelity: bigint/double/string)."""
    from clusterindices_spark.sources.readers import read_csv, read_json

    df = q_topk_orders(spark, SF_SMOKE)
    schema = "o_orderkey BIGINT, o_custkey BIGINT, price DOUBLE"
    with tempfile.TemporaryDirectory() as d:
        write_csv(df, f"{d}/c", single_file=True)
        write_json(df, f"{d}/j")
        got_csv = read_csv(spark, f"{d}/c", schema)
        got_json = read_json(spark, f"{d}/j", schema).select(
            "o_orderkey", "o_custkey", "price"
        )
        want = sorted(map(tuple, df.collect()))
        assert sorted(map(tuple, got_csv.collect())) == want
        assert sorted(map(tuple, got_json.collect())) == want
        assert got_csv.schema.simpleString() == df.schema.simpleString()


def test_approx_count_distinct_within_rsd(spark):
    """HLL sketches are rows-only checked by the driver; here we bound the
    error: approx must land within 3x the default 5% rsd of the exact
    count for every event_type group."""
    from clusterindices_spark.operators.relational import q_agg_approx
    from clusterindices_spark.sources.fixtures import load_table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_agg_approx(spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.15 * n, 2), (k, approx[k], n)
