"""Bucketed co-located join: the write-time shuffle must eliminate the
read-time Exchange on both join sides (SURVEY.md §4.3 100 TB posture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clusterindices_spark.sources.bucketing import read_table, write_bucketed
from clusterindices_spark.sources.fixtures import load_table

from tests.conftest import SF_SMOKE

N_BUCKETS = 4


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    write_bucketed(
        load_table(spark, SF_SMOKE, "orders"), "orders_b", "o_orderkey", N_BUCKETS
    )
    write_bucketed(
        load_table(spark, SF_SMOKE, "lineitem"), "lineitem_b", "l_orderkey", N_BUCKETS
    )
    # at this tiny sf the planner would broadcast instead (also shuffle-free,
    # but it hides the bucketing path that matters at fact⋈fact scale)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "orders_b").join(
            read_table(spark, "lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        ).select("o_orderkey", "l_partkey", "o_totalprice")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_shuffle(spark):
    # control: same join off plain parquet must carry an exchange (or a
    # broadcast at this tiny sf) — proves the assertion above is meaningful
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_partkey", "o_totalprice"
        )
        plan = _executed_plan(joined)
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_pruning_on_point_lookup(spark):
    # a point predicate on the bucket key must scan 1 of N buckets; the
    # auto-bucketed-scan heuristic turns bucketed reading off for plans
    # that don't exploit the distribution, which also forfeits pruning —
    # disable the heuristic to exercise the pruning path
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = read_table(spark, "orders_b").where(F.col("o_orderkey") == 42)
        plan = _executed_plan(df)
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_bucketed_join_result_matches_unbucketed(spark):
    bucketed = (
        read_table(spark, "orders_b")
        .join(
            read_table(spark, "lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
