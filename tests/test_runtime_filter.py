"""Runtime Bloom-filter join pruning (SURVEY.md §4.3 scale posture).

At 100 TB the dominant cost of `fact ⋈ filtered-dim` is shuffling fact rows
whose keys the filtered dim side will never match. Catalyst's runtime filter
optimization builds a Bloom filter over the creation side's join keys
(`bloom_filter_agg`, a one-pass sketch aggregate) and injects a
`might_contain(...)` predicate into the application side's SCAN, so
non-matching fact rows are dropped before they are ever shuffled — the
distributed analogue of a semi-join reducer.

This is free to adopt (no query rewrite — purely optimizer-injected) but
threshold-gated: `applicationSideScanSizeThreshold` defaults to 10GB, so at
test scale it must be lowered for the rewrite to fire. The tests pin the
injection (and its absence when disabled) so a Spark upgrade or conf drift
can't silently lose the pruning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clusterindices_spark.plans.audit import formatted_plan
from clusterindices_spark.sources.fixtures import load_table

from tests.conftest import SF_SMOKE

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the fixture scan is ~MBs; the default 10GB gate would skip injection
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def _fact_dim_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, SF_SMOKE, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))


def _with_confs(spark, confs):
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_runtime_filter_injected(spark):
    saved = _with_confs(spark, _CONFS)
    try:
        plan = formatted_plan(_fact_dim_join(spark))
        # probe side: the injected predicate sits in the scan-side Filter
        assert "might_contain" in plan, plan
        # build side: one-pass Bloom sketch with partial aggregation
        assert "partial_bloom_filter_agg" in plan, plan
        # and the result is unchanged by the rewrite
        rows = _fact_dim_join(spark).collect()
        assert len(rows) == 1 and rows[0]["n"] > 0
    finally:
        _restore(spark, saved)


def test_bloom_runtime_filter_absent_when_disabled(spark):
    confs = dict(_CONFS)
    confs["spark.sql.optimizer.runtime.bloomFilter.enabled"] = "false"
    saved = _with_confs(spark, confs)
    try:
        plan = formatted_plan(_fact_dim_join(spark))
        assert "might_contain" not in plan
    finally:
        _restore(spark, saved)
