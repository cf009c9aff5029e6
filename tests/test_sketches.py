"""Bloom-prefilter join reduction and Count-Min-Sketch guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from clusterindices_spark.operators.sketches import (
    RICH_BAL,
    bloom_prefilter,
    cms_build,
    cms_estimate,
    q_join_bloom_prefilter,
    q_text_heavy_hitters_cms,
)
from clusterindices_spark.sources.fixtures import load_table

from tests.conftest import SF_SMOKE


def test_bloom_prefilter_no_false_negatives_and_reduces(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer").where(
        F.col("c_acctbal") > RICH_BAL
    )
    pre = bloom_prefilter(o, "o_custkey", c.select("c_custkey"), "c_custkey")
    true_keys = {r["c_custkey"] for r in c.select("c_custkey").collect()}
    true_matches = {
        r["o_orderkey"]
        for r in o.where(F.col("o_custkey").isin(true_keys)).collect()
    }
    pre_keys = {r["o_orderkey"] for r in pre.collect()}
    # no false negatives: every true match survives the prefilter
    assert true_matches <= pre_keys
    # and the filter actually reduces the fact side (selectivity ≪ 1)
    assert len(pre_keys) < o.count() * 0.5


def test_bloom_join_result_equals_plain_join(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer").where(
        F.col("c_acctbal") > RICH_BAL
    )
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_custkey")
        .collect()
    )
    got = q_join_bloom_prefilter(spark, SF_SMOKE).select(
        "o_orderkey", "o_custkey"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, plain))


def test_cms_never_underestimates_and_bounds_overcount(spark):
    from clusterindices_spark.functions.text import tokens

    d = load_table(spark, SF_SMOKE, "documents")
    terms = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    n_total = terms.count()
    sketch = cms_build(terms)
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact.select("term"))
    joined = exact.join(est, "term").collect()
    assert len(joined) > 0
    eps_n = 2.0 * n_total / 1024  # ε = e/w ≈ 2.7/w; 2/w is the common bound
    for r in joined:
        assert r["cms_estimate"] >= r["exact"], r["term"]  # CMS invariant
        assert r["cms_estimate"] - r["exact"] <= eps_n, r["term"]


def test_cms_report_is_deterministic(spark):
    a = sorted(map(tuple, q_text_heavy_hitters_cms(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, q_text_heavy_hitters_cms(spark, SF_SMOKE).collect()))
    assert a == b


def test_hll_merged_estimate_close_to_exact(spark):
    from clusterindices_spark.operators.sketches import (
        q_agg_hll_partitioned_merge,
    )

    rows = q_agg_hll_partitioned_merge(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        rel = abs(r["hll_estimate"] - r["exact_distinct"]) / max(
            r["exact_distinct"], 1
        )
        # default lgConfigK=12 → ~2.5% relative standard error; 3σ bound
        assert rel <= 0.08, (r["event_type"], rel)
        assert r["n_daily_sketches"] >= 1
