"""Regression guard for tools/int64_audit.py: the four keys fixed in
round 8 must stay free of unexplained HIGH int64 hazards, and the
detector itself must keep seeing the hazard class (a planted bigint
double-division plan must trip it)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_fixed_keys_stay_clean(spark):
    import pytest

    from int64_audit import ALLOW, audit_plan

    from clusterindices_spark import registry

    # env-portable fixture root (ADVICE r9: hard-coding the path made this
    # guard ERROR instead of SKIP on hosts without the driver's testdata)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"fixture dir {sf_dir} absent")

    queries, _ = registry._load()
    keys = [
        "agg_bitmap_distinct",
        "dedup_url_canonical",
        "scalar_math",
        "curation_sample_weighted",
        "events_attribution_linear",
    ]
    for key in keys:
        plan = (
            queries[key](spark, sf_dir)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        high = [
            (kind, names, sig)
            for kind, sev, names, sig in audit_plan(key, plan)
            if sev == "HIGH"
            and not any(
                k == key and sub in sig for (k, sub) in ALLOW
            )
        ]
        assert high == [], f"{key} regressed: {high}"


def test_detector_sees_planted_hazards(spark):
    """The detector must flag id-scale double-division and Knuth-scale
    literal products — otherwise a clean audit proves nothing."""
    from pyspark.sql import functions as F

    from int64_audit import audit_plan

    df = spark.createDataFrame([(1, 2)], "user_id BIGINT, doc_id BIGINT")
    bad = df.select(
        F.floor(F.col("user_id") / F.lit(64)).alias("w"),
        (F.col("doc_id") * F.lit(2654435761)).alias("h"),
    )
    plan = bad._jdf.queryExecution().analyzed().toString()
    kinds = {(kind, sev) for kind, sev, _, _ in audit_plan("planted", plan)}
    assert ("bigint/ as double", "HIGH") in kinds
    assert ("bigint*lit", "HIGH") in kinds
    # and the safe forms stay quiet
    ok = df.select(
        F.expr("user_id div 64").alias("w"),
        (F.col("doc_id") * F.lit(31)).alias("small"),
    )
    plan_ok = ok._jdf.queryExecution().analyzed().toString()
    assert not [
        h for h in audit_plan("ok", plan_ok) if h[1] == "HIGH"
    ]
