"""Physical-plan expectations as a regression test (SURVEY.md §4)."""

from __future__ import annotations

from clusterindices_spark.plans.audit import audit_all

from tests.conftest import SF_SMOKE


def test_plan_shapes(spark):
    results = audit_all(spark, SF_SMOKE)
    problems = {k: v for k, v in results.items() if v}
    assert not problems, f"plan audit failures: {problems}"
