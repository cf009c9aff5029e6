"""Physical-plan expectations as a regression test (SURVEY.md §4)."""

from __future__ import annotations

import pytest

from clusterindices_spark.plans.audit import audit_all

from tests.conftest import SF_SMOKE


@pytest.mark.slow  # second tier (VERDICT r13 item 2); round-close runs both
def test_plan_shapes(spark):
    # blanket=True: every registry key without a per-key expectation still
    # gets the no-cartesian floor — FULL audit coverage (VERDICT r4 item 5)
    results = audit_all(spark, SF_SMOKE, blanket=True)
    problems = {k: v for k, v in results.items() if v}
    assert not problems, f"plan audit failures: {problems}"
    assert len(results) >= 220  # per-key entries + blanket floor = all keys


def test_every_registry_key_has_explicit_expectation():
    """r7 (VERDICT r6 missing #4): zero blanket-only keys — every registry
    key carries its own EXPECTATIONS entry (the 5 MLlib sweep keys audit a
    representative internal job via SUBPLAN_PROBES)."""
    from clusterindices_spark.plans.audit import EXPECTATIONS
    from clusterindices_spark.registry import all_queries

    missing = [k for k in all_queries() if k not in EXPECTATIONS]
    assert missing == [], f"blanket-only keys remain: {missing}"
