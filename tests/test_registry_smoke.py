"""Every registry key must execute end-to-end (SURVEY.md §5: the oracle
gate checks values; this guards the keys the driver exercises — schema
stability and runnability under the same ANSI-on session the tests use)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.mark.slow  # second tier (VERDICT r13 item 2); round-close runs both
def test_every_registry_key_runs(spark):
    from clusterindices_spark.registry import all_queries, all_oracles

    queries = all_queries()
    oracles = all_oracles()
    assert set(oracles) <= set(queries)
    failures = {}
    for name, fn in queries.items():
        try:
            df = fn(spark, SF_SMOKE)
            cols = df.columns
            assert cols, "empty schema"
            n = len(df.collect())
            assert n >= 0
        except Exception as ex:  # collect every failure, report all at once
            failures[name] = repr(ex)[:200]
    assert not failures, f"{len(failures)} keys failed: {failures}"
