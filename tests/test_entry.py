"""Driver-contract smoke tests (__spark_entry__)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k"] == 10  # embeddings has exactly 10 label classes
    for c in ("bd_silhouette", "bd_dunn", "davies_bouldin", "wssse"):
        assert r[c] is not None


def test_contract_shapes(spark):
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert callable(next(iter(qs.values())))
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
