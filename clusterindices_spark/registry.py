"""Central registry assembling queries() / oracle_sql() from operator modules.

Each operator module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL). A key present in QUERIES but
absent from ORACLES gets the driver's weaker rows-only check (reserved for
inherently approximate / iterative / streaming ops — SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Order matters: the driver's per-round correctness gate checks the first
# ~50 queries() keys, so the highest-value surface (reference-parity cluster
# indices + the LLM-pipeline ops) must come first; the TPC-H / relational_ext
# widening is emitted last (round-1 driver run confirmed every emitted key
# except cluster_chi2 bit-exact — see CORRECTNESS_r01.json + VERDICT.md).
_MODULES = [
    "clusterindices_spark.operators.indices",
    "clusterindices_spark.operators.assignment",
    "clusterindices_spark.operators.sweep",
    "clusterindices_spark.operators.dedup",
    "clusterindices_spark.operators.similarity",
    "clusterindices_spark.operators.textops",
    "clusterindices_spark.operators.multimodal",
    "clusterindices_spark.operators.embeddings",
    "clusterindices_spark.operators.udfs",
    "clusterindices_spark.operators.sessions",
    "clusterindices_spark.operators.curation",
    "clusterindices_spark.operators.analytics",
    "clusterindices_spark.operators.relational",
    "clusterindices_spark.operators.tpch",
    "clusterindices_spark.operators.relational_ext",
    "clusterindices_spark.sql",
]


def _load():
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query keys {dup} from {modname}")
        unknown = set(o) - set(q)
        if unknown:
            raise ValueError(f"{modname} has oracle SQL for unknown keys {unknown}")
        queries.update(q)
        oracles.update(o)
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
