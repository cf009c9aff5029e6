"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``clusterindices_spark``; this module only adapts it
to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full clustering-validity index suite (BD-Silhouette, BD-Dunn,
    Davies-Bouldin, WSSSE) in one pass over sf0.001 embeddings with
    ground-truth labels as the clustering. 1 row, 5 columns."""
    from clusterindices_spark.operators.indices import q_index_suite

    return q_index_suite(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from clusterindices_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from clusterindices_spark.registry import all_oracles

    return all_oracles()
