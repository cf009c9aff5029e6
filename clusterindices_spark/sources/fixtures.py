"""Fixture-table loaders (FIXTURES.md).

Parquet scans with the casts both engines must share so float math agrees:
- ``embeddings.embedding`` arrives as ``ARRAY<FLOAT>``; cast to
  ``ARRAY<DOUBLE>`` at scan so Spark and the DuckDB oracle both do float64
  math (SURVEY.md §4.3).

Column pruning / predicate pushdown is Catalyst's job — loaders return the
bare scan and let each query ``select``/``where`` so pushdown reaches the
parquet reader (verify with ``.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "embeddings":
        df = df.withColumn("embedding", F.col("embedding").cast("array<double>"))
    return df
