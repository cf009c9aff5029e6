"""Non-parquet sources with explicit schemas (SURVEY.md §2B scan/source).

Schema is always passed explicitly — `inferSchema` triggers an extra full
scan (2× read at 100 TB) and can silently drift types between runs. CSV and
JSON are row formats with no column pruning or predicate pushdown; at scale
they are ingest formats only: land → convert to parquet (bucketed where a
hot join key exists) → query the parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """CSV with an explicit DDL schema; malformed rows fail loudly
    (FAILFAST) — silent null-filling (PERMISSIVE default) corrupts
    aggregates downstream where nobody looks."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines with an explicit DDL schema (FAILFAST, as above)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
