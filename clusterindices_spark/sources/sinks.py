"""File sinks (SURVEY.md §2B "Sink"; reference A13 results CSV).

Thin, typed wrappers over DataFrameWriter — the engine's supported output
formats with the options that matter for correctness (header, overwrite
semantics). Partitioned parquet is the scale path; single-file CSV exists for
the reference's K-sweep results table (K rows — coalesce(1) is safe ONLY for
driver-sized frames and is deliberately not offered for general data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
