"""Hive-style partitioned parquet layout — the 100 TB table organisation
(SURVEY.md §4.3 companion to bucketing).

At scale a fact table is laid out as ``path/part_col=value/...`` so that:
- a filter on the partition column becomes directory pruning — the scan
  never lists, opens, or reads the other partitions (visible as
  ``PartitionFilters`` in the scan node, and as a shrunken ``inputFiles()``);
- incremental jobs rewrite only the partitions they touch (dynamic
  partition overwrite), which is how a daily pipeline replaces one day of
  a years-deep table without touching the rest.

Partition-column choice is a cardinality trade: date-grain columns (one
directory per day) are the classic choice; high-cardinality keys (user_id)
create a small-files explosion and belong in bucketing, not partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Replace ONLY the partitions present in ``df`` (dynamic partition
    overwrite), leaving every other partition untouched. The option is set
    per-write rather than session-wide so callers can't be surprised by a
    lingering static-overwrite default elsewhere."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_range_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` splits the
    data into ``n_files`` contiguous key ranges (sampled range boundaries),
    and the within-partition sort makes every row group's min/max stats
    tight. The result: each file covers a DISJOINT slice of the cluster
    key, so a range predicate touches ~1/n of the files instead of all of
    them — parquet row-group stats skip within files, and manifest-based
    engines skip whole files.

    This is the time-series complement to hive partitioning (directory
    pruning at date grain) and bucketing (hash co-location for joins):
    cluster WITHIN a partition by the range-scanned column (ts, id). The
    range exchange is one extra shuffle at write time, amortized over
    every read. Row-count caveat: range boundaries come from sampling, so
    files are near-equal, not exactly equal, in size."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
