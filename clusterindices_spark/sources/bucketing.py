"""Bucketed tables — the 100 TB co-located-join strategy (SURVEY.md §4.3).

A fact⋈fact equi-join (orders⋈lineitem on orderkey) shuffles BOTH sides on
every query. Writing the tables bucketed by the join key with matching bucket
counts moves that shuffle to write time, once: subsequent joins read
bucket-aligned splits and Spark plans a SortMergeJoin with NO Exchange on
either side (verified by tests/test_bucketing.py against the executed plan).

At 100 TB: bucket count is chosen so a single bucket of the larger table fits
an executor's memory budget (e.g. 100 TB / 4096 buckets ≈ 24 GB per bucket
pre-filter); both facts share the count so buckets zip 1:1. Bucket pruning
additionally skips whole buckets on bucket-key point predicates.

bucketBy requires a saveAsTable (metastore-tracked) target — plain
``.parquet(path)`` cannot record bucket metadata.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def drop_table(spark: SparkSession, table: str) -> None:
    """DROP TABLE IF EXISTS, plus orphan-location cleanup: a crashed or
    previous-JVM write leaves the managed directory behind while the local
    (ephemeral) catalog has no entry, so the DROP no-ops and the next
    saveAsTable fails with LOCATION_ALREADY_EXISTS. Only local-filesystem
    leftovers are swept — on a cluster with a persistent metastore the DROP
    itself removes the location."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:") :]
    leftover = os.path.join(warehouse, table.lower())
    if os.path.isdir(leftover):
        shutil.rmtree(leftover)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int,
) -> None:
    """Write ``df`` as a bucketed, bucket-sorted managed table. Sorting by
    the bucket key inside each bucket lets SortMergeJoin skip its per-task
    sort on read."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    spark = df.sparkSession
    drop_table(spark, table)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
