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


def zorder_code(cols, bits: int = 8):
    """Morton (Z-order) code expression over 2+ numeric columns, each
    pre-bucketed to ``bits`` bits. Interleaving the bucket bits gives a
    1-D sort order in which points close in EVERY dimension land close in
    the code, so sorting files by it keeps per-file min/max stats tight on
    ALL the interleaved columns at once — where plain range clustering is
    tight on its leading column only.

    ``cols`` is a list of (bucket_expr) INT columns already scaled to
    [0, 2**bits). Pure bit arithmetic — whole-stage codegen, no UDF.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    code = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(
                F.shiftleft(bit, i * n + (n - 1 - j))
            )
    return code


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    bits: int = 8,
    scaler: str = "quantile",
) -> None:
    """Z-order-clustered parquet layout: bucket each cluster column to
    ``bits`` bits, sort by the interleaved Morton code, and
    range-partition into ``n_files``. A query filtering on ANY subset of
    the cluster columns then skips most files via footer min/max stats —
    the multi-dimensional generalisation of ``write_range_clustered``.

    Scalers:
    - ``"quantile"`` (default): bucket boundaries from ``approxQuantile``
      (Greenwald-Khanna sketch — one sampled pass, driver gets 2**bits
      doubles per column). Equal-mass buckets, so the code space stays
      spread under skew — a heavy-tailed column with min/max scaling
      collapses most rows into a few low buckets and the layout degrades
      to 1-D. Per-row bucket lookup is an ``aggregate`` HOF fold over the
      boundary array (O(2**bits) interpreted adds per row — fine at the
      default 8 bits).
    - ``"minmax"``: affine min/max scaling from one O(1)-row agg; pure
      codegen arithmetic per row. Right for near-uniform columns (ids).

    Scale: one stats pass + one range exchange at write time, amortized
    over every read — the same budget as range clustering. The code
    column is dropped before write so the on-disk schema is unchanged.
    """
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    buckets = []
    if scaler == "quantile":
        qs = [i / (top + 1) for i in range(1, top + 1)]
        for c in cluster_cols:
            bounds = df.approxQuantile(c, qs, 0.001)
            arr = F.array(*[F.lit(float(b)) for b in bounds])
            x = F.col(c).cast("double")
            buckets.append(
                F.aggregate(
                    arr,
                    F.lit(0),
                    lambda acc, b: acc + F.when(x >= b, 1).otherwise(0),
                ).cast("int")
            )
    elif scaler == "minmax":
        lo_hi = df.agg(
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in cluster_cols],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in cluster_cols],
        ).collect()[0]
        for c in cluster_cols:
            lo, hi = lo_hi[f"lo_{c}"], lo_hi[f"hi_{c}"]
            span = (hi - lo) or 1.0
            scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top
            buckets.append(
                F.least(
                    F.greatest(F.floor(scaled), F.lit(0)), F.lit(top)
                ).cast("int")
            )
    else:
        raise ValueError(f"unknown scaler {scaler!r}")
    coded = df.withColumn("__z", zorder_code(buckets, bits))
    (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
