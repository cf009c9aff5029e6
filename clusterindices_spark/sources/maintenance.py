"""Table maintenance: small-file compaction (SURVEY.md §4.3 companion).

Streaming sinks, dynamic-partition jobs, and high-parallelism writers leave
parquet datasets as thousands of KB-scale files; at 100 TB that turns every
scan into a file-listing + task-scheduling storm (one task per tiny split)
and starves the readers. Compaction rewrites a dataset into
ceil(total_bytes / target_file_bytes) files and swaps it in.

The swap here is local-filesystem two-phase (write aside → rename away →
rename in → delete old), which is atomic enough for a single writer. On a
real deployment the same plan runs through the Hadoop FileSystem rename (or
a table format's transactional commit — Iceberg/Delta rewrite-files); the
sizing logic is identical.
"""

from __future__ import annotations

import math
import pathlib
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 << 20


def data_files(path: str) -> list[pathlib.Path]:
    return [
        p
        for p in pathlib.Path(path).rglob("*.parquet")
        if not p.name.startswith("_")
    ]


def plan_compaction(
    path: str, target_file_bytes: int = DEFAULT_TARGET_BYTES
) -> tuple[int, int, int]:
    """(current file count, total bytes, target file count)."""
    files = data_files(path)
    total = sum(f.stat().st_size for f in files)
    return len(files), total, max(1, math.ceil(total / target_file_bytes))


def detect_partition_cols(path: str) -> list[str]:
    """Hive-layout partition columns, outermost first, read off the
    ``col=value`` directory names."""
    cols: list[str] = []
    cur = pathlib.Path(path)
    while True:
        sub = [d for d in cur.iterdir() if d.is_dir() and "=" in d.name]
        if not sub:
            return cols
        cols.append(sub[0].name.split("=", 1)[0])
        cur = sub[0]


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite the parquet dataset at ``path`` into ~the target file count.
    Returns the new file count. No-ops (returns current count) when the
    dataset already has no more files than the target — compaction that
    rewrites 100 TB to save nothing is the real anti-pattern.

    Hive-partitioned layouts are preserved: rows are shuffled BY the
    partition columns (so each ``col=value`` directory lands in as few
    tasks as possible — one file per directory in the common case) and the
    rewrite goes through ``partitionBy``. A plain ``repartition(n)`` here
    would scatter every partition's rows across every task and emit
    n × n_partitions files — the opposite of compaction."""
    n_now, _, n_target = plan_compaction(path, target_file_bytes)
    if n_now <= n_target:
        return n_now
    cols = detect_partition_cols(path)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    if cols:
        df.repartition(n_target, *cols).write.mode("overwrite").partitionBy(
            *cols
        ).parquet(tmp)
    else:
        df.repartition(n_target).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    pathlib.Path(path).rename(old)
    pathlib.Path(tmp).rename(path)
    shutil.rmtree(old)
    return len(data_files(path))
