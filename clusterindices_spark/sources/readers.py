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


def read_text_lines(
    spark: SparkSession, path: str, whole: bool = False
) -> DataFrame:
    """Plain-text source: one row per line (``value STRING``), or one row
    per FILE with ``wholetext`` — the raw-corpus ingest shape feeding the
    text/dedup operators. Line splitting happens in the scan (splittable
    by HDFS block unless wholetext); no schema to drift. (wholetext must
    go through the text() parameter: the option-string spelling is
    silently ignored by the reader.)"""
    return spark.read.text(path, wholetext=whole)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile source: (path, modificationTime, length, content BINARY)
    — the multimodal ingest shape (multimodal.py consumes exactly this
    (id, payload) form after a select). Each file is ONE row read in full:
    right for images/audio clips, wrong for large archives — Spark caps
    rows at spark.sql.sources.binaryFile.maxLength (Int.MaxValue). Filters
    on path/length/modificationTime push down to the file listing, so
    `length < N` prunes oversized blobs BEFORE any byte is read."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
