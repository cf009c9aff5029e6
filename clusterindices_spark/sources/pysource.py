"""Custom Python data source (Spark 4 DataSource API, SPARK-44076).

The engine's sources so far are file formats; this is the OTHER ingest
shape a reference user expects — a programmatic source (think: an internal
service, a queue snapshot, a generator) plugged in through the public
``pyspark.sql.datasource`` extension point with real partition planning:
``partitions()`` splits the row range so the scan parallelizes across
executors exactly like a file scan's splits.

The demo source generates a deterministic synthetic "service log" table.
All fields are pure integer arithmetic on the row id (Knuth multiplicative
hash — the curation_sample_weighted constant), so the output is a function
of (n,) alone: replay-identical under any partitioning AND expressible
verbatim in DuckDB's generate_series for a full value-hash oracle — a
correctness gate most custom sources never get.

Filter pushdown note: ``pushFilters`` is left to Spark (everything is
evaluated post-scan). For a generator whose row cost is one hash, scan +
codegen filter is already optimal; a source backed by a remote service
would implement it to prune ranges server-side.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_A = 2654435761  # Knuth multiplicative constant (shared with curation A-ES)
_M = 1000003
_LEVELS = ("debug", "info", "warn", "error")

SYNTHLOGS_SCHEMA = "id BIGINT, ts_ms BIGINT, level STRING, value BIGINT"
_BASE_TS_MS = 1_700_000_000_000  # fixed epoch anchor (deterministic)
_STEP_MS = 250


def _row(i: int) -> tuple[int, int, str, int]:
    h = (i * _A) % _M
    return (i, _BASE_TS_MS + i * _STEP_MS, _LEVELS[h % 4], h % 100_000)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SynthLogsReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        # contiguous row ranges — the split planning a file source gets from
        # its block listing, done here in Python
        per = max(1, -(-self.n // self.parts))
        return [
            _RangePartition(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SynthLogsDataSource(DataSource):
    """spark.read.format("synthlogs").option("n", N).option("parts", P)"""

    @classmethod
    def name(cls) -> str:
        return "synthlogs"

    def schema(self) -> str:
        return SYNTHLOGS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SynthLogsReader(self.options)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration of the synthlogs format on a session."""
    spark.dataSource.register(SynthLogsDataSource)


def read_synthlogs(spark, n: int = 1000, parts: int = 4):  # noqa: ANN001
    register(spark)
    return (
        spark.read.format("synthlogs")
        .option("n", str(n))
        .option("parts", str(parts))
        .load()
    )


# --- registry surface -------------------------------------------------------

_N_KEY = 20_000


def q_source_python_datasource(spark, sf_dir: str):  # noqa: ANN001
    """Aggregate the custom source per level — proves the Python source's
    rows land in the normal Catalyst pipeline (hash agg over the scan) and
    lets the DuckDB oracle replay the generator arithmetically.
    (sf_dir is unused: the source is parameterized by row count, not
    files — signature kept for the registry contract.)"""
    from pyspark.sql import functions as F

    return (
        read_synthlogs(spark, n=_N_KEY, parts=8)
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("ts_ms").alias("first_ts_ms"),
            F.max("ts_ms").alias("last_ts_ms"),
        )
    )


QUERIES = {"source_python_datasource": q_source_python_datasource}

ORACLES = {
    "source_python_datasource": f"""
WITH g AS (
  SELECT i AS id,
         (i * {_A}) % {_M} AS h
  FROM (SELECT unnest(range({_N_KEY})) AS i)
),
rows_ AS (
  SELECT id,
         {_BASE_TS_MS} + id * {_STEP_MS} AS ts_ms,
         ['debug', 'info', 'warn', 'error'][h % 4 + 1] AS level,
         h % 100000 AS value
  FROM g
)
SELECT level,
       COUNT(*) AS n,
       CAST(SUM(value) AS BIGINT) AS sum_value,
       CAST(MIN(ts_ms) AS BIGINT) AS first_ts_ms,
       CAST(MAX(ts_ms) AS BIGINT) AS last_ts_ms
FROM rows_
GROUP BY level
""",
}
