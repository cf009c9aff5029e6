"""SQL entry point: run ANSI SQL directly against the fixture tables.

The DataFrame operators in ``operators/`` declare plans programmatically;
this module is the complementary surface for users who speak SQL — it
registers every fixture table as a temp view and hands the text to
``spark.sql``, so Catalyst plans it exactly like the DataFrame twins
(predicate pushdown, broadcast selection, and AQE all apply unchanged).

The ``sql_interface`` registry key demonstrates the contract at its
strictest: ONE query string executed verbatim by both Spark and the
DuckDB oracle must produce bit-identical results. That constrains the
demo query to the ANSI intersection of the two dialects (explicit CASTs,
decimal-exact sums — the same conventions the rest of the repo encodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clusterindices_spark.sources.fixtures import TABLES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register each fixture table as a session-scoped temp view (idempotent:
    re-registration replaces). Views are lazy — no scan happens until a
    query references one, and unreferenced views cost nothing."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL query against the registered fixture views."""
    register_views(spark, sf_dir)
    return spark.sql(query)


# one text, two engines: must be valid and bit-identical in Spark AND DuckDB
PORTABLE_DEMO_SQL = """
SELECT n_name,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(
           -- portable finite filter (fuzz wave-3 batch 3): abs(x) <= DBL_MAX
           -- is FALSE for NaN and ±Inf in BOTH engines (Spark sorts NaN
           -- greatest; DuckDB total order), so non-finite balances are
           -- missing on both sides without an engine-specific isfinite()
           CASE WHEN abs(c_acctbal) <= 1.7976931348623157e308
                THEN c_acctbal END
         AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
GROUP BY n_name
"""


def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, PORTABLE_DEMO_SQL)


QUERIES = {"sql_interface": q_sql_interface}
ORACLES = {"sql_interface": PORTABLE_DEMO_SQL}
