"""Spark 4 SQL feature surface (round-3b): recursive CTEs and VARIANT.

Two capabilities a reference user migrating real SQL workloads expects:

- ``sql_recursive_months``: WITH RECURSIVE (new in Spark 4) driving a
  calendar-ladder query — the canonical DAG recursion. Spark 4.1 restricts
  the recursive member to UNION ALL (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE
  is raised for UNION-distinct), so cyclic fixpoints like transitive
  closure stay on the DataFrame iteration tier (dedup.connected_components);
  the ladder is acyclic and terminates by its WHERE bound. Anchors are the
  fixture's fixed o_orderdate span (1995-01 .. 2001-08, identical at every
  SF) so the text is self-contained for the oracle.
- ``scalar_variant``: the VARIANT semi-structured type (new in Spark 4):
  rows are serialized to JSON, parsed to VARIANT, and field-extracted back
  with typed ``variant_get`` paths. The DuckDB oracle is the identity
  projection of the same columns — the check pins that the
  to_json → parse_json → variant_get roundtrip is value- AND type-exact
  (BIGINT stays BIGINT, DOUBLE stays DOUBLE under the driver's type-strict
  hash).

Scale posture: both are scan-shaped. The month ladder is an 80-row driver
table joined to the fact scan (broadcast — Catalyst sees the tiny side);
variant work is per-row expression evaluation, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clusterindices_spark.sources.fixtures import load_table

_RECURSIVE_MONTHS_SPARK = """
WITH RECURSIVE months(m) AS (
  SELECT DATE'1995-01-01' AS m
  UNION ALL
  SELECT add_months(m, 1) FROM months WHERE m < DATE'2001-08-01'
)
SELECT m AS month_start,
       COUNT(o_orderkey) AS n_orders,
       ROUND(CAST(COALESCE(
         SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE), 6)
         AS total_price
FROM months
LEFT JOIN orders ON CAST(date_trunc('MONTH', o_orderdate) AS DATE) = m
GROUP BY m
"""


def q_sql_recursive_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_MONTHS_SPARK)


def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    j = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("s"),
            F.col("o_totalprice").alias("p"),
            F.struct(F.col("o_orderpriority").alias("pri")).alias("meta"),
        )
    )
    v = F.parse_json(j)
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.s", "string").alias("status"),
        F.variant_get(v, "$.p", "double").alias("price"),
        F.variant_get(v, "$.meta.pri", "string").alias("priority"),
        # absent path → NULL (try-semantics of variant_get on missing keys)
        F.variant_get(v, "$.missing", "bigint").alias("absent"),
    )


QUERIES = {
    "sql_recursive_months": q_sql_recursive_months,
    "scalar_variant": q_scalar_variant,
}

ORACLES = {
    "sql_recursive_months": """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1995-01-01' AS m
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months WHERE m < DATE '2001-08-01'
)
SELECT m AS month_start,
       COUNT(o_orderkey) AS n_orders,
       ROUND(CAST(COALESCE(
         SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE), 6)
         AS total_price
FROM months
LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
GROUP BY m
""",
    "scalar_variant": """
SELECT o_orderkey,
       o_orderstatus AS status,
       o_totalprice AS price,
       o_orderpriority AS priority,
       CAST(NULL AS BIGINT) AS absent
FROM orders
""",
}
