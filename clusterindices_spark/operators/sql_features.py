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

from clusterindices_spark.functions.aggregates import finite_or_null

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
    load_table(spark, sf_dir, "orders").withColumn("o_totalprice", finite_or_null("o_totalprice")).createOrReplaceTempView("orders")
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


def q_scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (new in Spark 4): case-insensitive equality and
    DISTINCT under ``COLLATE UTF8_LCASE``, exercised against a derived
    mixed-case column (the fixture is single-case, so the case noise is
    planted deterministically by key parity). The oracle lowers the same
    strings — collation semantics expressed portably. Scan-shaped."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_coll"
    )
    return spark.sql(
        """
        WITH t AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                      ELSE lower(c_mktsegment) END AS seg
          FROM customer_coll
        )
        SELECT COUNT(*) AS n,
               COUNT(DISTINCT seg) AS n_case_variants,
               COUNT(DISTINCT seg COLLATE UTF8_LCASE) AS n_ci_segments,
               SUM(CASE WHEN seg COLLATE UTF8_LCASE = 'Automobile'
                        THEN 1 ELSE 0 END) AS n_auto_ci
        FROM t
        """
    )


def q_sql_udf_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDF (CREATE FUNCTION ... RETURN expr, new in
    Spark 4): the function body is INLINED by Catalyst — unlike a Python
    UDF it costs nothing and stays inside whole-stage codegen; this is the
    sanctioned way to share scalar business logic across queries. The
    oracle inlines the same expression by hand."""
    load_table(spark, sf_dir, "lineitem").withColumn("l_extendedprice", finite_or_null("l_extendedprice")).withColumn("l_discount", finite_or_null("l_discount")).createOrReplaceTempView(
        "lineitem_udf"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p >= 50000 THEN 'high'
                    WHEN p >= 20000 THEN 'mid' ELSE 'low' END
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               price_tier(disc_price(l_extendedprice, l_discount)) AS tier,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
        FROM lineitem_udf
        GROUP BY l_returnflag, price_tier(disc_price(l_extendedprice, l_discount))
        """
    )


def q_sql_session_vars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables + EXECUTE IMMEDIATE (new in Spark 4): DECLARE /
    SET VAR drive a parameterized query through the ``USING`` binding —
    the dynamic-SQL surface migrating stored-procedure workloads expect.
    The oracle inlines the same constants."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_var")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_cutoff DOUBLE DEFAULT 0.0"
    )
    spark.sql("SET VAR price_cutoff = 400000.0")
    spark.sql("DECLARE OR REPLACE VARIABLE status_f STRING DEFAULT 'F'")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderstatus, COUNT(*) AS n,
                  ROUND(MIN(o_totalprice), 6) AS min_price
           FROM orders_var WHERE o_totalprice > ? AND o_orderstatus <> ?
           GROUP BY o_orderstatus'
          USING price_cutoff, status_f
        """
    )


def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (|>, new in Spark 4): the GoogleSQL-style linear
    query form — FROM |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY — that
    reads top-to-bottom instead of inside-out. Same Catalyst plan as the
    ANSI equivalent (the oracle IS that equivalent, so the gate pins the
    two forms produce identical results). Scan + one partial-agg shuffle."""
    load_table(spark, sf_dir, "orders").withColumn("o_totalprice", finite_or_null("o_totalprice")).createOrReplaceTempView("orders_pipe")
    return spark.sql(
        """
        FROM orders_pipe
        |> WHERE o_orderstatus <> 'P'
        |> EXTEND CAST(o_totalprice AS DECIMAL(18,6)) AS p
        |> AGGREGATE COUNT(*) AS n,
                     ROUND(CAST(SUM(p) AS DOUBLE), 6) AS revenue
           GROUP BY o_orderpriority
        """
    )


def q_scalar_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic surface: day offsets, calendar-month adds
    (with the end-of-month clamp both engines share), last_day, quarter,
    day-of-year, and day distance to a fixed horizon — the datetime
    toolkit migrating ETL expects. Pure scan-side expressions."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date(F.col("o_orderdate"))
    return o.select(
        "o_orderkey",
        d.alias("order_day"),
        F.date_add(d, 30).alias("plus_30d"),
        F.add_months(d, 2).alias("plus_2mo"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.datediff(F.lit("2002-01-01").cast("date"), d)
        .cast("int")
        .alias("days_to_2002"),
    )


def q_scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface (web-corpus pipelines route/filter/dedup by
    host and path constantly): construct a deterministic URL per document
    and decompose it with Spark's parse_url (HOST / PATH / QUERY-param).
    The oracle re-extracts the same parts with anchored regexes — a
    parse_url semantics change would break the hash. Scan-shaped."""
    d = load_table(spark, sf_dir, "documents")
    # F.concat (not concat_ws): a NULL source/lang yields a NULL url in
    # both engines — concat_ws SKIPS nulls and built phantom URLs from
    # docs with no source (r9 hostile edge); oracle uses || which
    # NULL-propagates identically
    # NULLIF('') like NULL: an empty source builds 'https://.example.com'
    # whose host is an invalid label — Spark's parse_url answers NULL
    # while a regex happily extracts it; defining empty-as-missing keeps
    # the engines identical (r9 hostile edge)
    # URL-safe charset guard, shared with the oracle: a source like
    # 'weird source' (embedded space) builds an INVALID url — Spark's
    # parse_url hard-errors under ANSI while a regex extracts happily
    # (fuzz gate seed 101001). Components outside [A-Za-z0-9._~-]+ are
    # treated as missing → NULL url in both engines; try_parse_url
    # backstops anything a future input class sneaks through.
    # \A...\z, not ^...$: Java's $ matches before a final newline, so a
    # source like 'abc\n' would pass this gate Spark-side and build a URL
    # the RE2-semantics oracle rejects (r13 advice — same hazard class as
    # the scalar_json integer gate)
    safe = r"\A[A-Za-z0-9._~-]+\z"
    src = F.when(F.col("source").rlike(safe), F.col("source"))
    lng = F.when(F.col("lang").rlike(safe), F.col("lang"))
    url = F.concat(
        F.lit("https://"),
        src,
        F.lit(".example.com/"),
        lng,
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        (F.col("doc_id") % 7).cast("string"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.try_parse_url(url, F.lit("HOST")).alias("host"),
        F.try_parse_url(url, F.lit("PATH")).alias("path"),
        F.try_parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )


IP_PLANE = 4_294_967_296  # 2^32
IP_HASH_MOD = 9_999_991
IP_HASH_A = 2_654_435_761


def q_scalar_ipv4_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 toolkit (web-log pipelines bucket/filter by address space
    constantly): deterministic hash-derived 32-bit addresses are rendered
    dotted-quad (ntoa: shift+mask), PARSED BACK from the string (aton:
    split + positional arithmetic — the roundtrip column proves both
    directions agree bit-exactly), bucketed to their /16 CIDR, and
    flagged for the RFC-1918 private ranges. Pure scan-side integer/string
    arithmetic, zero exchanges."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    h = (
        (F.col("doc_id") % IP_HASH_MOD) * IP_HASH_A + 5
    ) % IP_PLANE
    o = [
        F.shiftright(F.col("ip_int"), s).bitwiseAND(F.lit(255))
        for s in (24, 16, 8, 0)
    ]
    ip = F.concat_ws(".", *[x.cast("string") for x in o])
    parts = F.split(F.col("ip"), r"\.")
    back = (
        F.get(parts, 0).cast("bigint") * 16_777_216
        + F.get(parts, 1).cast("bigint") * 65_536
        + F.get(parts, 2).cast("bigint") * 256
        + F.get(parts, 3).cast("bigint")
    )
    is_private = (
        (o[0] == 10)
        | ((o[0] == 172) & (o[1] >= 16) & (o[1] <= 31))
        | ((o[0] == 192) & (o[1] == 168))
    )
    return (
        d.select("doc_id", h.alias("ip_int"))
        .select(
            "doc_id",
            "ip_int",
            ip.alias("ip"),
            F.concat_ws(
                ".", o[0].cast("string"), o[1].cast("string"), F.lit("0.0/16")
            ).alias("cidr16"),
            is_private.alias("is_private"),
        )
        .select(
            "doc_id",
            "ip_int",
            "ip",
            "cidr16",
            "is_private",
            back.alias("ip_roundtrip"),
        )
    )


QUERIES = {
    "scalar_ipv4_cidr": q_scalar_ipv4_cidr,
    "scalar_url_parse": q_scalar_url_parse,
    "sql_pipe_syntax": q_sql_pipe_syntax,
    "scalar_interval_arith": q_scalar_interval_arith,
    "sql_recursive_months": q_sql_recursive_months,
    "scalar_variant": q_scalar_variant,
    "scalar_collation": q_scalar_collation,
    "sql_udf_inline": q_sql_udf_inline,
    "sql_session_vars": q_sql_session_vars,
}

ORACLES = {
    "scalar_ipv4_cidr": f"""
WITH d AS (
  SELECT doc_id,
         ((doc_id % {IP_HASH_MOD}) * {IP_HASH_A} + 5) % {IP_PLANE} AS ip_int
  FROM documents
),
o AS (
  SELECT doc_id, ip_int,
         (ip_int >> 24) & 255 AS o1, (ip_int >> 16) & 255 AS o2,
         (ip_int >> 8) & 255 AS o3, ip_int & 255 AS o4
  FROM d
),
s AS (
  SELECT doc_id, ip_int, o1, o2,
         o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip
  FROM o
)
SELECT doc_id,
       CAST(ip_int AS BIGINT) AS ip_int,
       ip,
       o1 || '.' || o2 || '.0.0/16' AS cidr16,
       (o1 = 10) OR (o1 = 172 AND o2 >= 16 AND o2 <= 31)
         OR (o1 = 192 AND o2 = 168) AS is_private,
       CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_roundtrip
FROM s
""",
    "scalar_url_parse": """
WITH u AS (
  -- URL-safe charset guard + -? in the ref regex: mirrors the Spark
  -- side's invalid-component-as-NULL contract and negative doc_ids
  SELECT doc_id,
         'https://'
           || CASE WHEN regexp_matches(source, '^[A-Za-z0-9._~-]+$')
                   THEN source END
           || '.example.com/'
           || CASE WHEN regexp_matches(lang, '^[A-Za-z0-9._~-]+$')
                   THEN lang END
           || '/doc/'
           || CAST(doc_id AS VARCHAR) || '?ref='
           || CAST(doc_id % 7 AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, 'https://([^/]+)', 1) AS host,
       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, 'ref=(-?[0-9]+)', 1) AS ref
FROM u
""",
    "sql_pipe_syntax": """
SELECT o_orderpriority,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS revenue
FROM orders WHERE o_orderstatus <> 'P'
GROUP BY o_orderpriority
""",
    "scalar_interval_arith": """
WITH d AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dd FROM orders)
SELECT o_orderkey,
       dd AS order_day,
       dd + 30 AS plus_30d,
       CAST(dd + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
       last_day(dd) AS month_end,
       CAST(quarter(dd) AS INT) AS qtr,
       CAST(dayofyear(dd) AS INT) AS doy,
       CAST(date_diff('day', dd, DATE '2002-01-01') AS INT) AS days_to_2002
FROM d
""",
    "scalar_collation": """
WITH t AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg
  FROM customer
)
SELECT COUNT(*) AS n,
       COUNT(DISTINCT seg) AS n_case_variants,
       COUNT(DISTINCT lower(seg)) AS n_ci_segments,
       CAST(SUM(CASE WHEN lower(seg) = lower('Automobile')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_auto_ci
FROM t
""",
    "sql_udf_inline": """
WITH l AS (
  SELECT l_returnflag,
         l_extendedprice * (1 - l_discount) AS dp
  FROM lineitem
)
SELECT l_returnflag,
       CASE WHEN dp >= 50000 THEN 'high'
            WHEN dp >= 20000 THEN 'mid' ELSE 'low' END AS tier,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(dp AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
FROM l
GROUP BY l_returnflag, CASE WHEN dp >= 50000 THEN 'high'
                            WHEN dp >= 20000 THEN 'mid' ELSE 'low' END
""",
    "sql_session_vars": """
SELECT o_orderstatus, COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 6) AS min_price
FROM orders WHERE o_totalprice > 400000.0 AND o_orderstatus <> 'F'
GROUP BY o_orderstatus
""",
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

# fuzz wave-3 non-finite policy (see operators/analytics.py tail note):
# quantized/decimal measure paths exclude NaN/Inf like NULLs, in both
# engines, via finite_or_null on the Spark side and the * REPLACE
# isfinite rewrite here.
ORACLES["sql_udf_inline"] = ORACLES["sql_udf_inline"].replace(
    "FROM lineitem", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END) AS l_extendedprice, (CASE WHEN isfinite(l_discount) THEN l_discount END) AS l_discount) FROM lineitem)")

# fuzz wave-3 non-finite policy (see operators/analytics.py tail note):
# o_totalprice consumers below quantize/decimal-sum the measure; both
# engines exclude NaN/Inf like NULLs.
ORACLES["sql_pipe_syntax"] = ORACLES["sql_pipe_syntax"].replace(
    "FROM orders", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(o_totalprice) THEN o_totalprice END) AS o_totalprice) FROM orders)")
ORACLES["sql_recursive_months"] = ORACLES["sql_recursive_months"].replace(
    "LEFT JOIN orders",
    "LEFT JOIN (SELECT * REPLACE ((CASE WHEN isfinite(o_totalprice) "
    "THEN o_totalprice END) AS o_totalprice) FROM orders) orders")
