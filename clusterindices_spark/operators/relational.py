"""General relational/dataflow surface (SURVEY.md §2B) over the TPC-H-ish
fixtures. Every operator is plain DataFrame API — Catalyst provides pushdown,
pruning, join selection, partial aggregation, and codegen; nothing here needs
custom planning.

Scale posture per operator is noted inline; the common rules:
- small dimension sides are broadcast explicitly (`F.broadcast`);
- large⋈large joins shuffle on their equi keys and rely on AQE for skew;
- non-equi joins carry an equi component (user_id) so Spark picks a
  partitioned join, never a pure cartesian;
- double sums over many rows use the decimal "exact sum" pattern
  (functions/aggregates.py) so results are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clusterindices_spark.functions.aggregates import (
    exact_avg,
    exact_sum,
    sql_exact_avg,
    sql_exact_sum,
)
from clusterindices_spark.functions.text import fold_upper
from clusterindices_spark.functions.aggregates import finite_or_null
from clusterindices_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# scan / filter
# ---------------------------------------------------------------------------


def q_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate that must reach the parquet scan (PushedFilters
    + pruned ReadSchema in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "A"))
        .select(
            "l_orderkey",
            "l_partkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "net_price"
            ),
        )
    )


def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cond = (
        (
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_acctbal").between(1000, 5000)
        )
        | F.col("c_name").like("%42%")
        | (F.col("c_mktsegment").eqNullSafe("AUTOMOBILE") & (F.col("c_acctbal") < 0))
    )
    return c.where(cond).select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 6).alias("acctbal")
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim: part is broadcast — no shuffle of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large ⋈ large on the orderkey: shuffles both sides on the join key
    (AQE picks SMJ/shuffled-hash); at 100 TB co-locate via bucketing on
    orderkey to eliminate this shuffle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    on = c.c_custkey == o.o_custkey
    semi = (
        c.join(o, on, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("kind", F.lit("has_f_order"))
    )
    anti = (
        c.join(o, on, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("kind", F.lit("no_f_order"))
    )
    return semi.unionByName(anti)


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range self-join: pairs of events from the same user within
    (t, t+5min]. The equi component (user_id) keeps it a partitioned join;
    at 100 TB additionally bucket by coarse time so a hot user cannot skew a
    single task."""
    e = load_table(spark, sf_dir, "events")
    a = e.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("a_type"),
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    cond = (
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a_type").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark op — SURVEY.md §2B): for each event, the
    latest order of that customer at or before the event time.

    Implemented as join + max_by hash aggregation rather than the classic
    join + row_number window: the agg replaces the window's per-partition
    sort with a partial+final hash agg (map-side combine shrinks the shuffle
    to one row per event per mapper) — measured 1.8× faster at sf0.1 with
    bit-identical results. The struct ordering (o_orderdate, o_orderkey)
    reproduces the window's DESC/DESC tie-break; the DuckDB oracle keeps the
    windowed formulation, which pins the same semantics."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    j = e.join(
        o,
        (e.user_id == o.o_custkey) & (o.o_orderdate <= e.ts),
        "left",
    )
    return (
        j.groupBy("event_id")
        .agg(
            F.max_by(
                F.struct("o_orderkey", "o_totalprice"),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("s")
        )
        .select(
            "event_id",
            F.col("s.o_orderkey").alias("o_orderkey"),
            F.round("s.o_totalprice", 6).alias("price"),
        )
    )


def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join WITH tolerance (pandas merge_asof
    direction='forward'): for each event, the customer's EARLIEST order
    strictly after the event but within 30 days — the "next action after
    exposure" attribution shape. Same join + min_by hash-agg plan as
    q_join_asof (map-side combine instead of a window sort); the
    tolerance bound keeps the join output finite per event at any scale.
    Ties break on (o_orderdate, o_orderkey) ascending in both engines."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    j = e.join(
        o,
        (e.user_id == o.o_custkey)
        & (o.o_orderdate > e.ts)
        & (o.o_orderdate <= e.ts + F.expr("INTERVAL 30 DAYS")),
        "left",
    )
    return (
        j.groupBy("event_id")
        .agg(
            F.min_by(
                F.struct("o_orderkey", "o_totalprice"),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("s")
        )
        .select(
            "event_id",
            F.col("s.o_orderkey").alias("o_orderkey"),
            F.round("s.o_totalprice", 6).alias("price"),
        )
    )


def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest' with
    tolerance): for each PURCHASE event, the same user's click CLOSEST in
    time — before or after — within ±1 day (the two-sided attribution
    shape; completes the backward/forward as-of family). Same join +
    min_by hash-agg plan as its siblings; the tolerance bounds per-
    purchase join output at any scale. Distance is exact integer
    milliseconds (the ns-parquet/µs-Spark/ms oracle grain rule); ties at
    equal distance prefer the EARLIER click, then the lower event id —
    pinned identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_millis(F.col("ts")).alias("p_ms"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_millis(F.col("ts")).alias("c_ms"),
    )
    tol = 86_400_000
    dist = F.abs(F.col("c_ms") - F.col("p_ms"))
    j = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ms >= p.p_ms - F.lit(tol))
        & (c.c_ms <= p.p_ms + F.lit(tol)),
        "left",
    )
    return (
        j.groupBy("purchase_id")
        .agg(
            F.min_by(
                F.struct("click_id", dist.alias("d")),
                F.struct(dist.alias("d"), "c_ms", "click_id"),
            ).alias("s")
        )
        .select(
            "purchase_id",
            F.col("s.click_id").alias("click_id"),
            F.col("s.d").alias("dist_ms"),
        )
    )


def q_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregates: per-group conditional counts/sums
    without CASE noise — one scan, every FILTER folds into the same
    partial+final hash agg."""
    load_table(spark, sf_dir, "orders").withColumn("o_totalprice", finite_or_null("o_totalprice")).createOrReplaceTempView("orders_fc")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               ROUND(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                     FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE), 6)
                 AS open_revenue
        FROM orders_fc
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash agg, map-side combine over 6 groups."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        exact_sum("l_quantity", "sum_qty"),
        exact_sum("l_extendedprice", "sum_base_price"),
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"
        ),
        exact_avg("l_quantity", "avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum("c_acctbal", "sum_acctbal"),
        )
    )


def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches differ across engines by construction — rows-only check
    (SURVEY.md §2B)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# windows / topk / set ops
# ---------------------------------------------------------------------------


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer + lag/lead, explicit ROWS frame. The
    running sum uses the decimal pattern inside the frame so the cumulative
    value is exact at every row."""
    o = load_table(spark, sf_dir, "orders").withColumn("o_totalprice", finite_or_null("o_totalprice"))
    # asc_nulls_last: DuckDB window ORDER BY defaults NULLS LAST (r9)
    order_w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey"
    )
    frame_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(frame_w).cast(
                "double"
            ),
            6,
        ).alias("running_total"),
        F.round(F.lag("o_totalprice").over(order_w), 6).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(order_w), 6).alias("next_price"),
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Spark plans TakeOrderedAndProject (per-partition top-k,
    then driver merge: no full sort, no shuffle of the data)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 6).alias("price"))
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    rich = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    bldg = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        rich.unionAll(bldg).withColumn("op", F.lit("union_all"))
        .unionByName(rich.intersect(bldg).withColumn("op", F.lit("intersect")))
        .unionByName(rich.subtract(bldg).withColumn("op", F.lit("except_")))
    )


# ---------------------------------------------------------------------------
# scalar functions
# ---------------------------------------------------------------------------


def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("prefix"),
        # fold_upper, not raw upper: ICU uppercases 'ß' to 'SS' while
        # DuckDB's simple map gives 'ẞ' (fuzz gate seed 101001)
        fold_upper(F.col("p_name")).alias("up"),
        F.length("p_name").alias("len"),
        F.regexp_extract("p_name", r"([0-9]+)", 1).alias("digits"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_tok"),
        F.concat_ws("-", "p_brand", "p_type").alias("joined"),
    )


def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))
        ).alias("days_since"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("plus30"),
    )


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.round("l_extendedprice", 2).alias("r2"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("ab"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("p2"),
        # domain guards (r9 hostile edge): ln/sqrt of non-positive inputs
        # are NULL by contract in both engines — Spark's ln already returns
        # NULL there but sqrt gives NaN, and DuckDB ERRORS on both; the
        # CASE/WHEN guard makes the two engines identical
        F.round(
            F.when(F.col("l_extendedprice") >= 0, F.sqrt("l_extendedprice")),
            6,
        ).alias("sq"),
        F.round(
            F.when(F.col("l_extendedprice") > 0, F.log("l_extendedprice")), 6
        ).alias("lg"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        # integer div, not floor-of-double: bigint / is double division
        # and loses low bits past 2^53 (the agg_bitmap_distinct class)
        F.expr("l_orderkey div 7").alias("idiv"),
        (F.col("l_linenumber") % 3).alias("md"),
    )


def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(x).alias("n_dims"),
        F.round(F.get(x, 0), 6).alias("first_val"),
        F.round(F.array_max(x), 6).alias("max_val"),
        F.round(F.array_min(x), 6).alias("min_val"),
        F.round(
            F.aggregate(x, F.lit(0.0), lambda s, v: s + v * v), 6
        ).alias("sum_sq"),
        F.size(F.filter(x, lambda v: v > 0)).alias("n_pos"),
    )


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction with an integer-literal gate. The gate is the
    parity contract (fuzz wave-4 seed 104001): a non-numeric $.k (e.g. a
    JSON string value "é\\n\\t") made BOTH engines raise on the bare CAST,
    and bare TRY_CAST is no better — DuckDB coerces '2.9'→3, '-0.0'→0,
    '0x10'→16 where Spark try_cast answers NULL. Only values matching
    the integer-literal pattern are cast (try_cast still backstops int32
    overflow, which both engines NULL identically); everything else —
    floats, bools, quoted strings, nested JSON, Infinity — is NULL in
    both engines. The Spark pattern anchors with \\A...\\z (r13 advice):
    Java's $ matches BEFORE a final line terminator, so '123\\n' passed
    the ^...$ gate and cast to 123 while the oracle's RE2 $ (end-of-text
    only) answered NULL — \\A/\\z gives RE2 whole-string semantics in
    Java, covering \\r and Unicode terminators too.
    Malformed records are data, not errors: one bad props cell must not
    kill a corpus-scale scan."""
    e = load_table(spark, sf_dir, "events")
    s = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        F.when(
            s.rlike(r"\A[+-]?[0-9]+\z"), F.expr("try_cast(get_json_object(props, '$.k') as int)")
        ).alias("k"),
    )


QUERIES = {
    "scan_project_filter": q_scan_project_filter,
    "filter_predicates": q_filter_predicates,
    "join_broadcast": q_join_broadcast,
    "join_sortmerge": q_join_sortmerge,
    "join_semi_anti": q_join_semi_anti,
    "join_range": q_join_range,
    "join_asof": q_join_asof,
    "join_asof_forward": q_join_asof_forward,
    "join_asof_nearest": q_join_asof_nearest,
    "agg_filter_clause": q_agg_filter_clause,
    "agg_basic": q_agg_basic,
    "agg_rollup": q_agg_rollup,
    "agg_approx": q_agg_approx,
    "window_rank": q_window_rank,
    "window_frame": q_window_frame,
    "topk_orders": q_topk_orders,
    "set_ops": q_set_ops,
    "scalar_string": q_scalar_string,
    "scalar_datetime": q_scalar_datetime,
    "scalar_math": q_scalar_math,
    "scalar_array": q_scalar_array,
    "scalar_json": q_scalar_json,
}

# DuckDB reads events.ts as TIMESTAMP_NS; normalize to µs once so interval
# arithmetic and epoch_ms agree bit-for-bit with Spark's µs timestamps.
_EV = "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

# Jackson (Spark's JSON parser — get_json_object, from_json, AND
# try_parse_json) tolerates TRAILING GARBAGE: '{"k":1}trailing' parses as
# {"k":1}. DuckDB is RFC-strict (json_valid → false), and Spark has no
# UDF-free strict mode — so the oracle mirrors Jackson's
# first-complete-value semantics instead: if the full string is invalid,
# take the SHORTEST prefix that is valid JSON and ends with '}' (unique =
# the first complete object, incl. the '{"k":"}"}garbage' brace-in-string
# case — json_valid rejects every shorter cut). The O(L²) prefix scan runs
# only in the ELSE branch, i.e. only for full-string-INVALID props (fuzz
# wave-4 seed 104009 finding).
SQL_JSON_LENIENT = """CASE WHEN {p} IS NULL THEN NULL
  WHEN json_valid({p}) THEN {p}
  ELSE list_filter(list_transform(range(1, CAST(length({p}) AS BIGINT) + 1),
        i -> substr({p}, 1, CAST(i AS INT))),
        s -> json_valid(s) AND right(s, 1) = '}}')[1] END"""

ORACLES = {
    "scan_project_filter": """
SELECT l_orderkey, l_partkey,
       ROUND(l_extendedprice * (1 - l_discount), 6) AS net_price
FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'A'
""",
    "filter_predicates": """
SELECT c_custkey, c_name, c_mktsegment, ROUND(c_acctbal, 6) AS acctbal
FROM customer
WHERE (c_mktsegment IN ('BUILDING','MACHINERY') AND c_acctbal BETWEEN 1000 AND 5000)
   OR c_name LIKE '%42%'
   OR (c_mktsegment IS NOT DISTINCT FROM 'AUTOMOBILE' AND c_acctbal < 0)
""",
    "join_broadcast": f"""
SELECT p_brand,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
    "join_sortmerge": f"""
SELECT o_orderpriority,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
    "join_semi_anti": """
SELECT c_custkey, c_name, 'has_f_order' AS kind FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
UNION ALL
SELECT c_custkey, c_name, 'no_f_order' AS kind FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
    "join_range": f"""
SELECT a.event_type, COUNT(*) AS n_pairs
FROM {_EV} a JOIN {_EV} b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL '5 minutes'
GROUP BY a.event_type
""",
    "join_asof": f"""
SELECT event_id, o_orderkey, ROUND(o_totalprice, 6) AS price
FROM (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
         ) AS rn
  FROM {_EV} e LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
WHERE rn = 1
""",
    "join_asof_forward": f"""
SELECT event_id, o_orderkey, ROUND(o_totalprice, 6) AS price
FROM (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate ASC NULLS LAST, o.o_orderkey ASC NULLS LAST
         ) AS rn
  FROM {_EV} e LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate > e.ts
   AND o.o_orderdate <= e.ts + INTERVAL 30 DAY
)
WHERE rn = 1
""",
    "join_asof_nearest": f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS p_ms
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, user_id AS c_user,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS c_ms
  FROM events WHERE event_type = 'click'
)
SELECT purchase_id, click_id, dist_ms
FROM (
  SELECT p.purchase_id, c.click_id,
         abs(c.c_ms - p.p_ms) AS dist_ms,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY abs(c.c_ms - p.p_ms) ASC NULLS LAST,
                    c.c_ms ASC NULLS LAST, c.click_id ASC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN c
    ON p.user_id = c.c_user
   AND c.c_ms >= p.p_ms - 86400000
   AND c.c_ms <= p.p_ms + 86400000
)
WHERE rn = 1
""",
    "agg_filter_clause": """
SELECT o_orderpriority,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       ROUND(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE), 6)
         AS open_revenue
FROM orders
GROUP BY o_orderpriority
""",
    "agg_basic": f"""
SELECT l_returnflag, l_linestatus,
       {sql_exact_sum('l_quantity')} AS sum_qty,
       {sql_exact_sum('l_extendedprice')} AS sum_base_price,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_exact_avg('l_quantity')} AS avg_qty,
       COUNT(*) AS count_order,
       COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "agg_rollup": f"""
SELECT n_name, c_mktsegment,
       COUNT(*) AS n_customers,
       {sql_exact_sum('c_acctbal')} AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
""",
    # agg_approx: intentionally no oracle (sketches differ across engines)
    "window_rank": """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 6) AS price,
         row_number() OVER w AS rn,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
WHERE rn <= 3
""",
    "window_frame": """
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 6) AS running_total,
       ROUND(lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 6) AS prev_price,
       ROUND(lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 6) AS next_price
FROM orders
""",
    "topk_orders": """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 6) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    "set_ops": """
WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     bldg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT c_custkey, 'union_all' AS op FROM (SELECT * FROM rich UNION ALL SELECT * FROM bldg)
UNION ALL
SELECT c_custkey, 'intersect' AS op FROM (SELECT * FROM rich INTERSECT SELECT * FROM bldg)
UNION ALL
SELECT c_custkey, 'except_' AS op FROM (SELECT * FROM rich EXCEPT SELECT * FROM bldg)
""",
    "scalar_string": """
SELECT p_partkey,
       substr(p_name, 1, 8) AS prefix,
       upper(replace(p_name, 'ß', 'ss')) AS up,
       CAST(length(p_name) AS INT) AS len,
       regexp_extract(p_name, '([0-9]+)', 1) AS digits,
       string_split(p_name, ' ')[1] AS first_tok,
       concat_ws('-', p_brand, p_type) AS joined
FROM part
""",
    "scalar_datetime": """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
       CAST(o_orderdate AS DATE) + 30 AS plus30
FROM orders
""",
    "scalar_math": """
SELECT l_orderkey,
       ROUND(l_extendedprice, 2) AS r2,
       ROUND(abs(l_discount - 0.05), 6) AS ab,
       ROUND(pow(l_quantity, 2), 6) AS p2,
       ROUND(CASE WHEN l_extendedprice >= 0 THEN sqrt(l_extendedprice) END, 6) AS sq,
       ROUND(CASE WHEN l_extendedprice > 0 THEN ln(l_extendedprice) END, 6) AS lg,
       ROUND(exp(l_discount), 6) AS ex,
       CAST(l_orderkey // 7 AS BIGINT) AS idiv,
       l_linenumber % 3 AS md
FROM lineitem WHERE l_linenumber = 1
""",
    "scalar_array": """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS n_dims,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
       ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
       ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), v -> v * v)), 6) AS sum_sq,
       CAST(len(list_filter(embedding, v -> v > 0)) AS INT) AS n_pos
FROM embeddings
""",
    "scalar_json": f"""
-- integer-literal gate mirrors the Spark side (wave-4): bare CAST raises
-- on string-typed $.k in both engines, and bare TRY_CAST diverges (DuckDB
-- coerces '2.9'/'0x10'/'-0.0' where Spark NULLs); only ^[+-]?[0-9]+$
-- values cast, TRY_CAST backstops int32 overflow identically. The
-- lenient-prefix CTE mirrors Jackson's trailing-garbage tolerance (see
-- SQL_JSON_LENIENT).
WITH j AS (
  SELECT event_id, {SQL_JSON_LENIENT.format(p='props')} AS p FROM events
)
SELECT event_id,
       CASE WHEN p IS NOT NULL AND json_valid(p)
                 AND regexp_matches(
                     json_extract_string(p, '$.k'), '^[+-]?[0-9]+$')
            THEN TRY_CAST(json_extract_string(p, '$.k') AS INT) END AS k
FROM j
""",
}

# fuzz wave-3 non-finite policy (see operators/analytics.py tail note):
# o_totalprice consumers below quantize/decimal-sum the measure; both
# engines exclude NaN/Inf like NULLs.
ORACLES["agg_filter_clause"] = ORACLES["agg_filter_clause"].replace(
    "FROM orders", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(o_totalprice) THEN o_totalprice END) AS o_totalprice) FROM orders)")
ORACLES["window_frame"] = ORACLES["window_frame"].replace(
    "FROM orders", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(o_totalprice) THEN o_totalprice END) AS o_totalprice) FROM orders)")
