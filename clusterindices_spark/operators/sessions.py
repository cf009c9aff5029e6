"""Event-time windowing, batch form (SURVEY.md §2B streaming rows).

These are the oracle-checkable batch equivalents of the Structured Streaming
operators; clusterindices_spark/streaming/streams.py re-expresses the same
logic over readStream with watermarks (demo-only — streams can't be
oracle-hashed).

Timestamps are output as epoch milliseconds (unix_millis ↔ epoch_ms): the
events table is ns-precision parquet that Spark reads at µs; ms-grain output
is exact in both engines (FIXTURES.md).

Scale: tumbling/sliding aggs are single-shuffle hash aggs keyed on
(window, type) — low cardinality. Sessionization shuffles once on user_id
(the gaps-and-islands windows and the final groupBy share that partitioning,
so Catalyst plans ONE exchange), which is also how the streaming
session_window state is keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clusterindices_spark.functions.aggregates import (
    finite_or_null,
    SQL_ROUND6,
    exact_sum,
    round6_stable,
    sql_exact_sum,
)
from clusterindices_spark.sources.fixtures import load_table

SESSION_GAP_MIN = 30


def q_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", "sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 min — each event lands in 4 windows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
        )
    )


def sessionize(e: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gaps-and-islands sessionization: per user, a new session starts when
    the gap to the previous event EXCEEDS ``gap_min`` (strict >: pinned
    empirically against the native ``session_window`` twin, which MERGES an
    event arriving exactly gap after the previous one — its per-event range
    [ts, ts+gap] is end-inclusive for the overlap test; see
    tests/test_streaming.py boundary test). Millisecond arithmetic so both
    engines compare identical integers.

    NULL-ts events (r10 hostile edge): asc_nulls_last matches DuckDB's
    default — the row sorts LAST and joins the final session (its gap vs
    prev is NULL → not a new session in either engine); NULLS FIRST made
    it open a phantom session in Spark."""
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), "event_id"
    )
    ms = F.unix_millis("ts")
    prev_ms = F.lag(ms).over(w)
    new_sess = F.when(
        prev_ms.isNull() | ((ms - prev_ms) > gap_min * 60_000), 1
    ).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.withColumn("session_id", sess_id)


def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        sessionize(e)
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_millis(F.min("ts")).alias("session_start_ms"),
            F.count(F.lit(1)).alias("n_events"),
            ((F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))) / 1000.0).alias(
                "duration_s"
            ),
            exact_sum("value", "sum_value"),
        )
        .select(
            "user_id",
            "session_id",
            "session_start_ms",
            "n_events",
            F.round("duration_s", 3).alias("duration_s"),
            "sum_value",
        )
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first reduction by SEMANTIC key: the earliest event per
    (user_id, event_type), deterministic (ts, event_id) tie-break — the
    batch shape of keyed stateful dedup. NOT the same operation as
    streams.dedup_stream, which is delivery dedup on event_id
    (dropDuplicatesWithinWatermark — collapses at-least-once redelivery of
    the SAME event; this collapses distinct events sharing a key)."""
    e = load_table(spark, sf_dir, "events")
    # asc_nulls_last: "earliest" must not elect a NULL-ts event (DuckDB
    # sorts it last; Spark's NULLS FIRST made it win rn=1 — r10 edge)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc_nulls_last("ts"), "event_id"
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.unix_millis("ts").alias("first_ts_ms"),
        )
    )


ATTRIBUTION_HORIZON_MIN = 5


def q_stream_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream attribution join
    (streaming/streams.click_purchase_join_stream): purchases attributed
    to a same-user click within the preceding 5 minutes. The oracle-facing
    twin compares at millisecond grain on both sides — raw timestamp
    comparisons would couple the check to the ns-vs-µs parquet mismatch
    (TESTDATA.md). Plan: one user_id-keyed shuffle; the time band is a
    post-join range predicate (streaming runs the same join with
    watermark-bounded state)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.unix_millis("ts").alias("c_ms"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.unix_millis("ts").alias("p_ms"),
        F.col("value").alias("p_value"),
    )
    horizon_ms = ATTRIBUTION_HORIZON_MIN * 60_000
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ms") > F.col("c_ms"))
        & (F.col("p_ms") <= F.col("c_ms") + F.lit(horizon_ms)),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        F.col("p_ms").alias("purchase_ts_ms"),
        round6_stable(F.col("p_value")).alias("p_value"),
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user advances a
    stage only with a strictly-later event of the next type. Three same-key
    (user_id) aggregations chained by joins — the hash partitioning is
    established once and reused by every stage (exchange reuse), so the
    funnel costs ~one wide shuffle at any scale."""
    return funnel_of(load_table(spark, sf_dir, "events"))


def funnel_of(e: DataFrame) -> DataFrame:
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    pur = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(pur.agg(F.count(F.lit(1)).alias("n_purchase")))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            # integer-ratio scores CAN land exactly on .xxxxxx5 — the
            # half-boundary class round6_stable exists for
            round6_stable(
                F.col("n_click") / F.nullif(F.col("n_view"), F.lit(0))
            ).alias("view_to_click"),
            round6_stable(
                F.col("n_purchase") / F.nullif(F.col("n_click"), F.lit(0))
            ).alias("click_to_purchase"),
        )
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of a user's
    first event; a user counts as retained in week k if active k weeks
    later (k ≤ 3). Two user_id-keyed aggs + one distinct count per
    (cohort, k) — all map-side-combinable."""
    return retention_of(load_table(spark, sf_dir, "events"))


def retention_of(e: DataFrame) -> DataFrame:
    first = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
    act = (
        e.join(first, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", "t0").cast("date").alias("cohort"),
            F.expr(
                "CAST(datediff(date_trunc('week', ts), date_trunc('week', t0)) DIV 7 AS INT)"
            ).alias("k"),
        )
        .where(F.col("k") <= 3)
    )
    return act.groupBy("cohort", "k").agg(
        F.countDistinct("user_id").alias("n_users")
    )



LTV_MAX_AGE_DAYS = 13


def q_events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort LTV curve: cohort = a user's first-event DAY; for each
    (cohort, age-in-days ≤ 13) the purchase revenue that day and the
    CUMULATIVE revenue per cohort user — the revenue companion to
    events_retention's activity curve. All money flows through the exact
    decimal-sum pattern (the running sum is a window over per-day decimal
    sums, so it is order-free), divided by cohort size only at the end.

    Scale: two user-keyed aggs (first-day, cohort size), one
    (cohort, age) agg with map-side combine, and a window over ≤14 rows
    per cohort."""
    from pyspark.sql import Window

    from clusterindices_spark.functions.aggregates import round6_stable

    e = load_table(spark, sf_dir, "events").withColumn("value", finite_or_null("value"))
    first = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort")
    )
    size = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    purch = (
        e.where(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .select(
            "cohort",
            F.datediff(F.col("ts").cast("date"), F.col("cohort")).alias("age"),
            "value",
        )
        .where(F.col("age") <= LTV_MAX_AGE_DAYS)
    )
    rev = purch.groupBy("cohort", "age").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("rev_d")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(size, "cohort")
        .select(
            "cohort",
            F.col("age").cast("int").alias("age"),
            F.col("cohort_users").cast("bigint").alias("cohort_users"),
            F.round(F.col("rev_d").cast("double"), 6).alias("revenue"),
            round6_stable(
                F.sum("rev_d").over(w).cast("double")
                / F.col("cohort_users").cast("double")
            ).alias("cum_ltv_per_user"),
        )
    )


def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How FAST users convert, per funnel transition: n, median, p90 and
    mean latency (ms) for view→click and click→purchase over the same
    strictly-ordered first-event stage times the funnel counts. Latencies
    are integer milliseconds (unix_millis diffs — ns↔µs parquet grain
    never moves an ms), so both engines feed their exact interpolating
    percentile identical integers (the events_outliers_mad convention).

    Scale: the three user-keyed stage aggs reuse one hash partitioning
    (exchange reuse, as the funnel); the percentile is one
    ObjectHashAggregate over converted users only."""
    from clusterindices_spark.functions.aggregates import round6_stable

    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.min("t_view").alias("t_view"))
    )
    pur = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("t_purchase"),
            F.min("t_click").alias("t_click2"),
        )
    )

    def _stats(df, lat_col, name):
        lat = df.select(lat_col.alias("lat"))
        return lat.agg(
            F.lit(name).alias("transition"),
            F.count(F.lit(1)).alias("n"),
            round6_stable(F.percentile("lat", F.lit(0.5))).alias("med_ms"),
            round6_stable(F.percentile("lat", F.lit(0.9))).alias("p90_ms"),
            round6_stable(F.avg("lat")).alias("mean_ms"),
        )

    vc = _stats(
        c,
        F.unix_millis("t_click") - F.unix_millis("t_view"),
        "view_to_click",
    )
    cp = _stats(
        pur,
        F.unix_millis("t_purchase") - F.unix_millis("t_click2"),
        "click_to_purchase",
    )
    return vc.unionByName(cp)


def q_events_streak_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, reported as the
    distribution (streak_len, n_users, user_share) — the classic
    gaps-and-islands shape on the DAY grain: a user's distinct active days,
    grouped into islands by the constant ``day − row_number()`` (consecutive
    days share it), longest island per user, then a tiny histogram.

    Day ids are integer UTC epoch-days (``unix_millis // 86 400 000`` ↔
    DuckDB ``epoch_ms // 86400000``) so both engines bucket identical
    integers — no timezone/date-cast semantics in the hash.

    Scale: the (user, day) distinct agg map-side combines to ≤ users×days
    rows; the island window partitions per user over ≤365 rows; the two
    downstream aggs reuse the user_id hash partitioning (one exchange
    beyond the distinct). Nothing is corpus-scale past the first agg.
    """
    e = load_table(spark, sf_dir, "events")
    day = (F.unix_millis("ts") / F.lit(86_400_000)).cast("bigint")
    ud = e.groupBy("user_id", day.alias("day")).agg(F.lit(1).alias("_one"))
    w = Window.partitionBy("user_id").orderBy("day")
    grp = F.col("day") - F.row_number().over(w)
    streaks = (
        ud.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("max_streak"))
    )
    total = streaks.count()
    return (
        streaks.groupBy("max_streak")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("max_streak").alias("streak_len"),
            "n_users",
            round6_stable(F.col("n_users") / F.lit(float(total))).alias(
                "user_share"
            ),
        )
    )


QUERIES = {
    "events_streak_lengths": q_events_streak_lengths,
    "events_cohort_ltv": q_events_cohort_ltv,
    "events_funnel_latency": q_events_funnel_latency,
    "stream_tumbling_agg": q_stream_tumbling_agg,
    "stream_sliding_agg": q_stream_sliding_agg,
    "stream_session_windows": q_stream_session_windows,
    "stream_dedup": q_stream_dedup,
    "stream_join_clicks": q_stream_join_clicks,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
}

_EV = "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"

ORACLES = {
    "events_streak_lengths": f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day
  FROM events
),
g AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM ud
),
s AS (
  SELECT user_id, COUNT(*) AS len FROM g GROUP BY user_id, grp
),
m AS (
  SELECT user_id, MAX(len) AS max_streak FROM s GROUP BY user_id
),
tot AS (SELECT COUNT(*) AS n FROM m)
SELECT CAST(max_streak AS BIGINT) AS streak_len,
       COUNT(*) AS n_users,
       {SQL_ROUND6.format(x="CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot)")}
         AS user_share
FROM m GROUP BY max_streak
""",
    "events_funnel_latency": f"""
WITH e AS (SELECT * FROM {_EV} AS t),
v AS (
  SELECT user_id, MIN(ts) AS t_view FROM e
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click, MIN(v.t_view) AS t_view
  FROM e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
pur AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase, MIN(c.t_click) AS t_click2
  FROM e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
),
vc AS (SELECT epoch_ms(t_click) - epoch_ms(t_view) AS lat FROM c),
cp AS (SELECT epoch_ms(t_purchase) - epoch_ms(t_click2) AS lat FROM pur)
SELECT 'view_to_click' AS transition, COUNT(*) AS n,
       (floor((quantile_cont(lat, 0.5)) * 1000000.0 + 0.5) / 1000000.0) AS med_ms,
       (floor((quantile_cont(lat, 0.9)) * 1000000.0 + 0.5) / 1000000.0) AS p90_ms,
       (floor((AVG(lat)) * 1000000.0 + 0.5) / 1000000.0) AS mean_ms
FROM vc
UNION ALL
SELECT 'click_to_purchase' AS transition, COUNT(*) AS n,
       (floor((quantile_cont(lat, 0.5)) * 1000000.0 + 0.5) / 1000000.0) AS med_ms,
       (floor((quantile_cont(lat, 0.9)) * 1000000.0 + 0.5) / 1000000.0) AS p90_ms,
       (floor((AVG(lat)) * 1000000.0 + 0.5) / 1000000.0) AS mean_ms
FROM cp
""",
    "events_cohort_ltv": f"""
WITH e AS (SELECT * FROM {_EV} AS t),
first AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort FROM e GROUP BY user_id
),
size_ AS (
  SELECT cohort, COUNT(*) AS cohort_users FROM first GROUP BY cohort
),
purch AS (
  SELECT f.cohort, datediff('day', f.cohort, CAST(e.ts AS DATE)) AS age, e.value
  FROM e JOIN first f USING (user_id)
  WHERE e.event_type = 'purchase'
    AND datediff('day', f.cohort, CAST(e.ts AS DATE)) <= {LTV_MAX_AGE_DAYS}
),
rev AS (
  SELECT cohort, age, SUM(CAST(value AS DECIMAL(18,6))) AS rev_d
  FROM purch GROUP BY cohort, age
)
SELECT r.cohort, CAST(r.age AS INT) AS age,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       ROUND(CAST(r.rev_d AS DOUBLE), 6) AS revenue,
       (floor((CAST(SUM(r.rev_d) OVER (PARTITION BY r.cohort ORDER BY r.age ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / s.cohort_users) * 1000000.0 + 0.5) / 1000000.0) AS cum_ltv_per_user
FROM rev r JOIN size_ s USING (cohort)
""",
    "stream_join_clicks": f"""
WITH c AS (
  SELECT user_id AS c_user, event_id AS click_id, epoch_ms(ts) AS c_ms
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id AS p_user, event_id AS purchase_id, epoch_ms(ts) AS p_ms,
         value AS p_value
  FROM events WHERE event_type = 'purchase'
)
SELECT click_id, purchase_id, c_user AS user_id, p_ms AS purchase_ts_ms,
       {SQL_ROUND6.format(x='p_value')} AS p_value
FROM c JOIN p ON c_user = p_user
  AND p_ms > c_ms AND p_ms <= c_ms + {ATTRIBUTION_HORIZON_MIN * 60_000}
""",
    "events_funnel": f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM {_EV} WHERE event_type = 'view'
  GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM {_EV} e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM {_EV} e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase,
       {SQL_ROUND6.format(x='(SELECT COUNT(*) FROM c) / NULLIF((SELECT COUNT(*) FROM v), 0)')}
         AS view_to_click,
       {SQL_ROUND6.format(x='(SELECT COUNT(*) FROM p) / NULLIF((SELECT COUNT(*) FROM c), 0)')}
         AS click_to_purchase
""",
    "events_retention": f"""
WITH first AS (
  SELECT user_id, MIN(ts) AS t0 FROM {_EV} GROUP BY user_id
),
act AS (
  SELECT e.user_id,
         CAST(date_trunc('week', f.t0) AS DATE) AS cohort,
         CAST(date_diff('day', date_trunc('week', f.t0), date_trunc('week', e.ts)) // 7 AS INT) AS k
  FROM {_EV} e JOIN first f USING (user_id)
)
SELECT cohort, k, COUNT(DISTINCT user_id) AS n_users
FROM act WHERE k <= 3
GROUP BY cohort, k
""",
    "stream_tumbling_agg": f"""
SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
       event_type,
       COUNT(*) AS n,
       {sql_exact_sum('value')} AS sum_value
FROM {_EV}
WHERE ts IS NOT NULL  -- event-time semantics: Spark's window() drops
                      -- rows without event time (r9 hostile edge)
GROUP BY 1, 2
""",
    "stream_sliding_agg": f"""
SELECT epoch_ms(time_bucket(INTERVAL '15 minutes', ts) - o * INTERVAL '15 minutes') AS window_start_ms,
       event_type,
       COUNT(*) AS n
FROM {_EV}, (SELECT unnest([0, 1, 2, 3]) AS o)
WHERE ts IS NOT NULL  -- event-time semantics (see tumbling twin)
GROUP BY 1, 2
""",
    "stream_session_windows": f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {SESSION_GAP_MIN} * 60000
              THEN 1 ELSE 0 END AS new_sess
  FROM {_EV}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       epoch_ms(MIN(ts)) AS session_start_ms,
       COUNT(*) AS n_events,
       ROUND((epoch_ms(MAX(ts)) - epoch_ms(MIN(ts))) / 1000.0, 3) AS duration_s,
       {sql_exact_sum('value')} AS sum_value
FROM sess
GROUP BY user_id, session_id
""",
    "stream_dedup": f"""
SELECT user_id, event_type, event_id AS first_event_id, epoch_ms(ts) AS first_ts_ms
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts, event_id
  ) AS rn
  FROM {_EV}
)
WHERE rn = 1
""",
}

# fuzz wave-3 non-finite policy (see operators/analytics.py tail note):
# quantized/decimal measure paths exclude NaN/Inf like NULLs, in both
# engines, via finite_or_null on the Spark side and the * REPLACE
# isfinite rewrite here.
ORACLES["events_cohort_ltv"] = ORACLES["events_cohort_ltv"].replace(
    "FROM events", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(value) THEN value END) AS value) FROM events)")
