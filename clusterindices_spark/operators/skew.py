"""Skew mitigation: salted joins (SURVEY.md §4.3 100 TB posture).

AQE's skew-join splitting handles most skew at runtime, but it only splits
the SHUFFLE side of a sort-merge join — a mid-size build side that is too
big to broadcast yet joins a pathologically hot key still stalls one task.
The classic fix: replicate the small side R times and scatter the big side's
hot rows across the R replicas with a deterministic salt, turning one
hot partition into R even ones.

Salt derivation is deterministic (xxhash64 of a row-unique column, mod R) —
no rand(): nondeterministic expressions break retry semantics (a re-run
task would re-salt differently) and spoil result reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with ``n_salts``-way salting.

    ``salt_from``: a column of ``big`` that varies within a join key (any
    row-unique id) — hashed to spread a hot key's rows across replicas.
    The join output equals ``big.join(small, key, how)`` exactly
    (tests/test_skew.py asserts equality); only the partitioning changes:
    shuffle keys become (key, salt) with ≤ rows/n_salts per hot-key task.

    Cost: the small side is exploded n_salts× before its shuffle — pick
    n_salts ≈ (hot-key rows / target task rows), not larger.
    """
    if how != "inner":
        raise ValueError("salted_join supports inner joins (outer joins would "
                         "duplicate unmatched small-side rows per salt)")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_big.join(salted_small, on=[key, "__salt"], how="inner")
        .drop("__salt")
    )


def q_join_salted_skew(spark, sf_dir: str):
    """The salted join as a GATED query: events (big, hot user keys) join
    a per-user tier dimension through the (key, salt) shuffle, then a
    (event_type, tier) rollup. The ORACLE is the PLAIN join + rollup —
    the gate certifies that salting changes only the partitioning, never
    the join semantics (the salted_join contract, now driver-checked
    rather than only unit-tested).

    Scale: this is the mid-size-dimension hot-key fix — the dim explodes
    n_salts× (pick n_salts ≈ hot-key rows / target task rows), the big
    side never replicates, and the hottest user's rows land on 8 tasks
    instead of one."""
    from clusterindices_spark.functions.aggregates import finite_or_null, round6_stable
    from clusterindices_spark.sources.fixtures import load_table

    e = load_table(spark, sf_dir, "events").withColumn("value", finite_or_null("value"))
    dim = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.concat(F.lit("tier"), F.pmod(F.col("user_id"), F.lit(3))).alias(
                "tier"
            ),
        )
    )
    joined = salted_join(e, dim, key="user_id", salt_from="event_id")
    return (
        joined.groupBy("event_type", "tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round6_stable(
                F.sum(
                    F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast(
                        "bigint"
                    )
                )
                / F.lit(1e6)
            ).alias("sum_value"),
        )
    )


QUERIES = {"join_salted_skew": q_join_salted_skew}

ORACLES = {
    # DEFINITIONAL oracle: the PLAIN (unsalted) join — certifies salting
    # is partitioning-only
    "join_salted_skew": """
WITH dim AS (
  -- pmod, not %: negative user_ids would label 'tier-1'/'tier-2' here
  -- while Spark's pmod tier is always tier0..tier2 (fuzz gate 101001)
  SELECT user_id,
         'tier' || CAST(((user_id % 3) + 3) % 3 AS VARCHAR) AS tier
  FROM (SELECT user_id FROM events GROUP BY user_id)
)
SELECT e.event_type, d.tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       (floor((CAST(SUM(CAST(floor(e.value * 1000000.0 + 0.5) AS BIGINT))
               AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0)
         AS sum_value
FROM events e JOIN dim d USING (user_id)
GROUP BY e.event_type, d.tier
""",
}

# fuzz wave-3 non-finite policy (see operators/analytics.py tail note):
# quantized/decimal measure paths exclude NaN/Inf like NULLs, in both
# engines, via finite_or_null on the Spark side and the * REPLACE
# isfinite rewrite here.
ORACLES["join_salted_skew"] = ORACLES["join_salted_skew"].replace(
    "FROM events", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(value) THEN value END) AS value) FROM events)")
