"""Skew-stress A/B for salted_join (VERDICT r6 next #6).

The gated key join_salted_skew proves salting is semantics-preserving, but
at every gate SF its dimension is broadcast-size, so the (key, salt)
shuffle never fights real skew in a measured run. This sidebar builds the
operator's TARGET regime synthetically — a sort-merge join where one key
owns ~90% of the big side and the dim is too big to broadcast — with
AQE's skew-join splitting DISABLED (it only exists to fix exactly this,
and the point here is to measure what salting buys when the runtime fixer
is absent, e.g. a non-SMJ plan or a pre-AQE engine) and prints one JSON
line:

  {"plain_sec": ..., "salted_sec": ..., "speedup": ...,
   "plain_hot_partitions": 1, "salted_hot_partitions": >= n_salts-ish,
   "plain_max_task_rows": ~hot_n, "salted_max_task_rows": ~hot_n/n_salts}

"task rows" = rows of the join output per shuffle partition
(spark_partition_id), the direct driver of straggler wall-time.

Run: python tools/skew_stress.py  (env: SPARK_GRAFT_CPUS, SKEW_ROWS)
Results are recorded in BASELINE.md ("Salted-join skew stress").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

HOT_KEY = 7
N_SALTS = 8


def build_fixture(spark, n_rows: int, n_dim_keys: int):
    """big: n_rows rows, ~90% on HOT_KEY, rest uniform over the dim keys;
    dim: n_dim_keys rows. Both deterministic (id-derived, no rand())."""
    big = spark.range(0, n_rows).select(
        F.when(
            F.col("id") % 10 != 0, F.lit(HOT_KEY)
        )  # 90% of rows hit the hot key
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dim_keys)))
        .cast("bigint")
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(0, n_dim_keys).select(
        F.col("id").alias("k"),
        F.concat(F.lit("tier"), F.pmod(F.col("id"), F.lit(5))).alias("tier"),
    )
    return big, dim


def run_side(joined) -> dict:
    """Materialize the join and measure wall time + the per-shuffle-task
    row distribution of the join output (spark_partition_id)."""
    t0 = time.monotonic()
    per_part = (
        joined.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(F.col("k") == HOT_KEY, 1).otherwise(0)).alias(
                "hot_rows"
            ),
        )
        .collect()
    )
    sec = time.monotonic() - t0
    rows = [r["rows"] for r in per_part]
    hot_parts = [r for r in per_part if r["hot_rows"] > 0]
    return {
        "sec": round(sec, 3),
        "n_partitions": len(per_part),
        "max_task_rows": max(rows),
        "hot_partitions": len(hot_parts),
        "hot_max_task_rows": max((r["hot_rows"] for r in hot_parts), default=0),
        "total_rows": sum(rows),
    }


def main() -> None:
    from clusterindices_spark.operators.skew import salted_join
    from clusterindices_spark.session import get_spark

    n_rows = int(os.environ.get("SKEW_ROWS", "4000000"))
    n_dim_keys = 200_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("skew-stress", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # the regime: dim must shuffle (no broadcast), and the runtime skew
    # fixer is off so the A/B isolates what SALTING buys
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    big, dim = build_fixture(spark, n_rows, n_dim_keys)
    big = big.persist()
    dim = dim.persist()
    big.count(), dim.count()  # materialize outside the timed window

    plain = big.join(dim, "k")
    salted = salted_join(big, dim, key="k", salt_from="row_id", n_salts=N_SALTS)
    # warm both plans once (codegen compile), then measure
    run_side(plain)
    run_side(salted)
    p = run_side(plain)
    s = run_side(salted)
    assert p["total_rows"] == s["total_rows"], "salting changed semantics!"
    out = {
        "metric": "salted_join_skew_stress",
        "n_rows": n_rows,
        "n_salts": N_SALTS,
        "plain_sec": p["sec"],
        "salted_sec": s["sec"],
        "speedup": round(p["sec"] / s["sec"], 2) if s["sec"] else None,
        "plain_hot_partitions": p["hot_partitions"],
        "salted_hot_partitions": s["hot_partitions"],
        "plain_max_task_rows": p["max_task_rows"],
        "salted_max_task_rows": s["max_task_rows"],
        "join_rows": p["total_rows"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
