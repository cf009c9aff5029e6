"""Salted-join equivalence + partitioning properties (SURVEY.md §4.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clusterindices_spark.operators.skew import salted_join
from clusterindices_spark.sources.fixtures import load_table

from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    p = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    plain = li.join(
        p.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey"
    )
    salted = salted_join(
        li,
        p.withColumnRenamed("p_partkey", "l_partkey"),
        key="l_partkey",
        salt_from="l_orderkey",
        n_salts=4,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_aqe_splits_skewed_smj(spark):
    """AQE skew-join demonstration (SURVEY.md §4.3): a sort-merge join whose
    left side is 95% one hot key must be re-planned at runtime with the hot
    partition split — the final adaptive plan carries SortMergeJoin(skew=true).

    Two traps this test had to dodge, both worth keeping on record: a
    payload built from literals is constant-folded (length(pay) → 256) and
    the column pruned before the shuffle, and a post-join projection that
    drops the payload prunes it too — either way the shuffle is no longer
    skewed in BYTES even though the key histogram is. The payload must be
    row-dependent and actually consumed above the join."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        pay = F.concat(F.repeat(F.lit("x"), 256), F.col("id").cast("string"))
        big = spark.range(0, 400_000).select(
            F.when(F.col("id") % 20 != 0, 1)
            .otherwise(F.col("id"))
            .cast("int")
            .alias("k"),
            pay.alias("pay"),
        )
        small = spark.range(0, 50_000).select(
            F.col("id").cast("int").alias("k"), F.lit("v").alias("v")
        )
        j = big.join(small, "k").agg(F.sum(F.length("pay")).alias("bytes"))
        got = j.collect()[0]["bytes"]
        # small's keys are exactly 0..49999, so the join is a filter on big
        expected = (
            big.where(F.col("k") < 50_000)
            .agg(F.sum(F.length("pay")).alias("bytes"))
            .collect()[0]["bytes"]
        )
        assert got == expected
        plan = j._jdf.queryExecution().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salt_spreads_hot_key(spark):
    # one pathologically hot key: every row joins key=1; salts must spread
    # rows across all 8 replicas rather than one partition
    big = spark.range(0, 8000).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    small = spark.createDataFrame([(1, "x")], "k INT, v STRING")
    joined = salted_join(big, small, key="k", salt_from="row_id", n_salts=8)
    assert joined.count() == 8000
    salts = (
        big.withColumn("s", F.pmod(F.xxhash64("row_id"), F.lit(8)))
        .groupBy("s")
        .count()
        .collect()
    )
    counts = [r["count"] for r in salts]
    assert len(counts) == 8
    assert max(counts) < 8000 * 0.25  # no replica hoards the hot key


def test_salted_join_spreads_hot_key_across_tasks(spark):
    """The skew-stress regime (tools/skew_stress.py) in miniature: one key
    owning 90% of the big side, dim not broadcastable, AQE skew split off.
    The plain join concentrates every hot row in ONE join-output partition;
    the salted join must land the hot key on >= n_salts partitions with no
    partition holding more than ~1/n_salts of the hot rows (xxhash64 salt
    is deterministic, so these counts are stable, not flaky)."""
    from clusterindices_spark.operators.skew import salted_join
    from tools.skew_stress import HOT_KEY, N_SALTS, build_fixture, run_side

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # enough shuffle partitions that the 8 (key, salt) tuples hash to
        # 8 DISTINCT partitions (at 32 they collide into 6 — deterministic
        # xxhash64, verified); production clusters run hundreds anyway
        "spark.sql.shuffle.partitions": "256",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big, dim = build_fixture(spark, 400_000, 50_000)
        plain = run_side(big.join(dim, "k"))
        salted = run_side(
            salted_join(big, dim, key="k", salt_from="row_id", n_salts=N_SALTS)
        )
        assert plain["total_rows"] == salted["total_rows"]
        assert plain["hot_partitions"] == 1  # the straggler
        assert salted["hot_partitions"] >= N_SALTS
        hot_n = 400_000 * 9 // 10
        assert salted["hot_max_task_rows"] <= hot_n // N_SALTS * 1.3
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
