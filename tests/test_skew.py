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
