"""Join-strategy control surface: Catalyst picks the physical join, but a
user tuning a 100 TB query needs the hint escape hatches to WORK. Each hint
must be honored in the executed plan (and the no-hint baseline shows what
AQE picked on its own)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clusterindices_spark.sources.fixtures import load_table

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _sides(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    return o, c


def test_broadcast_hint_forces_bhj(spark):
    o, c = _sides(spark)
    plan = _plan(o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey))
    assert "BroadcastHashJoin" in plan


def test_merge_hint_forces_smj(spark):
    o, c = _sides(spark)
    plan = _plan(o.join(c.hint("merge"), o.o_custkey == c.c_custkey))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_shuffle_hash_hint_forces_shj(spark):
    o, c = _sides(spark)
    plan = _plan(o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hinted_joins_agree_on_results(spark):
    """Strategy changes the plan, never the answer: row counts and a
    checksum agree across all three hinted physical strategies."""
    o, c = _sides(spark)

    def run(hint):
        j = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        # bit_xor, not sum: summing 64-bit hashes overflows long under the
        # driver's ANSI mode; xor is order-free and never overflows
        r = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(o_orderkey, c_custkey))").alias("chk"),
        ).collect()[0]
        return (r["n"], r["chk"])

    assert run("broadcast") == run("merge") == run("shuffle_hash")
