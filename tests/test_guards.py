"""Quadratic-tier scale guards (functions/guards.py): the O(n²) yardstick
operators must refuse oversized input instead of firing an accidental
cartesian product at scale (VERDICT r2 "What's wrong" #2)."""

import pytest
from pyspark.sql import functions as F

from clusterindices_spark.functions.guards import cap_quadratic, hash_sample


def _emb_df(spark, n):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("x"),
    )


def test_cap_trips_on_oversized_input(spark):
    df = _emb_df(spark, 50)
    with pytest.raises(ValueError, match="O\\(n²\\)|O\\(n"):
        cap_quadratic(df, "demo_op", "vec_id", max_rows=10)


def test_cap_passes_within_limit(spark):
    df = _emb_df(spark, 10)
    assert cap_quadratic(df, "demo_op", "vec_id", max_rows=10).count() == 10


def test_hash_sample_deterministic_and_reduces(spark):
    df = _emb_df(spark, 1000)
    s1 = sorted(r.vec_id for r in hash_sample(df, "vec_id", 0.2).collect())
    s2 = sorted(
        r.vec_id
        for r in hash_sample(df.repartition(7), "vec_id", 0.2).collect()
    )
    assert s1 == s2  # pure function of the data, not the partitioning
    assert 0 < len(s1) < 1000


def test_sample_fraction_unlocks_oversized_input(spark):
    df = _emb_df(spark, 1000)
    out = cap_quadratic(
        df, "demo_op", "vec_id", max_rows=400, sample_fraction=0.2
    )
    assert out.count() <= 400


def test_dedup_embedding_cosine_guard(spark):
    from clusterindices_spark.operators.dedup import QUERIES  # noqa: F401
    from clusterindices_spark.operators.similarity import (
        dedup_embedding_cosine,
    )

    big = _emb_df(spark, 200)
    with pytest.raises(ValueError, match="dedup_embedding_cosine"):
        dedup_embedding_cosine(big, max_rows=50)
    # sampled run completes
    dedup_embedding_cosine(big, max_rows=50, sample_fraction=0.1).collect()


def test_silhouette_exact_guard(spark):
    from clusterindices_spark.operators.indices import silhouette_exact_of

    pts = spark.range(100).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 3).cast("int").alias("cluster"),
        F.array(F.col("id").cast("double"), F.lit(0.0)).alias("x"),
    )
    with pytest.raises(ValueError, match="silhouette_exact"):
        silhouette_exact_of(pts, max_rows=20)
    row = silhouette_exact_of(pts, max_rows=100).first()
    assert row["silhouette_exact"] is not None
