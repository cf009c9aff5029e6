"""Index-math unit tests on hand-computable micro-fixtures (SURVEY.md §5.2.3)
plus partition-count invariance properties (§5.2.4)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clusterindices_spark.operators.indices import (
    centroid_pair_dists,
    centroids_of,
    index_suite,
    point_metrics,
)

from tests.conftest import SF_SMOKE


def tiny_clusters(spark):
    # cluster 0: (0,0),(0,2) -> centroid (0,1); cluster 1: (10,0),(10,2) -> (10,1)
    rows = [
        (0, 0, [0.0, 0.0]),
        (1, 0, [0.0, 2.0]),
        (2, 1, [10.0, 0.0]),
        (3, 1, [10.0, 2.0]),
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, cluster INT, x ARRAY<DOUBLE>")


def test_tiny_hand_values(spark):
    pts = tiny_clusters(spark)
    row = index_suite(pts, centroids_of(pts)).collect()[0]
    # every point: d_own = 1, d_other = sqrt(101); inter-centroid dist = 10
    assert row["k"] == 2
    assert row["wssse"] == pytest.approx(4.0, abs=1e-6)
    assert row["bd_dunn"] == pytest.approx(10.0, abs=1e-6)
    assert row["davies_bouldin"] == pytest.approx(0.2, abs=1e-6)
    expected_sil = (math.sqrt(101) - 1.0) / math.sqrt(101)
    assert row["bd_silhouette"] == pytest.approx(expected_sil, abs=1e-6)


def test_centroids(spark):
    pts = tiny_clusters(spark)
    cents = {r["cluster"]: r["centroid"] for r in centroids_of(pts).collect()}
    assert cents[0] == [0.0, 1.0]
    assert cents[1] == [10.0, 1.0]


def test_pairwise_centroid_dists(spark):
    pts = tiny_clusters(spark)
    pairs = centroid_pair_dists(centroids_of(pts)).collect()
    assert len(pairs) == 2  # (0,1) and (1,0)
    assert all(r["dist"] == pytest.approx(10.0) for r in pairs)


def test_degenerate_single_cluster(spark):
    rows = [(0, 0, [0.0, 0.0]), (1, 0, [2.0, 0.0])]
    pts = spark.createDataFrame(rows, "vec_id BIGINT, cluster INT, x ARRAY<DOUBLE>")
    row = index_suite(pts, centroids_of(pts)).collect()[0]
    # K=1: no other centroid -> Dunn/DB/Silhouette undefined (NULL); WSSSE fine
    assert row["k"] == 1
    assert row["bd_dunn"] is None
    assert row["davies_bouldin"] is None
    assert row["bd_silhouette"] is None
    assert row["wssse"] == pytest.approx(2.0, abs=1e-6)


def test_single_point_cluster(spark):
    rows = [(0, 0, [0.0, 0.0]), (1, 1, [10.0, 0.0]), (2, 1, [12.0, 0.0])]
    pts = spark.createDataFrame(rows, "vec_id BIGINT, cluster INT, x ARRAY<DOUBLE>")
    pm = {r["vec_id"]: r for r in point_metrics(pts, centroids_of(pts)).collect()}
    assert pm[0]["d_own"] == pytest.approx(0.0)  # singleton: S_i = 0
    assert pm[0]["d_nearest_other"] == pytest.approx(11.0)
    assert pm[1]["d_own"] == pytest.approx(1.0)


def test_partition_invariance(spark):
    from clusterindices_spark.operators.indices import labeled_points

    pts = labeled_points(spark, SF_SMOKE)
    base = index_suite(pts, centroids_of(pts)).collect()[0].asDict()
    reparted = pts.repartition(7)
    alt = index_suite(reparted, centroids_of(reparted)).collect()[0].asDict()
    assert base == alt  # round(6) output must be partitioning-independent


def test_translation_invariance(spark):
    pts = tiny_clusters(spark)
    shifted = pts.withColumn("x", F.transform("x", lambda v: v + F.lit(100.0)))
    a = index_suite(pts, centroids_of(pts)).collect()[0].asDict()
    b = index_suite(shifted, centroids_of(shifted)).collect()[0].asDict()
    assert a == b
