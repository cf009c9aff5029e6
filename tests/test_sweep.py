"""K-sweep validation (SURVEY.md §5.2.6): paper methodology — index curves
should behave sensibly in K on the 10-label embeddings fixture."""

from __future__ import annotations

from clusterindices_spark.operators.assignment import assign
from clusterindices_spark.operators.indices import centroids_of, labeled_points
from clusterindices_spark.operators.sweep import kmeans_sweep

from tests.conftest import SF_SMOKE


def test_sweep_shape_and_wssse_monotonicity(spark):
    df = kmeans_sweep(spark, SF_SMOKE, k_min=2, k_max=10, max_iter=10)
    rows = {r["k"]: r for r in df.collect()}
    assert set(rows) == set(range(2, 11))
    # WSSSE at k=10 must beat k=2 by a wide margin (not strictly monotone per
    # K due to local optima, but the endpoints are robust)
    assert rows[10]["wssse"] < rows[2]["wssse"]
    for r in rows.values():
        assert r["time_s"] >= 0
        assert r["bd_dunn"] is not None


def test_assignment_matches_own_label_centroid_geometry(spark):
    # With centroids DERIVED from labels, every point assigned to its own
    # label's centroid iff labels are geometrically coherent; synthetic
    # embeddings overlap, so just require a non-trivial agreement rate and
    # assignment totality.
    pts = labeled_points(spark, SF_SMOKE)
    a = assign(pts, centroids_of(pts))
    n = a.count()
    assert n == pts.count()
    agree = a.where("cluster = assigned_cluster").count()
    assert agree > 0
    assert a.select("assigned_cluster").distinct().count() <= 10
