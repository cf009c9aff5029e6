"""Hand-value + property tests for the round-3b validity indices
(operators/validity.py): Wemmert-Gançarski, SD, S_Dbw, C-index."""

from __future__ import annotations

import math

import pytest

from clusterindices_spark.operators.validity import (
    c_index_of,
    s_dbw_of,
    sd_index_of,
    wemmert_gancarski_of,
)

from tests.conftest import SF_SMOKE


def tiny_clusters(spark):
    # same fixture as test_indices: centroids (0,1) and (10,1); every point
    # d_own = 1, d_nearest_other = sqrt(101)
    rows = [
        (0, 0, [0.0, 0.0]),
        (1, 0, [0.0, 2.0]),
        (2, 1, [10.0, 0.0]),
        (3, 1, [10.0, 2.0]),
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, cluster INT, x ARRAY<DOUBLE>")


def test_wemmert_gancarski_hand_value(spark):
    row = wemmert_gancarski_of(tiny_clusters(spark)).collect()[0]
    assert row["k"] == 2
    assert row["wemmert_gancarski"] == pytest.approx(
        1.0 - 1.0 / math.sqrt(101), abs=1e-6
    )


def test_wemmert_gancarski_bounds_and_partition_invariance(spark):
    from clusterindices_spark.operators.indices import labeled_points

    pts = labeled_points(spark, SF_SMOKE)
    v1 = wemmert_gancarski_of(pts).collect()[0]["wemmert_gancarski"]
    v2 = wemmert_gancarski_of(pts.repartition(7)).collect()[0]["wemmert_gancarski"]
    assert 0.0 <= v1 <= 1.0
    assert v1 == v2


def test_sd_index_hand_value(spark):
    # sigma_0 = sigma_1 = (0,1) -> norms 1; global sigma = (25,1) -> sqrt(626)
    # Scat = 1/sqrt(626); Dis = (10/10) * (1/10 + 1/10) = 0.2
    row = sd_index_of(tiny_clusters(spark)).collect()[0]
    assert row["k"] == 2
    assert row["sd_scat"] == pytest.approx(1.0 / math.sqrt(626), abs=1e-6)
    assert row["sd_dis"] == pytest.approx(0.2, abs=1e-6)
    assert row["sd_index"] == pytest.approx(0.2 + 1.0 / math.sqrt(626), abs=1e-6)


def test_s_dbw_zero_density_convention(spark):
    # stdev = sqrt(2)/2; no point lies within stdev of either centroid or
    # the midpoint -> max(di, dj) = 0 -> the pair contributes 0 by the
    # pinned convention, so s_dbw collapses to Scat
    row = s_dbw_of(tiny_clusters(spark)).collect()[0]
    assert row["dens_bw"] == 0.0
    assert row["s_dbw"] == row["s_dbw_scat"]


def test_s_dbw_hand_value_asymmetric(spark):
    # 1-D asymmetric spreads: A = {0, 0.2} (centroid 0.1, var .01),
    # B = {6.2, 17.8} (centroid 12, var 33.64).
    # stdev = 0.5*sqrt(0.01 + 33.64); midpoint 6.05.
    # du = 1 (only 6.2), di = 2 (both A points), dj = 0 -> dens_bw = 1/2.
    rows = [
        (0, 0, [0.0, 0.0]),
        (1, 0, [0.2, 0.0]),
        (2, 1, [6.2, 0.0]),
        (3, 1, [17.8, 0.0]),
    ]
    pts = spark.createDataFrame(rows, "vec_id BIGINT, cluster INT, x ARRAY<DOUBLE>")
    row = s_dbw_of(pts).collect()[0]
    global_var = sum(v * v for v in (0.0, 0.2, 6.2, 17.8)) / 4 - 6.05**2
    scat = (0.01 + 33.64) / 2 / global_var
    assert row["dens_bw"] == pytest.approx(0.5, abs=1e-6)
    assert row["s_dbw_scat"] == pytest.approx(scat, abs=1e-6)
    assert row["s_dbw"] == pytest.approx(scat + 0.5, abs=1e-6)


def test_c_index_perfect_clustering_is_zero(spark):
    # within pairs are exactly the 2 smallest distances -> S_w = S_min -> 0
    row = c_index_of(tiny_clusters(spark)).collect()[0]
    assert row["n_w"] == 2
    assert row["c_index"] == pytest.approx(0.0, abs=1e-6)


def test_c_index_worst_clustering_is_one(spark):
    # swap labels so within-cluster pairs are exactly the 2 LARGEST
    # distances (the sqrt(104) diagonals) -> S_w = S_max -> 1
    rows = [
        (0, 0, [0.0, 0.0]),
        (1, 1, [0.0, 2.0]),
        (2, 1, [10.0, 0.0]),
        (3, 0, [10.0, 2.0]),
    ]
    pts = spark.createDataFrame(rows, "vec_id BIGINT, cluster INT, x ARRAY<DOUBLE>")
    row = c_index_of(pts).collect()[0]
    assert row["c_index"] == pytest.approx(1.0, abs=1e-6)


def test_c_index_guard_trips(spark):
    from clusterindices_spark.operators.indices import labeled_points

    pts = labeled_points(spark, SF_SMOKE)
    with pytest.raises(ValueError, match="c_index is O"):
        c_index_of(pts, max_rows=10)
    # a deterministic hash-sample brings the input under the same cap
    assert c_index_of(pts, max_rows=10, sample_fraction=0.01).count() == 1


def test_pair_validity_hand_values(spark):
    """tiny_clusters pairs: within {2,2}, between {10,10,sqrt104,sqrt104}.
    Hand point-biserial (population std) and McClain-Rao."""
    from clusterindices_spark.operators.validity import pair_validity_of

    row = pair_validity_of(tiny_clusters(spark)).collect()[0]
    ds = [2.0, 2.0, 10.0, 10.0, math.sqrt(104), math.sqrt(104)]
    m_w, m_b = 2.0, (10 + 10 + 2 * math.sqrt(104)) / 4
    mean = sum(ds) / 6
    s_all = math.sqrt(sum((d - mean) ** 2 for d in ds) / 6)
    pb = (m_b - m_w) * math.sqrt(2 * 4) / 6 / s_all
    assert row["n_w"] == 2 and row["n_b"] == 4
    assert row["point_biserial"] == pytest.approx(pb, abs=1e-6)
    assert row["mcclain_rao"] == pytest.approx(m_w / m_b, abs=1e-6)


def test_pair_validity_guard_trips(spark):
    from clusterindices_spark.operators.indices import labeled_points
    from clusterindices_spark.operators.validity import pair_validity_of

    pts = labeled_points(spark, SF_SMOKE)
    with pytest.raises(ValueError, match="pair_validity is O"):
        pair_validity_of(pts, max_rows=10)
