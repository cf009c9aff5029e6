"""PCA over embeddings: the one-pass integer-micro covariance fit is
deterministic and mathematically sound, and the JVM-side projection agrees
with a local numpy reference."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clusterindices_spark.operators.embeddings import (
    PCA_K,
    pca_fit,
    q_embedding_pca_project,
)
from clusterindices_spark.sources.fixtures import load_table

from tests.conftest import SF_SMOKE


def _emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").alias("x")
    )


def test_pca_components_orthonormal_and_variance_ordered(spark):
    comps, mean, evr = pca_fit(_emb(spark))
    assert comps.shape[0] == PCA_K
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(PCA_K), atol=1e-9)
    # explained-variance ratios are positive and non-increasing
    assert all(e > 0 for e in evr)
    assert all(evr[i] >= evr[i + 1] - 1e-12 for i in range(len(evr) - 1))
    assert sum(evr) <= 1.0 + 1e-9


def test_pca_fit_deterministic_across_runs_and_partitionings(spark):
    e = _emb(spark)
    c1, m1, _ = pca_fit(e)
    c2, m2, _ = pca_fit(e.repartition(7))  # partial order must not matter
    assert np.array_equal(c1, c2)
    assert np.array_equal(m1, m2)


def test_pca_projection_matches_numpy_reference(spark):
    e = _emb(spark)
    comps, mean, _ = pca_fit(e)
    got = {
        r["vec_id"]: [r[f"pc{i+1}"] for i in range(PCA_K)]
        for r in q_embedding_pca_project(spark, SF_SMOKE).collect()
    }
    rows = e.collect()
    for r in rows[:50]:
        want = comps @ (np.array(r["x"]) - mean)
        assert np.allclose(got[r["vec_id"]], want, atol=1e-5), r["vec_id"]


def test_pca_first_component_captures_most_variance(spark):
    """Projected variance along pc1 ≥ variance along pc2 ≥ ... (the defining
    property), measured on the actual projected output."""
    proj = q_embedding_pca_project(spark, SF_SMOKE)
    aggs = [F.variance(f"pc{i+1}").alias(f"v{i+1}") for i in range(PCA_K)]
    v = proj.agg(*aggs).first()
    for i in range(PCA_K - 1):
        assert v[f"v{i+1}"] >= v[f"v{i+2}"] - 1e-9
