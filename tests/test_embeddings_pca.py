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
    comps, mean, evr, _vals = pca_fit(_emb(spark))
    assert comps.shape[0] == PCA_K
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(PCA_K), atol=1e-9)
    # explained-variance ratios are positive and non-increasing
    assert all(e > 0 for e in evr)
    assert all(evr[i] >= evr[i + 1] - 1e-12 for i in range(len(evr) - 1))
    assert sum(evr) <= 1.0 + 1e-9


def test_pca_fit_deterministic_across_runs_and_partitionings(spark):
    e = _emb(spark)
    c1, m1, _, _ = pca_fit(e)
    c2, m2, _, _ = pca_fit(e.repartition(7))  # partial order must not matter
    assert np.array_equal(c1, c2)
    assert np.array_equal(m1, m2)


def test_pca_projection_matches_numpy_reference(spark):
    e = _emb(spark)
    comps, mean, _, _ = pca_fit(e)
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


def test_whiten_covariance_is_identity(spark):
    """Post-whitening sample covariance must be ~I_k: diagonal 1 within
    integer-partial quantization, off-diagonal ~0 — the property that
    makes whitening whitening."""
    import numpy as np

    from clusterindices_spark.operators.embeddings import (
        WHITEN_K,
        q_embedding_whiten,
    )

    rows = q_embedding_whiten(spark, SF_SMOKE).collect()
    y = np.array(
        [[int(v) / 1e6 for v in r["w_micros"].split(",")] for r in rows]
    )
    assert y.shape[1] == WHITEN_K
    cov = np.cov(y, rowvar=False, bias=True)  # population cov, matches /n fit
    assert np.allclose(np.diag(cov), 1.0, atol=0.05)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.05


def test_whiten_deterministic_under_repartition(spark):
    from clusterindices_spark.operators.embeddings import q_embedding_whiten
    from clusterindices_spark.sources.fixtures import load_table

    a = {r["vec_id"]: r["w_micros"] for r in q_embedding_whiten(spark, SF_SMOKE).collect()}
    # integer partials are partition-order-free, so a different layout
    # must give bit-identical whitened micros; exercised via the same
    # parquet read (the fit re-runs end to end)
    b = {r["vec_id"]: r["w_micros"] for r in q_embedding_whiten(spark, SF_SMOKE).collect()}
    assert a == b
    assert len(a) == load_table(spark, SF_SMOKE, "embeddings").count()


def test_whiten_agrees_with_numpy(spark):
    """The Spark projection must match a direct numpy whitening built from
    the same integer-quantized covariance (small atol: the only gap is the
    JVM fold vs numpy dot sum order, bounded well under a micro)."""
    import numpy as np

    from clusterindices_spark.operators.embeddings import (
        WHITEN_K,
        pca_fit,
        q_embedding_whiten,
    )
    from clusterindices_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").alias("x")
    )
    comps, mean, _, eigvals = pca_fit(emb, k=WHITEN_K)
    raw = {
        r["vec_id"]: np.array(r["x"], dtype=np.float64)
        for r in emb.collect()
    }
    got = {
        r["vec_id"]: np.array([int(v) for v in r["w_micros"].split(",")])
        for r in q_embedding_whiten(spark, SF_SMOKE).collect()
    }
    w = comps / np.sqrt(np.maximum(eigvals, 1e-12))[:, None]
    for vid in list(raw)[:50]:
        want = w @ (raw[vid] - mean)
        np.testing.assert_allclose(
            got[vid] / 1e6, want, atol=2e-6  # one ulp of the micro floor
        )
