"""K-sweep driver loop (SURVEY.md §2A A3/A12/A13).

Reference parity: ClusterIndices' main program sweeps K over a range, trains
MLlib K-Means per K, computes all four validity indices, and emits a
(K × index × elapsed) results table as CSV (paper §4 methodology: the index
curves elbow/peak at the true K).

Spark-first shape: the feature DataFrame is persisted ONCE across the whole
sweep (the reference's ``.cache()``); each K runs one JVM-side MLlib fit plus
ONE index-suite job (all four indices share a single pass — SURVEY.md §4.1).
The loop itself is driver orchestration by design: K is small and each fit
saturates the cluster, so parallelizing across K buys nothing (SURVEY.md §3.2).

Not oracle-checked (iterative ML is not SQL-expressible); validated by
property tests: WSSSE decreases in K, and the sweep recovers the true K on
planted well-separated blobs (the paper's C-D-I synthetic methodology).
Note the testdata embeddings fixture does NOT have geometrically separated
label clusters (BD-silhouette ≈ 0 on given labels), so K-recovery is
asserted on planted blobs, not on that fixture.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from clusterindices_spark.operators.indices import (
    centroids_of,
    index_suite,
    labeled_points,
)


_SWEEP_SCHEMA = (
    "k INT, bd_silhouette DOUBLE, bd_dunn DOUBLE, davies_bouldin DOUBLE, "
    "wssse DOUBLE, time_s DOUBLE"
)


def kmeans_sweep(
    spark: SparkSession,
    sf_dir: str,
    k_min: int = 2,
    k_max: int = 15,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Returns (k, bd_silhouette, bd_dunn, davies_bouldin, wssse, time_s) —
    one row per K, the reference's results-table shape."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    pts = (
        labeled_points(spark, sf_dir)
        .withColumn("fv", array_to_vector("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # cap K at the point count: MLlib refuses k > n fits (a 1-row corpus —
    # fuzz wave-3 one:embeddings — crashed every sweep); an empty candidate
    # range degrades to the empty frame like the r9 empty-corpus guard
    n_pts = pts.count()
    if n_pts < k_min:
        pts.unpersist()
        return spark.createDataFrame([], _SWEEP_SCHEMA)
    results = []
    try:
        for k in range(k_min, min(k_max, n_pts) + 1):
            t0 = time.monotonic()
            model = KMeans(
                k=k, seed=seed, maxIter=max_iter, featuresCol="fv"
            ).fit(pts)
            pred = model.transform(pts).select(
                "vec_id", model.getPredictionCol(), "x"
            ).withColumnRenamed(model.getPredictionCol(), "cluster")
            cents = spark.createDataFrame(
                [(i, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())],
                "cluster INT, centroid ARRAY<DOUBLE>",
            )
            row = index_suite(pred, cents).collect()[0]
            results.append(
                (
                    k,
                    row["bd_silhouette"],
                    row["bd_dunn"],
                    row["davies_bouldin"],
                    row["wssse"],
                    round(time.monotonic() - t0, 3),
                )
            )
    finally:
        pts.unpersist()
    return spark.createDataFrame(
        results,
        "k INT, bd_silhouette DOUBLE, bd_dunn DOUBLE, davies_bouldin DOUBLE, "
        "wssse DOUBLE, time_s DOUBLE",
    )


def write_results_csv(df: DataFrame, path: str) -> None:
    """A13 results sink: single CSV with header (results are K rows — tiny)."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def q_kmeans_sweep_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver check: tiny sweep, index columns only (elapsed time is
    nondeterministic so it is excluded from the checked frame)."""
    return kmeans_sweep(spark, sf_dir, k_min=2, k_max=5, max_iter=10).select(
        "k", "bd_silhouette", "bd_dunn", "davies_bouldin", "wssse"
    )


def best_k(sweep: DataFrame) -> DataFrame:
    """The sweep's decision output (reference parity: the index curves are
    computed so a user can PICK K): one row per index with its chosen K.

    - bd_silhouette, bd_dunn: argmax (higher = better separation)
    - davies_bouldin: argmin (lower = tighter/more separated)
    - wssse: knee — argmax of the drop ratio
      (w[k−1] − w[k]) / (w[k] − w[k+1]). WSSSE decreases monotonically in
      K so argmin is useless; at the true K the incoming drop is
      structural (a real cluster got its own centroid) while the outgoing
      drop is an overfit split, so the ratio spikes. (The additive second
      difference mis-picks when pre-knee drops are still large in absolute
      terms — observed on planted 10-blob data, where it chose 7.)

    All window work runs on the K-row sweep frame — driver-scale by
    construction, like the reference's own selection step."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("k")
    with_diff = sweep.select(
        "k",
        "bd_silhouette",
        "bd_dunn",
        "davies_bouldin",
        "wssse",
        (
            (F.lag("wssse", 1).over(w) - F.col("wssse"))
            / F.nullif(F.col("wssse") - F.lead("wssse", 1).over(w), F.lit(0.0))
        ).alias("elbow"),
    )

    def _pick(col: str, ascending: bool, out_name: str) -> DataFrame:
        # the output contract is exactly one row PER INDEX: when no non-null
        # value exists (a 2-point sweep has no interior elbow; a flat-WSSSE
        # plateau nullifs every ratio), emit the row with NULL chosen_k
        # rather than silently dropping it — consumers key on 'index'
        ordered = with_diff.where(F.col(col).isNotNull()).orderBy(
            F.col(col).asc() if ascending else F.col(col).desc(),
            F.col("k").asc(),
        )
        one = ordered.limit(1).select(
            F.lit(out_name).alias("index"),
            F.col("k").alias("chosen_k"),
            F.round(col, 6).alias("value"),
        )
        placeholder = sweep.sparkSession.createDataFrame(
            [(out_name, None, None)], "index STRING, chosen_k INT, value DOUBLE"
        )
        return (
            one.unionByName(
                placeholder.join(one.select("index"), "index", "left_anti")
            )
        )

    return (
        _pick("bd_silhouette", False, "bd_silhouette")
        .unionByName(_pick("bd_dunn", False, "bd_dunn"))
        .unionByName(_pick("davies_bouldin", True, "davies_bouldin"))
        .unionByName(_pick("elbow", False, "wssse_elbow"))
    )


def q_kmeans_sweep_best_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: the per-index K choice over a small sweep."""
    return best_k(kmeans_sweep(spark, sf_dir, k_min=2, k_max=6, max_iter=10))


# ---------------------------------------------------------------------------
# alternative clusterers under the same sweep + index suite (round-3b): the
# reference sweeps MLlib K-Means only; a user comparing algorithms needs the
# same results-table shape for hierarchical (bisecting) and model-based (GMM)
# clusterings. Same architecture: persist features once, one JVM fit + one
# fused index pass per K.
# ---------------------------------------------------------------------------


def clusterer_sweep(
    spark: SparkSession,
    sf_dir: str,
    algo: str = "bisecting",
    k_min: int = 2,
    k_max: int = 15,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """kmeans_sweep generalized over the MLlib clusterer family.

    algo: 'kmeans' | 'bisecting' (hierarchical divisive; centroids from the
    model) | 'gmm' (Gaussian mixture; MAP assignment — the index suite then
    measures the HARD clustering the mixture induces).

    GMM path: MLlib's full-covariance EM is numerically fragile in high
    dimension (64-dim fixture embeddings throw breeze
    MatrixNotSymmetricException mid-EM, and per-component covariances go
    singular with few points per dim). Standard practice is dimensionality
    reduction first: the GMM fits in a PCA space (gmm_pca_dim components,
    fit ONCE outside the K loop), while the indices are still evaluated in
    the ORIGINAL space — with empirical per-cluster mean centroids
    (centroids_of), so every algorithm's row measures the same geometry."""
    from pyspark.ml.clustering import BisectingKMeans, GaussianMixture, KMeans
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    gmm_pca_dim = 8
    makers = {
        "kmeans": lambda k: KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="fv"),
        "bisecting": lambda k: BisectingKMeans(
            k=k, seed=seed, maxIter=max_iter, featuresCol="fv"
        ),
        "gmm": lambda k: GaussianMixture(
            k=k, seed=seed, maxIter=max_iter, featuresCol="fv"
        ),
    }
    if algo not in makers:
        raise ValueError(f"algo must be one of {sorted(makers)}, got {algo!r}")
    pts = (
        labeled_points(spark, sf_dir)
        .withColumn("fv", array_to_vector("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # K capped at the point count (k > n fits refuse); GMM additionally
    # needs >= 2 rows for its covariance. A too-small corpus (fuzz wave-3
    # one:embeddings) degrades to the empty frame, like the r9 empty guard.
    n_pts = pts.count()
    if n_pts < k_min or (algo == "gmm" and n_pts < 2):
        pts.unpersist()
        return spark.createDataFrame([], _SWEEP_SCHEMA)
    k_max = min(k_max, n_pts)
    if algo == "gmm":
        n_dim = len(pts.select("x").first()["x"])
        if n_dim > gmm_pca_dim:
            pca = PCA(k=gmm_pca_dim, inputCol="fv", outputCol="pv").fit(pts)
            reduced = (
                pca.transform(pts)
                .drop("fv")
                .withColumnRenamed("pv", "fv")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            reduced.count()  # materialize BEFORE dropping the parent cache
            pts.unpersist()
            pts = reduced
    pts.count()
    results = []
    try:
        for k in range(k_min, k_max + 1):
            t0 = time.monotonic()
            model = makers[algo](k).fit(pts)
            pred = (
                model.transform(pts)
                .select("vec_id", model.getPredictionCol(), "x")
                .withColumnRenamed(model.getPredictionCol(), "cluster")
            )
            if algo == "gmm":
                # empirical centroids in the ORIGINAL space (the model's
                # Gaussian means live in PCA space)
                cents = centroids_of(pred)
            else:
                cents = spark.createDataFrame(
                    [
                        (i, [float(v) for v in c])
                        for i, c in enumerate(model.clusterCenters())
                    ],
                    "cluster INT, centroid ARRAY<DOUBLE>",
                )
            row = index_suite(pred, cents).collect()[0]
            results.append(
                (
                    k,
                    row["bd_silhouette"],
                    row["bd_dunn"],
                    row["davies_bouldin"],
                    row["wssse"],
                    round(time.monotonic() - t0, 3),
                )
            )
    finally:
        pts.unpersist()
    return spark.createDataFrame(
        results,
        "k INT, bd_silhouette DOUBLE, bd_dunn DOUBLE, davies_bouldin DOUBLE, "
        "wssse DOUBLE, time_s DOUBLE",
    )


def q_bisecting_sweep_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clusterer_sweep(spark, sf_dir, "bisecting", k_min=2, k_max=5, max_iter=10).select(
        "k", "bd_silhouette", "bd_dunn", "davies_bouldin", "wssse"
    )


def q_gmm_sweep_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clusterer_sweep(spark, sf_dir, "gmm", k_min=2, k_max=4, max_iter=10).select(
        "k", "bd_silhouette", "bd_dunn", "davies_bouldin", "wssse"
    )


# ---------------------------------------------------------------------------
# gap statistic (Tibshirani, Walther & Hastie 2001) — the principled best-K
# criterion: compare log W_K on the data against its expectation under a
# uniform null over the feature bounding box.
# ---------------------------------------------------------------------------


def gap_statistic(
    spark: SparkSession,
    sf_dir: str,
    k_min: int = 2,
    k_max: int = 6,
    n_refs: int = 3,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Returns (k, log_w, exp_log_w_ref, gap, sd_ref, pick) — pick=1 on the
    smallest K with gap(K) ≥ gap(K+1) − sd(K+1) (the paper's 1-SE rule;
    the last K never picks since it has no successor to compare).

    Pins: W_K = WSSSE (the paper's eq. 2 pooled-dispersion simplification
    for squared-Euclidean); reference datasets are uniform over the per-dim
    [min,max] bounding box, generated DETERMINISTICALLY via xxhash64(vec_id,
    dim, b) — no rand(), so replays and partitionings agree (the
    curation_split convention). Each reference fit reads W from MLlib's
    summary.trainingCost (no extra pass).

    Scale: (k_max−k_min+1)·(B+1) MLlib fits, each one distributed job; the
    per-dim bounds are ONE 2·p-value aggregate broadcast back as array
    literals. Driver loops over K and B only (reference-parity design,
    SURVEY.md §3.2)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    base = labeled_points(spark, sf_dir)
    first = base.select("x").first()
    if first is None:  # empty corpus (r9 hostile gate)
        return spark.createDataFrame(
            [],
            "k INT, log_w DOUBLE, exp_log_w_ref DOUBLE, gap DOUBLE, "
            "sd_ref DOUBLE, pick INT",
        )
    ndim = len(first["x"])
    bounds = base.select(
        F.array(
            *[F.min(F.get("x", d)) for d in range(ndim)]
        ).alias("lo"),
        F.array(
            *[F.max(F.get("x", d)) for d in range(ndim)]
        ).alias("hi"),
    )
    pts = base.withColumn("fv", array_to_vector("x")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # K capped at the point count (k > n fits refuse — fuzz wave-3
    # one:embeddings); an empty candidate range yields the empty frame
    n_pts = pts.count()
    k_max = min(k_max, n_pts)
    if k_max < k_min:
        pts.unpersist()
        return spark.createDataFrame(
            [],
            "k INT, log_w DOUBLE, exp_log_w_ref DOUBLE, gap DOUBLE, "
            "sd_ref DOUBLE, pick INT",
        )

    def _ref(b: int) -> DataFrame:
        # u01(vec_id, dim, b) = pmod(xxhash64(...), 2^20) / 2^20 — pure
        # function of the data, identical under any partitioning
        den = 1 << 20
        return (
            base.select("vec_id")
            .crossJoin(F.broadcast(bounds))
            .select(
                "vec_id",
                array_to_vector(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(ndim - 1)),
                        lambda d: F.get("lo", d)
                        + (
                            F.pmod(
                                F.xxhash64(F.col("vec_id"), d, F.lit(b)), F.lit(den)
                            ).cast("double")
                            / F.lit(float(den))
                        )
                        * (F.get("hi", d) - F.get("lo", d)),
                    )
                ).alias("fv"),
            )
        )

    refs = [
        _ref(b).persist(StorageLevel.MEMORY_AND_DISK) for b in range(n_refs)
    ]
    for r in refs:
        r.count()
    import math

    rows = []
    try:
        for k in range(k_min, k_max + 1):
            km = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="fv")
            log_w = math.log(km.fit(pts).summary.trainingCost)
            ref_logs = [
                math.log(km.fit(r).summary.trainingCost) for r in refs
            ]
            mean_ref = sum(ref_logs) / n_refs
            var_ref = sum((v - mean_ref) ** 2 for v in ref_logs) / n_refs
            sd_ref = math.sqrt(var_ref) * math.sqrt(1.0 + 1.0 / n_refs)
            rows.append((k, log_w, mean_ref, mean_ref - log_w, sd_ref))
    finally:
        pts.unpersist()
        for r in refs:
            r.unpersist()
    picked = None
    for i in range(len(rows) - 1):
        if rows[i][3] >= rows[i + 1][3] - rows[i + 1][4]:
            picked = rows[i][0]
            break
    out = [
        (k, round(lw, 6), round(mr, 6), round(g, 6), round(sd, 6), int(k == picked))
        for k, lw, mr, g, sd in rows
    ]
    return spark.createDataFrame(
        out,
        "k INT, log_w DOUBLE, exp_log_w_ref DOUBLE, gap DOUBLE, sd_ref DOUBLE, "
        "pick INT",
    )


def q_gap_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gap_statistic(spark, sf_dir, k_min=2, k_max=5, n_refs=3)


QUERIES = {
    "kmeans_sweep_small": q_kmeans_sweep_small,
    "kmeans_sweep_best_k": q_kmeans_sweep_best_k,
    "bisecting_sweep_small": q_bisecting_sweep_small,
    "gmm_sweep_small": q_gmm_sweep_small,
    "gap_statistic": q_gap_statistic,
}

ORACLES: dict[str, str] = {}  # iterative ML — rows-only check by design
