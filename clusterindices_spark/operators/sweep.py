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

from clusterindices_spark.operators.indices import index_suite, labeled_points


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
    pts.count()  # materialize once before timing per-K work
    results = []
    try:
        for k in range(k_min, k_max + 1):
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


QUERIES = {
    "kmeans_sweep_small": q_kmeans_sweep_small,
    "kmeans_sweep_best_k": q_kmeans_sweep_best_k,
}

ORACLES: dict[str, str] = {}  # iterative ML — rows-only check by design
