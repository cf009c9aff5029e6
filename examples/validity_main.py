"""Full validity report for ONE clustering: every internal index the engine
implements (the reference's four + CH/XB/silhouettes + the round-3
widening), plus — when an MLlib fit is requested — both external-agreement
families of the fitted clusters against the fixture's ground-truth labels.

    python examples/validity_main.py <sf_dir> [--algo kmeans|bisecting|gmm] [--k K]

With --algo/--k the labels come from an MLlib fit (the sweep path); without,
the fixture's ground-truth labels are scored directly (the oracle path —
external agreement is trivially perfect there and is skipped).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--algo", choices=["kmeans", "bisecting", "gmm"])
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args(argv)

    from clusterindices_spark.operators.indices import (
        centroids_of,
        index_suite,
        index_suite_ext_of,
        labeled_points,
        ratkowsky_lance_of,
    )
    from clusterindices_spark.operators.validity import (
        c_index_of,
        s_dbw_of,
        sd_index_of,
        wemmert_gancarski_of,
    )
    from clusterindices_spark.session import get_spark

    spark = get_spark("clusterindices-validity")
    spark.sparkContext.setLogLevel("ERROR")

    truth = labeled_points(spark, args.sf_dir)
    pts = truth
    if args.algo:
        from pyspark.ml.clustering import BisectingKMeans, GaussianMixture, KMeans
        from pyspark.ml.feature import PCA
        from pyspark.ml.functions import array_to_vector

        fv = truth.withColumn("fv", array_to_vector("x"))
        if args.algo == "gmm":
            # same guard as sweep.clusterer_sweep: full-covariance EM is
            # unstable in high dimension — fit the mixture in a PCA space
            n_dim = len(fv.select("x").first()["x"])
            if n_dim > 8:
                fv = (
                    PCA(k=8, inputCol="fv", outputCol="pv")
                    .fit(fv)
                    .transform(fv)
                    .drop("fv")
                    .withColumnRenamed("pv", "fv")
                )
        model = {
            "kmeans": KMeans,
            "bisecting": BisectingKMeans,
            "gmm": GaussianMixture,
        }[args.algo](k=args.k, seed=42, featuresCol="fv").fit(fv)
        pts = (
            model.transform(fv)
            .select("vec_id", model.getPredictionCol(), "x")
            .withColumnRenamed(model.getPredictionCol(), "cluster")
        )

    cents = centroids_of(pts)
    print("== core suite (reference parity) ==")
    index_suite(pts, cents).show(truncate=False)
    print("== extended indices ==")
    index_suite_ext_of(pts).show(truncate=False)
    ratkowsky_lance_of(pts).show(truncate=False)
    wemmert_gancarski_of(pts).show(truncate=False)
    sd_index_of(pts).show(truncate=False)
    s_dbw_of(pts).show(truncate=False)
    print("== quadratic yardstick (guarded; sampled past the cap) ==")
    c_index_of(pts).show(truncate=False)
    if args.algo:
        from pyspark.sql import functions as F

        from clusterindices_spark.operators.assignment import (
            agreement_ext,
            external_agreement,
        )

        cont = (
            pts.select("vec_id", "cluster")
            .join(truth.select("vec_id", F.col("cluster").alias("label")), "vec_id")
            .groupBy("cluster", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        print("== external agreement vs ground-truth labels ==")
        external_agreement(cont).show(truncate=False)
        agreement_ext(cont).show(truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
