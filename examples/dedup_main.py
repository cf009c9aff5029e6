"""End-to-end near-duplicate removal CLI: every dedup tier this repo ships,
composed into the pass a training-data pipeline actually runs.

    python examples/dedup_main.py <sf_dir> <out_dir>
    python examples/dedup_main.py /root/testdata/sf0.001 /tmp/dedup_out

Stages:
1. exact tier       — sha256 groupBy; only canonical copies continue
                      (operators/dedup.q_dedup_exact pattern)
2. candidate tier   — banded MinHash LSH candidates, exact-Jaccard verified
                      (operators/dedup.minhash_pairs) — the scale path;
                      the exact shingle-join tier is the ground-truth
                      yardstick, not run here
3. graph diagnostic — triangle census of the candidate graph
                      (operators/dedup.triangle_census): transitivity ≈ 1
                      means clean cliques, low transitivity warns that
                      component-collapse would over-merge chains
4. components       — large-star/small-star connected components
                      (operators/dedup.connected_components_star)
5. scrub + write    — keep one canonical doc per component, write the
                      deduplicated corpus + a dup-report parquet

Scale shape: two content shuffles (sha256 groupBy, LSH band buckets), the
CC rounds on the (tiny) candidate edge set, and one write. Nothing here
collects to the driver beyond 1-row summaries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir, out_dir = argv

    from pyspark.sql import functions as F

    from clusterindices_spark.operators.dedup import (
        _component_report,
        connected_components_star,
        minhash_pairs,
        triangle_census,
    )
    from clusterindices_spark.session import get_spark
    from clusterindices_spark.sources.fixtures import load_table

    spark = get_spark("dedup-main")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    n_in = d.count()

    # 1. exact tier: canonical copy per content hash. The exact-tier drops
    # go into the report too — an auditor of {out_dir}/dropped must see
    # EVERY removed doc, not just the near-dup ones.
    hashed = d.select("doc_id", F.sha2(F.col("text"), 256).alias("h"))
    canon = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    exact_drops = (
        hashed.join(canon, "h")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select(
            "doc_id",
            F.col("keep_id").alias("component_id"),
            F.lit("exact").alias("tier"),
        )
    )
    d1 = d.join(canon.select(F.col("keep_id").alias("doc_id")), "doc_id",
                "left_semi").persist()
    n_exact = d1.count()

    # 2. near-dup candidates (LSH-banded, Jaccard-verified). Eagerly
    # materialized: the census reads the edge list in four subtrees of one
    # action and CC replays it across rounds — lazy, each replays the whole
    # candidate pipeline (same pitfall q_dedup_graph_triangles documents).
    pairs = (
        minhash_pairs(d1)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint(eager=True)
    )

    # 3. graph density diagnostic BEFORE collapsing components
    census = triangle_census(pairs).collect()
    if census and census[0]["n_edges"]:
        c = census[0]
        print(
            f"dup graph: {c['n_edges']} edges over {c['n_nodes']} docs, "
            f"{c['n_triangles']} triangles, transitivity={c['transitivity']}"
        )
        if c["transitivity"] is not None and c["transitivity"] < 0.3:
            print(
                "WARNING: low transitivity — candidate chains, components "
                "may over-merge; consider raising the verify threshold"
            )

    # 4. components over the near-dup graph
    nodes = d1.select(F.col("doc_id").alias("node"))
    report = _component_report(
        connected_components_star(
            nodes, pairs.selectExpr("a AS src", "b AS dst")
        )
    ).persist()

    # 5. keep the BEST member per component (longest n_chars, ties to the
    # lowest id — the q_dedup_cluster_keep_best policy, r7): a near-dup
    # cluster usually holds one full extraction and several truncated
    # copies, so min-id survivor selection throws away content; write
    # corpus + full report (near-dup drops ∪ exact-tier drops). observe()
    # rides the write job — no second evaluation just for the summary.
    keep = (
        report.join(d1.select("doc_id", "n_chars"), "doc_id")
        .groupBy("component_id")
        .agg(
            F.max_by(
                F.col("doc_id"),
                F.struct(
                    F.col("n_chars").alias("c"),
                    (-F.col("doc_id")).alias("ni"),
                ),
            ).alias("doc_id")
        )
        .select("doc_id")
    )
    from pyspark.sql import Observation

    obs = Observation("dedup_out")
    out = d1.join(keep, "doc_id", "left_semi").observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/documents")
    near_drops = report.join(keep, "doc_id", "left_anti").select(
        "doc_id", "component_id", F.lit("near").alias("tier")
    )
    near_drops.unionByName(exact_drops).write.mode("overwrite").parquet(
        f"{out_dir}/dropped"
    )
    n_out = obs.get["n"]
    print(
        f"in={n_in} after_exact={n_exact} after_near={n_out} "
        f"(removed {n_in - n_out}) -> {out_dir}"
    )

    # --- r6: graph density triage + estimator tuning table -------------
    from clusterindices_spark.operators.dedup import (
        q_dedup_graph_kcore,
        q_dedup_minhash_pr_curve,
    )

    core = q_dedup_graph_kcore(spark, sf_dir)
    n_core = core.where(F.col("in_kcore")).count()
    n_graph = core.count()
    print(
        f"== 2-core: {n_core}/{n_graph} near-dup graph nodes sit in dense"
        f" clusters (rest are chain artifacts) =="
    )
    print("== MinHash-as-classifier PR curve (signature-only dedup) ==")
    for r in sorted(
        q_dedup_minhash_pr_curve(spark, sf_dir).collect(),
        key=lambda r: r["tau"],
    ):
        p = "n/a" if r["precision"] is None else f"{r['precision']:.3f}"
        q = "n/a" if r["recall"] is None else f"{r['recall']:.3f}"
        print(
            f"  tau={r['tau']:.2f}: P={p} R={q}"
            f" (tp={r['tp']} fp={r['fp']} fn={r['fn']})"
        )
    d1.unpersist()
    report.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
