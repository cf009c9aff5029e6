"""Similarity-search stack CLI: the full ANN ladder on one corpus, with
measured recall of every approximate tier against the exact yardstick.

    python examples/ann_main.py <sf_dir>
    python examples/ann_main.py /root/testdata/sf0.001

Tiers (each a shipped operator):
1. exact          — brute-force cosine top-k (operators/similarity.topk_exact),
                    the recall yardstick; O(n·probes), run on samples at scale
2. LSH            — random-hyperplane bucketing (MLlib approxSimilarityJoin)
3. IVF            — cell-probe inverted file (broadcast centroids, equi-join)
4. PQ / ADC       — 4-bit product-quantization codes + table-lookup distances
                    (operators/pq): the corpus is scanned as 4 B/vector codes
5. k-NN graph     — every vector a probe via IVF cells (similarity.knn_graph)

The point of the ladder: exact proves correctness, IVF prunes the scan, PQ
shrinks the bytes, and at 100 TB you run IVF-PQ (both) with exact re-rank
on the survivors.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir = argv[0]

    from pyspark.sql import functions as F

    from clusterindices_spark.operators.pq import (
        pq_adc_topk,
        pq_topk_reranked,
        pq_train_encode,
    )
    from clusterindices_spark.operators.similarity import (
        _emb,
        ann_lsh_topk,
        ivf_topk,
        knn_graph,
        topk_exact,
    )
    from clusterindices_spark.session import get_spark

    spark = get_spark("ann-example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = _emb(spark, sf_dir)
    probes = emb.where(F.col("vec_id") < 10)

    def pairs(df):
        return {(r["probe_id"], r["neighbor_id"]) for r in df.collect()}

    t0 = time.monotonic()
    exact = pairs(topk_exact(emb, probes))
    print(f"exact top-5        : {len(exact):4d} pairs  {time.monotonic()-t0:5.1f}s  (yardstick)")

    for name, fn in (
        ("LSH", lambda: ann_lsh_topk(emb, probes)),
        ("IVF", lambda: ivf_topk(emb, probes)),
    ):
        t0 = time.monotonic()
        got = pairs(fn())
        rec = len(exact & got) / len(exact)
        print(f"{name:19s}: {len(got):4d} pairs  {time.monotonic()-t0:5.1f}s  recall {rec:.2f}")

    t0 = time.monotonic()
    codebook, codes = pq_train_encode(emb)
    got = pairs(pq_adc_topk(codebook, codes, probes))
    rec = len(exact & got) / len(exact)
    print(f"PQ/ADC (pure)      : {len(got):4d} pairs  {time.monotonic()-t0:5.1f}s  recall {rec:.2f}")

    t0 = time.monotonic()
    got = pairs(pq_topk_reranked(codebook, codes, emb, probes))
    rec = len(exact & got) / len(exact)
    print(f"PQ/ADC + re-rank   : {len(got):4d} pairs  {time.monotonic()-t0:5.1f}s  recall {rec:.2f}")

    from clusterindices_spark.operators.pq import ivfpq_topk

    t0 = time.monotonic()
    got = pairs(ivfpq_topk(emb, probes))
    rec = len(exact & got) / len(exact)
    print(f"IVF-PQ (composed)  : {len(got):4d} pairs  {time.monotonic()-t0:5.1f}s  recall {rec:.2f}")

    t0 = time.monotonic()
    g = knn_graph(emb).count()
    print(f"k-NN graph         : {g:4d} edges  {time.monotonic()-t0:5.1f}s  (all vectors probed)")

    # --- r7 tuning tables: how many cells / how much over-retrieve buys
    # how much recall (each curve costs ONE index scan) ---------------
    from clusterindices_spark.operators.pq import q_similarity_pq_expand_curve
    from clusterindices_spark.operators.similarity import (
        q_similarity_ivf_nprobe_curve,
    )

    print("== IVF recall vs n_probe_cells ==")
    for r in sorted(
        q_similarity_ivf_nprobe_curve(spark, sf_dir).collect(),
        key=lambda r: r["n_probe_cells"],
    ):
        print(f"  p={r['n_probe_cells']}: recall {r['recall']:.2f} ({r['n_hits']}/{r['n_exact']})")
    print("== PQ recall vs ADC over-retrieve ==")
    for r in sorted(
        q_similarity_pq_expand_curve(spark, sf_dir).collect(),
        key=lambda r: r["expand"],
    ):
        print(f"  expand={r['expand']}: recall {r['recall']:.2f} ({r['n_hits']}/{r['n_exact']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
