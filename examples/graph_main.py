"""Near-dup graph CLI: the full graph layer over one candidate pipeline.

    python examples/graph_main.py <sf_dir>
    python examples/graph_main.py /root/testdata/sf0.001

Stages (each a shipped operator; the exploded-shingle cache is shared,
so the candidate pipeline runs once):
1. candidate pairs   — exact n-gram Jaccard over stop-capped shingles
2. triangle census   — transitivity: are the pairs cliques or chains?
3. components        — min-label propagation collapse (+ star variant check)
4. PageRank          — which canonical doc is the hub of its cluster
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

    from clusterindices_spark.operators.dedup import (
        connected_components,
        connected_components_star,
        graph_pagerank,
        ngram_jaccard_pairs,
        triangle_census,
        _doc_pair_edges,
    )
    from clusterindices_spark.session import get_spark
    from clusterindices_spark.sources.fixtures import load_table

    spark = get_spark("graph-example")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    t0 = time.monotonic()
    pairs = ngram_jaccard_pairs(d)
    n_pairs = pairs.count()
    print(f"candidate pairs : {n_pairs:6d}        {time.monotonic()-t0:5.1f}s")

    t0 = time.monotonic()
    census = triangle_census(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    ).first()
    print(
        f"triangle census : {census['n_triangles']:6d} tri    "
        f"{time.monotonic()-t0:5.1f}s  transitivity {census['transitivity']}"
    )

    nodes, edges = _doc_pair_edges(spark, sf_dir)
    t0 = time.monotonic()
    comp = connected_components(nodes, edges)
    n_comp = comp.select("component").distinct().count()
    print(f"components      : {n_comp:6d} comps  {time.monotonic()-t0:5.1f}s")
    star = connected_components_star(nodes, edges)
    agree = (
        comp.join(star.withColumnRenamed("component", "c2"), "node")
        .where(F.col("component") != F.col("c2"))
        .count()
    )
    print(f"star agreement  : {'OK' if agree == 0 else f'{agree} DISAGREE'}")

    t0 = time.monotonic()
    pr = graph_pagerank(nodes, edges)
    top = pr.orderBy(F.col("pr_units").desc(), "node").limit(3).collect()
    print(f"pagerank        : top {[(r['node'], r['pr']) for r in top]}  {time.monotonic()-t0:5.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
