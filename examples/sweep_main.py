"""Reference-parity CLI (ClusterIndices' Main program UX): sweep K over a
range on a dataset, compute all four validity indices per K, write the
results table as a single CSV.

    spark-submit examples/sweep_main.py <sf_dir> <k_min> <k_max> <out_dir>
    python examples/sweep_main.py /root/testdata/sf0.001 2 15 /tmp/sweep_out

<sf_dir> must contain embeddings.parquet (vec_id, embedding ARRAY<FLOAT|DOUBLE>,
label INT) — the engine's vector-table shape (FIXTURES.md). Output columns:
k, bd_silhouette, bd_dunn, davies_bouldin, wssse, time_s.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if len(argv) != 4:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir, k_min, k_max, out_dir = argv[0], int(argv[1]), int(argv[2]), argv[3]

    from clusterindices_spark.operators.sweep import kmeans_sweep, write_results_csv
    from clusterindices_spark.session import get_spark

    spark = get_spark("clusterindices-sweep")
    spark.sparkContext.setLogLevel("WARN")
    results = kmeans_sweep(spark, sf_dir, k_min=k_min, k_max=k_max)
    write_results_csv(results, out_dir)
    for row in results.collect():
        print(
            f"k={row['k']:>3}  bd_silhouette={row['bd_silhouette']:>10.6f}  "
            f"bd_dunn={row['bd_dunn']:>10.6f}  "
            f"davies_bouldin={row['davies_bouldin']:>10.6f}  "
            f"wssse={row['wssse']:>14.6f}  time_s={row['time_s']:.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
