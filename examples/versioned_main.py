"""Versioned-table lifecycle CLI: create → append → CDC merge (COW) →
merge-on-read → compaction → time travel → vacuum, over the orders fixture.

    python examples/versioned_main.py <sf_dir> <table_root>
    python examples/versioned_main.py /root/testdata/sf0.001 /tmp/vt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir, root = argv

    from pyspark.sql import functions as F

    from clusterindices_spark.session import get_spark
    from clusterindices_spark.sources.fixtures import load_table
    from clusterindices_spark.sources.versioned import (
        append,
        create,
        history,
        merge_cdc,
        read_versioned,
        vacuum,
    )

    spark = get_spark("clusterindices-versioned")
    spark.sparkContext.setLogLevel("ERROR")

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    v0 = create(o.where("k % 2 = 0"), root)
    v1 = append(o.where("k % 2 = 1 AND k % 3 = 0"), root)
    changes = o.where("k % 7 = 0").select(
        "k",
        F.when(F.col("k") % 2 == 0, "D").otherwise("U").alias("op"),
        "status",
        (F.col("price") * 0.9).alias("price"),
    )
    v2 = merge_cdc(spark, root, changes, "k")
    # merge-on-read: O(changes) commit instead of a table rewrite, then a
    # scheduled compaction folds the deletes back into a plain snapshot
    from clusterindices_spark.sources.versioned import compact_mor, merge_cdc_mor

    changes2 = o.where("k % 11 = 0").select(
        "k",
        F.when(F.col("k") % 3 == 0, "D").otherwise("U").alias("op"),
        "status",
        (F.col("price") * 1.05).alias("price"),
    )
    v3 = merge_cdc_mor(spark, root, changes2, "k")
    v4 = compact_mor(spark, root)
    for v in (v0, v1, v2, v3, v4):
        n = read_versioned(spark, root, v).count()
        print(f"v{v}: {n} rows")
    assert read_versioned(spark, root, v3).count() == read_versioned(
        spark, root, v4
    ).count(), "compaction must preserve the resolved snapshot"
    print("history:", [(h["version"], h["op"]) for h in history(root)])
    print("vacuum(keep_last=2):", vacuum(root, keep_last=2, min_age_seconds=0))
    print("latest still reads:", read_versioned(spark, root).count(), "rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
