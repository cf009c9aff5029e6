"""Embedding-column operators (task north star: multimodal / vector columns
at 100 TB). Pure higher-order-function expressions — JVM codegen, no UDFs —
so they are oracle-checkable and run at scan speed.

- embedding_normalize   : L2 unit-normalize each vector (the precursor to
  cosine ANN — normalized vectors make cosine a dot product).
- embedding_quantize_int8: per-vector affine int8 quantization (min/max →
  scale/offset). At 100 TB this is the storage play: 64 float32 dims → 64
  bytes + 2 floats, a 4× reduction before ANN indexing. Quantization uses
  floor(x + 0.5) instead of round() because round()'s half-case convention
  differs across engines (Spark HALF_UP vs DuckDB HALF_EVEN) while floor is
  universal.

Both queries emit per-element rounded arrays; the driver's value-hash covers
full array contents, so these are strong cross-engine checks of the HOF
pipeline (transform/aggregate/zip_with ↔ list_transform/list_sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clusterindices_spark.functions.distances import norm
from clusterindices_spark.sources.fixtures import load_table


def q_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    n = norm(x)
    return emb.select(
        "vec_id",
        F.transform(x, lambda v: F.round(v / F.nullif(n, F.lit(0.0)), 6)).alias(
            "unit"
        ),
        F.round(n, 6).alias("l2_norm"),
    )


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    mn = F.array_min(x)
    mx = F.array_max(x)
    scale = F.nullif(mx - mn, F.lit(0.0))
    q = F.transform(
        x,
        lambda v: (
            F.floor((v - mn) / scale * F.lit(255.0) + F.lit(0.5)) - F.lit(128)
        ).cast("int"),
    )
    return emb.select(
        "vec_id",
        q.alias("qvec"),
        F.round(mn, 6).alias("q_min"),
        F.round(mx, 6).alias("q_max"),
    )


def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitoring: per-label centroid shift between two deterministic
    halves of the data (vec_id parity stands in for the before/after
    snapshots a production monitor compares). Emits per-label counts and
    the L2 distance between the half-centroids — the alarm signal when an
    upstream embedding model or corpus mix changes.

    Scale: two branches of one scan, each the centroids_of shuffle
    (K×dim×partitions records after map-side combine), then a K-row join —
    broadcastable end to end."""
    from clusterindices_spark.functions.distances import l2
    from clusterindices_spark.operators.indices import centroids_of

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").alias("cluster"), F.col("embedding").alias("x")
    )
    half_a = emb.where(F.col("vec_id") % 2 == 0)
    half_b = emb.where(F.col("vec_id") % 2 == 1)
    ca = centroids_of(half_a).select(
        F.col("cluster").alias("label"), F.col("centroid").alias("c_a")
    )
    cb = centroids_of(half_b).select(
        F.col("cluster").alias("label"), F.col("centroid").alias("c_b")
    )
    na = half_a.groupBy(F.col("cluster").alias("label")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    nb = half_b.groupBy(F.col("cluster").alias("label")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    return (
        ca.join(cb, "label")
        .join(F.broadcast(na), "label")
        .join(F.broadcast(nb), "label")
        .select(
            "label",
            "n_a",
            "n_b",
            F.round(l2("c_a", "c_b"), 6).alias("drift"),
        )
    )


QUERIES = {
    "embedding_normalize": q_embedding_normalize,
    "embedding_quantize_int8": q_embedding_quantize_int8,
    "embedding_centroid_drift": q_embedding_centroid_drift,
}

_X = "CAST(embedding AS DOUBLE[])"
_NORM = f"sqrt(list_sum(list_transform({_X}, v -> v * v)))"

ORACLES = {
    "embedding_normalize": f"""
SELECT vec_id,
       list_transform({_X}, v -> ROUND(v / NULLIF({_NORM}, 0.0), 6)) AS unit,
       ROUND({_NORM}, 6) AS l2_norm
FROM embeddings
""",
    "embedding_quantize_int8": f"""
SELECT vec_id,
       list_transform({_X},
         v -> CAST(FLOOR((v - list_min({_X})) / NULLIF(list_max({_X}) - list_min({_X}), 0.0)
                         * 255.0 + 0.5) AS INT) - 128) AS qvec,
       ROUND(CAST(list_min({_X}) AS DOUBLE), 6) AS q_min,
       ROUND(CAST(list_max({_X}) AS DOUBLE), 6) AS q_max
FROM embeddings
""",
    "embedding_centroid_drift": f"""
WITH pts AS (
  SELECT vec_id, label, {_X} AS x, vec_id % 2 AS half FROM embeddings
),
dimvals AS (
  SELECT label, half, unnest(range(len(x))) AS dim, unnest(x) AS val FROM pts
),
cent AS (
  SELECT label, half, dim, AVG(val) AS m
  FROM dimvals GROUP BY label, half, dim
),
cv AS (
  SELECT label, half, list(m ORDER BY dim) AS c
  FROM cent GROUP BY label, half
),
counts AS (
  SELECT label, half, COUNT(*) AS n FROM pts GROUP BY label, half
)
SELECT a.label,
       (SELECT n FROM counts WHERE label = a.label AND half = 0) AS n_a,
       (SELECT n FROM counts WHERE label = a.label AND half = 1) AS n_b,
       ROUND(list_distance(a.c, b.c), 6) AS drift
FROM cv a JOIN cv b ON a.label = b.label AND a.half = 0 AND b.half = 1
""",
}
