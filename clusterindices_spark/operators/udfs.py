"""Python UDF surface: scalar pandas UDF, grouped-agg pandas UDF, UDTF
(SURVEY.md §2B "UDF surface" row — completes what operators/grouped.py
started with the grouped-map tier).

Engine policy (SURVEY §4.2): core operators avoid Python UDFs — built-in
expressions are codegen'd and oracle-expressible. This module is the
sanctioned demonstration of each remaining tier for the cases SQL genuinely
can't express (model inference, scipy stats, tokenizers):

- scalar ``pandas_udf``   — Arrow-vectorized per-row math (embedding scoring)
- grouped-agg ``pandas_udf`` — one scalar per group (median, trimmed stats)
- Python UDTF (Spark 4.x) — one input row → many output rows (sentence split)

Each demo is deliberately SQL-expressible so the Arrow plumbing itself is
oracle-checked bit-exact; a real model-scoring UDF swaps the body, not the
wiring.

Determinism notes (why the bodies look the way they do):
- the scalar dot product accumulates sequentially over dims
  (``acc += x[:, i] * p[i]``) — the same left-fold order as Spark's
  ``F.aggregate`` and DuckDB's ``list_sum``, so results agree bit-for-bit
  pre-round; ``np.dot`` (pairwise/BLAS summation order) would not.
- the grouped median interpolates (a+b)/2 on even counts in both pandas and
  DuckDB — one identical fp op, bit-exact.

Scale: scalar pandas UDFs ship Arrow batches to a Python worker — ~10-100×
better than row-at-a-time UDFs but still off the codegen path; keep them out
of hot inner joins. Grouped-agg shuffles by key like any agg. UDTFs stream
row batches; output cardinality is per-row bounded (sentences per doc).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from clusterindices_spark.functions.distances import norm
from clusterindices_spark.sources.fixtures import load_table

PROBE_VEC_ID = 0  # the probe embedding both engines score against


def _seq_dot(mat: np.ndarray, vec: np.ndarray) -> np.ndarray:
    """Row-wise dot(mat, vec) with a sequential left-fold over dims —
    matches F.aggregate / list_sum summation order (bit-exact oracles)."""
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for i in range(mat.shape[1]):
        acc += mat[:, i] * vec[i]
    return acc


def q_udf_scalar_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow pandas UDF: cosine of every embedding vs a fixed probe
    vector (the shape of batch model scoring / query-vector search)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = np.array(
        emb.where(F.col("vec_id") == PROBE_VEC_ID)
        .select("embedding")
        .first()[0],
        dtype=np.float64,
    )
    probe_norm = float(np.sqrt(_seq_dot(probe.reshape(1, -1), probe)[0]))

    @pandas_udf("double")
    def cos_vs_probe(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy())
        dots = _seq_dot(mat, probe)
        norms = np.sqrt(_seq_dot(mat * mat, np.ones(mat.shape[1])))
        return pd.Series(dots / (norms * probe_norm))

    return (
        emb.where(F.col("vec_id") != PROBE_VEC_ID)
        .select(
            "vec_id", F.round(cos_vs_probe(F.col("embedding")), 6).alias("cos_probe")
        )
    )


def q_udf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: per-label median embedding norm. One scalar
    per group via Arrow — the tier for stats Spark lacks as builtins."""
    emb = load_table(spark, sf_dir, "embeddings")

    @pandas_udf("double")
    def median_agg(v: pd.Series) -> float:
        return float(v.median())

    # Spark refuses to mix grouped-agg pandas UDFs with built-in aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a
    # pandas agg too.
    @pandas_udf("long")
    def count_agg(v: pd.Series) -> int:
        return int(v.size)

    return (
        emb.select("label", norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            count_agg(F.col("nrm")).alias("n"),
            F.round(median_agg(F.col("nrm")), 6).alias("median_norm"),
        )
    )


@udtf(returnType="sent_idx int, sentence string, n_tokens int")
class SplitSentences:
    """UDTF: one document row → one row per sentence (split on [.!?]+,
    trimmed, empties dropped) with a whitespace token count."""

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for raw in re.split(r"[.!?]+", text):
            s = raw.strip()
            if not s:
                continue
            yield idx, s, len(s.split())
            idx += 1


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: explode documents into sentences.
    The table-function tier — one input row, variable output rows."""
    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_tokens
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )


QUERIES = {
    "udf_scalar_cosine": q_udf_scalar_cosine,
    "udf_grouped_agg_median": q_udf_grouped_agg_median,
    "udtf_sentences": q_udtf_sentences,
}

ORACLES = {
    "udf_scalar_cosine": f"""
WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
probe AS (SELECT x AS p FROM pts WHERE vec_id = {PROBE_VEC_ID})
SELECT a.vec_id,
       ROUND(list_sum(list_transform(range(len(a.x)), i -> a.x[i+1] * probe.p[i+1]))
             / (sqrt(list_sum(list_transform(a.x, v -> v * v)))
                * sqrt(list_sum(list_transform(probe.p, v -> v * v)))), 6) AS cos_probe
FROM pts a CROSS JOIN probe
WHERE a.vec_id <> {PROBE_VEC_ID}
""",
    "udf_grouped_agg_median": """
WITH pts AS (
  SELECT label,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), v -> v * v))) AS nrm
  FROM embeddings
)
SELECT label, COUNT(*) AS n, ROUND(median(nrm), 6) AS median_norm
FROM pts GROUP BY label
""",
    "udtf_sentences": r"""
WITH sents AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(text, '[.!?]+'), s -> trim(s)),
           s -> s <> ''
         ) AS ss
  FROM documents
)
SELECT doc_id,
       CAST(unnest(range(len(ss))) AS INT) AS sent_idx,
       unnest(ss) AS sentence,
       CAST(len(list_filter(regexp_split_to_array(unnest(ss), '\s+'), t -> t <> ''))
            AS INT) AS n_tokens
FROM sents
""",
}
