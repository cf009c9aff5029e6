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
- cogrouped-map ``applyInPandas`` — two keyed inputs per call (as-of merge)

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
    # NULL-vector contract (r9 hostile gate): rows without vectors are
    # excluded on BOTH sides (np.stack crashes on None; the oracle pts CTE
    # filters identically)
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    probe_row = (
        emb.where(F.col("vec_id") == PROBE_VEC_ID).select("embedding").first()
    )
    if probe_row is None:
        # no probe vector in this corpus: the oracle's probe CTE is empty,
        # so its cross join yields 0 rows — return the same empty frame
        # instead of crashing on first()[0] (r9 hostile empty/bigid gate)
        return emb.where(F.lit(False)).select(
            "vec_id", F.lit(None).cast("double").alias("cos_probe")
        )
    probe = np.array(probe_row[0], dtype=np.float64)
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
    space-trimmed, empties dropped) with a whitespace token count.

    Trim is SPACE-only — strip(' ') not strip() — pinned to the oracle's
    DuckDB ``trim()``, which removes spaces only; Python's default strip
    would also eat tabs/newlines and diverge on any non-space whitespace."""

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for raw in re.split(r"[.!?]+", text):
            s = raw.strip(" ")
            if not s:
                continue
            # ASCII-whitespace split (NOT str.split(): Python treats \xa0
            # and friends as whitespace, but Java's and RE2's \s are
            # ASCII-only — the engines' tokenizers both keep NBSP-joined
            # words as one token; r9 hostile edge)
            yield idx, s, len(
                [t for t in re.split(r"[ \t\n\x0b\f\r]+", s) if t]
            )
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


_ASOF_SCHEMA = (
    "user_id bigint, purchase_id bigint, purchase_ms bigint, "
    "click_id bigint, click_ms bigint"
)


def _attach_clicks(purch: pd.DataFrame, clk: pd.DataFrame) -> pd.DataFrame:
    """Per-user as-of attribution via pandas.merge_asof. Tie-break: both
    frames sorted by (ms, event_id) and merge_asof takes the LAST right row
    with click_ms ≤ purchase_ms, i.e. max click_ms then max click_id —
    exactly the oracle's ORDER BY click_ms DESC, click_id DESC."""
    cols = ["user_id", "purchase_id", "purchase_ms", "click_id", "click_ms"]
    if purch.empty:
        return pd.DataFrame({c: pd.Series([], dtype="Int64") for c in cols})
    # Catalyst prunes cogroup INPUT columns when the plan consumes none of
    # the output data columns (e.g. a bare count()): the non-driving side
    # arrives as key-only. Output cardinality is one row per purchase either
    # way, so a key-only clicks frame is equivalent to an empty one here —
    # the attribution values it can't produce are exactly the columns the
    # consumer pruned.
    if "ms" not in purch.columns:
        # key-only PURCHASES side (same pruning, driving side): cardinality
        # is the contract — one output row per purchase — so emit NA values
        # for every pruned column
        return pd.DataFrame(
            {
                "user_id": purch["user_id"],
                **{
                    c: pd.Series([pd.NA] * len(purch), dtype="Int64")
                    for c in cols[1:]
                },
            }
        )[cols]
    if "ms" not in clk.columns:
        clk = clk.iloc[0:0].assign(ms=pd.Series([], dtype="int64"),
                                   event_id=pd.Series([], dtype="int64"))
    # NULL-user group: Spark's cogroup keys NULL like a regular value (so
    # NULL-user purchases and NULL-user clicks land in ONE group here), but
    # the oracle's equi-join predicate `c.user_id = p.user_id` never
    # matches NULL — the purchases keep their rows (LEFT JOIN), the clicks
    # must not participate at all. Caught by the randomized differential
    # gate (tools/fuzz_gate.py seed 101000: big-id regime + NULL-user
    # flood); the fixed hostile fixtures never drew this combination.
    if purch["user_id"].isna().any():
        clk = clk.iloc[0:0]
    p = purch.sort_values(["ms", "event_id"]).rename(
        columns={"event_id": "purchase_id", "ms": "purchase_ms"}
    )
    # NULL-ts purchases arrive as NaN (float64 column): pin to nullable
    # Int64 here so every return path hands Arrow a proper NA instead of
    # an unsafe NaN->bigint cast
    p["purchase_ms"] = p["purchase_ms"].astype("Int64")
    if clk.empty:
        p["click_id"] = pd.Series([pd.NA] * len(p), dtype="Int64")
        p["click_ms"] = pd.Series([pd.NA] * len(p), dtype="Int64")
        return p[cols]
    c = (
        clk.sort_values(["ms", "event_id"])
        .rename(columns={"event_id": "click_id", "ms": "click_ms"})
        .drop(columns=["user_id"])
    )
    # NULL-ts clicks arrive as NaN ms (Arrow nulls make the column
    # float64). NaN sorts LAST, and NaN->int64 is undefined (numpy yields
    # INT64_MIN) — so without this drop the searchsorted array ends with
    # INT64_MIN (unsorted) and every purchase silently attributes to the
    # NULL-ts click. The oracle's `click_ms <= purchase_ms` never matches
    # NULL, so these rows must not participate at all.
    c = c[c["click_ms"].notna()]
    if c.empty:
        p["click_id"] = pd.Series([pd.NA] * len(p), dtype="Int64")
        p["click_ms"] = pd.Series([pd.NA] * len(p), dtype="Int64")
        return p[cols]
    # int64-exact as-of: pd.merge_asof fills unmatched rows with NaN, which
    # forces the WHOLE click column to float64 — odd ids past 2^53 round to
    # the nearest even (9007199254741103 -> ...104) and the later
    # astype("Int64") locks the corruption in. The r9 hostile bigid gate
    # caught it; searchsorted on raw int64 arrays never leaves integers
    # (tests/test_r9_fixes.py plants the exact id).
    import numpy as np

    cms = c["click_ms"].to_numpy(dtype="int64")
    cid = c["click_id"].to_numpy(dtype="int64")
    # NULL-ts purchases (NaN after Arrow) are unmatched by the oracle's
    # NULL-never-compares predicate: mask them out of the search instead
    # of letting NaN->int64 cast garbage drive the lookup, and surface
    # purchase_ms itself as a proper NA (not an unsafe NaN->bigint cast
    # at the Arrow boundary).
    pvalid = p["purchase_ms"].notna().to_numpy()
    pms = p["purchase_ms"].fillna(0).to_numpy(dtype="int64")
    idx = (
        np.searchsorted(cms, pms, side="right") - 1
    )  # last click_ms <= purchase_ms; ties resolved by sort order
    matched = pvalid & (idx >= 0)
    take = np.clip(idx, 0, None)
    out = p.copy()
    out["click_id"] = pd.arrays.IntegerArray(cid[take], mask=~matched)
    out["click_ms"] = pd.arrays.IntegerArray(cms[take], mask=~matched)
    return out[cols]


def q_udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map ``applyInPandas`` — the fourth Pandas API tier (two
    keyed inputs, one pandas call per key): attribute every purchase to the
    user's latest click at-or-before it. Same attribution semantics as the
    DataFrame-native join_asof / stream_join_clicks family, so the cogroup
    Arrow plumbing itself is oracle-checked bit-exact (ms-grain timestamps:
    events.ts is ns parquet — unix_millis ↔ epoch_ms is the portable grain).

    Scale: cogroup shuffles BOTH sides once, partitioned by user_id, and
    hands each key's two frames to one task — memory bounds by the largest
    single key (not partition), and the per-key merge is O(n log n)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ms"),
        "event_type",
    )
    purchases = e.where(F.col("event_type") == "purchase").drop("event_type")
    clicks = e.where(F.col("event_type") == "click").drop("event_type")
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(_attach_clicks, _ASOF_SCHEMA)
    )


QUERIES = {
    "udf_scalar_cosine": q_udf_scalar_cosine,
    "udf_grouped_agg_median": q_udf_grouped_agg_median,
    "udtf_sentences": q_udtf_sentences,
    "udf_cogrouped_asof": q_udf_cogrouped_asof,
}

ORACLES = {
    "udf_scalar_cosine": f"""
WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
             FROM embeddings WHERE embedding IS NOT NULL),
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
    "udf_cogrouped_asof": """
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events
),
p AS (SELECT user_id, event_id AS purchase_id, ms AS purchase_ms
      FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS click_id, ms AS click_ms
      FROM e WHERE event_type = 'click')
SELECT user_id, purchase_id, purchase_ms, click_id, click_ms FROM (
  SELECT p.user_id, p.purchase_id, p.purchase_ms, c.click_id, c.click_ms,
         row_number() OVER (PARTITION BY p.user_id, p.purchase_id
                            ORDER BY c.click_ms DESC, c.click_id DESC) AS rn
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id AND c.click_ms <= p.purchase_ms
) WHERE rn = 1
""",
}
