"""Central registry assembling queries() / oracle_sql() from operator modules.

Each operator module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL). A key present in QUERIES but
absent from ORACLES gets the driver's weaker rows-only check (reserved for
inherently approximate / iterative / streaming ops — SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Order matters: the driver's per-round correctness gate checks the first
# ~50 queries() keys per round. Rounds 1+2 drove 88 distinct keys green;
# _FRONT (below) lists the keys that still need a driver row — the 47 keys
# the driver never reached plus the 3 keys that ERR'd in r2 on list-typed
# output (now emitting sortable strings) — so round 3's window covers
# exactly the remaining gap. _NEXT then queues every round-3 addition
# (all locally verified bit-exact at 3 SFs; see reports/oracle_local_r3*)
# as the head of round 4's window. Keys outside both keep module order.
_MODULES = [
    "clusterindices_spark.operators.indices",
    "clusterindices_spark.operators.validity",
    "clusterindices_spark.operators.assignment",
    "clusterindices_spark.operators.sweep",
    "clusterindices_spark.operators.dedup",
    "clusterindices_spark.operators.similarity",
    "clusterindices_spark.operators.pq",
    "clusterindices_spark.operators.textops",
    "clusterindices_spark.operators.multimodal",
    "clusterindices_spark.operators.embeddings",
    "clusterindices_spark.operators.udfs",
    "clusterindices_spark.operators.sessions",
    "clusterindices_spark.operators.curation",
    "clusterindices_spark.operators.analytics",
    "clusterindices_spark.operators.relational",
    "clusterindices_spark.operators.tpch",
    "clusterindices_spark.operators.relational_ext",
    "clusterindices_spark.operators.sql_features",
    "clusterindices_spark.sources.pysource",
    "clusterindices_spark.sources.versioned",
    "clusterindices_spark.sql",
]

# Round-3 driver-window priority: every key without a green driver row after
# rounds 1+2 (CORRECTNESS_r01 ∪ CORRECTNESS_r02; see VERDICT.md r2 "Next
# round" #1-2). Exactly 50 keys = the driver's per-round check budget.
_FRONT = [
    # r2 driver-ERR trio, re-emitted as sortable strings this round
    "embedding_normalize",
    "embedding_quantize_int8",
    "multimodal_resize",
    # UDF tier remainder
    "udf_grouped_agg_median",
    "udtf_sentences",
    "udf_cogrouped_asof",
    # streaming batch-twins + session analytics
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_windows",
    "stream_dedup",
    "stream_join_clicks",
    "events_funnel",
    "events_retention",
    # curation surface
    "curation_split",
    "curation_pack_greedy",
    "curation_pipeline",
    "curation_sample_stratified",
    "curation_sample_topk",
    "curation_mixture_interleave",
    "curation_decontaminate",
    # analytics / data-quality surface
    "profile_orders",
    "events_histogram",
    "events_outliers",
    "events_outliers_mad",
    "events_path_trigrams",
    # TPC-H shapes the driver never reached
    "tpch_q2",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    # relational_ext remainder
    "null_semantics",
    "join_interval_binned",
    "merge_upsert_cdc",
    "agg_cube",
    "subquery_in",
    "window_distribution",
    "explode_lateral",
    "sequence_dates",
    "cond_expr",
    "distinct_latest",
    "string_distance",
    "scalar_map",
    "window_range_frame",
    "scalar_array_set",
    "join_full_outer",
    "window_fill_forward",
    # SQL entry point
    "sql_interface",
]

# Immediately after the 50-slot window: new round-3 keys that should be the
# FIRST to get driver rows if the window is wider than 50 (and the head of
# round 4's window otherwise).
_NEXT = [
    "multimodal_decode_real",
    "text_pii_scrub",
    "agg_quantiles",
    "similarity_knn_graph",
    "agg_quantiles_approx",
    "analytics_rfm",
    "events_markov_transition",
    "basket_pair_lift",
    "dedup_graph_pagerank",
    "similarity_ann_ivfpq",
    # round-3b: validity-surface widening (operators/validity.py)
    "wemmert_gancarski",
    "sd_index",
    "s_dbw",
    "c_index",
    "cluster_agreement_ext",
    "dedup_span_coverage",
    # Spark 4 SQL features (operators/sql_features.py)
    "sql_recursive_months",
    "scalar_variant",
    # round-3c: weighted sampling + corpus vocab profile + Python source
    "curation_sample_weighted",
    "text_vocab_stats",
    "source_python_datasource",
    "versioned_merge_snapshot",
    "text_bigram_logprob",
    "pair_validity",
    "events_outliers_seasonal",
    "dedup_graph_hops",
    "multimodal_dhash",
    "events_cohort_ltv",
    "dedup_ngram_containment",
    "multimodal_audio_fingerprint",
    "events_funnel_latency",
    # iterative ML — rows-only
    "bisecting_sweep_small",
    "gmm_sweep_small",
    "gap_statistic",
]


def _load():
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query keys {dup} from {modname}")
        unknown = set(o) - set(q)
        if unknown:
            raise ValueError(f"{modname} has oracle SQL for unknown keys {unknown}")
        queries.update(q)
        oracles.update(o)
    head = _FRONT + [k for k in _NEXT if k not in _FRONT]
    missing = [k for k in head if k not in queries]
    if missing:
        raise ValueError(f"_FRONT/_NEXT name unknown keys {missing}")
    if len(head) != len(set(head)):
        raise ValueError("_FRONT has duplicate keys")
    ordered = {k: queries[k] for k in head}
    ordered.update((k, v) for k, v in queries.items() if k not in ordered)
    return ordered, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
