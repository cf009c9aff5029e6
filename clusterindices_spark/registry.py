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
# ~50 queries() keys per round. Rounds 1-3 drove 126 distinct keys green.
# Round-4 _FRONT (below) = the 2 keys that ERR'd in r3 on list-typed output
# (scalar_map / scalar_array_set — now emitting comma-joined STRING cells,
# VERDICT r3 item 1), then the 28 oracle-backed keys the driver has never
# reached (r3's _NEXT minus the 6 rows-only keys, which would burn driver
# slots as err:"no_oracle"), then 20 re-confirmations of stable r1/r2 greens
# to fill the 50-slot window. _NEXT queues round-4 additions for round 5's
# window. Rows-only keys (approx/iterative ML) stay behind slot 50
# permanently. Keys outside both lists keep module order.
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
    "clusterindices_spark.operators.sketches",
    "clusterindices_spark.operators.skew",
    "clusterindices_spark.operators.sql_features",
    "clusterindices_spark.sources.pysource",
    "clusterindices_spark.sources.readers",
    "clusterindices_spark.sources.versioned",
    "clusterindices_spark.sql",
]

# Round-10 driver-window priority (VERDICT r9 "Next round" #3 — rotate
# mechanically from the r9 _NEXT queue). Exactly 50 keys: the 2 keys whose
# OPERATORS changed in r10 (advice fixes: udf_cogrouped_asof's NULL-ts
# as-of handling, curation_anneal_mixture's zero-token schedule) lead so
# their latest driver rows postdate the fixes; then the remaining 44
# r9-touched oracle-backed keys queued by r9's _NEXT (hostile-gate fix
# paths — every one re-gated green at sf0.01+sf0.1 and through the
# 846-cell sweep in r9); then 4 stalest stable greens (latest driver rows
# from r2) to fill the window. The r10 similarity/pq advice fixes touch
# only rows-only ANN keys (placeholder dim, fit-sample pmod), which never
# burn driver slots — their guards are tests/test_r10_fixes.py.
_FRONT = [
    # r10-fixed operators — driver rows must postdate the fixes
    "udf_cogrouped_asof",       # NULL-ts click/purchase as-of semantics
    "curation_anneal_mixture",  # zero-token NULL schedule parity
    # the 44 remaining r9-touched oracle-backed keys (r9 _NEXT order)
    "dedup_chunk_exact",        # NULL-source group fix + plan change
    "scalar_struct",            # BIGINT keys + NULL-balance MAX
    "scalar_json",
    "scalar_map",
    "scalar_math",              # ln/sqrt domain guards
    "scalar_array_set",
    "scalar_url_parse",
    "window_frame",
    "window_distribution",
    "agg_stats",
    "agg_equidepth_histogram",
    "agg_quantiles_bucketed",
    "scd2_status_intervals",
    "events_ewma_smooth",
    "events_rolling_zscore",
    "events_changepoint_loc",
    "events_survival_km",
    "events_cuped",             # tightened aggregate bound (doc-only)
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "tpch_q9",
    "curation_mixture_interleave",
    "udtf_sentences",
    "udf_scalar_cosine",
    "text_scrub_blocklist",
    "embedding_normalize",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "embedding_dim_covariance",
    "assign_nearest_centroid",
    "cluster_label_contingency",
    "cluster_chi2",
    "cluster_external_agreement",
    "cluster_agreement_ext",
    "ratkowsky_lance",
    "c_index",
    "pair_validity",
    "dedup_graph_pagerank",
    "text_bpe_train_merges",
    "multimodal_meta",
    "multimodal_bytes_arrow",
    "multimodal_audio_window",
    "multimodal_audio_fingerprint",
    "multimodal_type_routing",
    # stalest stable greens (latest driver rows r2) — window fill
    "bd_dunn",
    "davies_bouldin",
    "wssse",
    "calinski_harabasz",
]

# Immediately after the 50-slot window: the r11 rotation queue. Round 10
# added no keys (VERDICT r9 #7: gap-closers only), so _NEXT continues the
# stalest-green re-confirmation ladder — oracle-backed keys whose latest
# driver rows date to r2, oldest first (derived from CORRECTNESS_r01–r09
# latest-round-per-key). Any r10half/r11 operator fix should be PREPENDED
# here so its post-fix driver row lands in the next window.
_NEXT: list[str] = [
    # r10½ randomized-fuzz-gate fixes (tools/fuzz_gate.py seed 101001:
    # NULL group keys, pmod-vs-% oracles, engine error asymmetries,
    # fold_upper, CSV NULL sentinel) — post-fix driver rows first in the
    # r11 window; gate-SF outputs are bit-equal (well-formed fixtures)
    # but the discipline stands. udf_cogrouped_asof, scalar_url_parse,
    # embedding_random_projection, multimodal_type_routing already sit
    # in _FRONT, so their post-fix rows land this round.
    "agg_incremental_mv",
    "agg_weighted_median",
    "agg_bool_modal",
    "curation_pack_greedy",
    "curation_sample_weighted",
    "curation_waterfill_budget",
    "curation_source_lang_mix",
    "join_salted_skew",
    "scalar_bitwise",
    "scalar_string",
    "source_csv_roundtrip",
    "multimodal_decode_real",
    "multimodal_audio_silence",
    # nine late-r10 NULL-semantics fixes (hostile edge detectors) —
    # post-fix driver rows first in the r11 window; gate-SF outputs are
    # bit-equal (NULL-free fixtures) but the discipline stands.
    # agg_quantiles_bucketed (the tenth) already sits in _FRONT.
    "events_path_trigrams",
    "events_power_mde",
    "stream_dedup",
    "window_fill_forward",
    "stream_session_windows",
    "events_user_lifecycle",
    "events_cusum",
    "window_interval_merge",
    "xie_beni",
    "silhouette_sqeuclid",
    "index_suite_ext",
    "text_tfidf_topterms",
    "text_fingerprint",
    "text_token_count",
    "text_unigram_logprob",
    "text_repetition_stats",
    "multimodal_frame_sample",
    "embedding_centroid_drift",
    "multimodal_resize",
    "udf_grouped_agg_median",
    "stream_join_clicks",
    "events_retention",
    "curation_split",
    # curation_pack_greedy moved to the r10½ fuzz-fix head above
    "curation_pipeline",
    "curation_sample_stratified",
    "curation_sample_topk",
    "profile_orders",
    "events_histogram",
    "events_outliers",
    "events_outliers_mad",
    "tpch_q2",
    "tpch_q8",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    "null_semantics",
    "join_interval_binned",
    "merge_upsert_cdc",
    "agg_cube",
    "subquery_in",
    "explode_lateral",
    "sequence_dates",
    "cond_expr",
    "distinct_latest",
    "string_distance",
    "window_range_frame",
    "join_full_outer",
    "join_range",
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
    # middle: everything else in module order, but rows-only keys (derived:
    # any key with no oracle SQL) sink to the very end so a wider driver
    # window still hits oracle-backed keys first (VERDICT r6 wrong #3: the
    # old hand-named _ROWS_ONLY_TAIL covered 3 of 19 — now fully derived)
    rows_only_last = {k for k in queries if k not in oracles}
    ordered.update(
        (k, v)
        for k, v in queries.items()
        if k not in ordered and k not in rows_only_last
    )
    ordered.update(
        (k, v) for k, v in queries.items() if k not in ordered
    )
    return ordered, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
