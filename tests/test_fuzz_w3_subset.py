"""Fast fuzz-gate wave-3 regression: replay the two seeds whose trials
found the round-11 divergence batches, for exactly the keys they caught,
so each fixed class regresses loudly inside the unit suite:

- seed 103000 (NaN/Inf specials in measure doubles, negative ids, NULL
  floods): the non-finite measure policy — Spark floor(NaN)=0 /
  saturated ±Inf / silent decimal-NULL vs DuckDB loud casts — across the
  integer-micro and decimal quantized families, plus the
  compute-what-you-join oracle alignment (outliers/ab_ttest moment CTEs).
- seed 103002 (specials + 2^53 ids + one:nation): the o_totalprice
  consumer family (windows, MV, SQL-native, versioned snapshots, RFM).
- seed 103001 (one:embeddings): K-sweep corpus-size guards and the
  external-agreement pair-denominator nullif (covered via
  cluster_external_agreement below; the rows-only sweeps have their own
  guards in kmeans_sweep/clusterer_sweep/gap_statistic).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF_SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

CASES = {
    103000: [
        "events_ewma_smooth",
        "events_outliers",
        "events_outliers_seasonal",
        "events_ab_ttest",
        "events_bootstrap_ci",
        "events_attribution_linear",
        "events_rollup_hierarchy",
        "events_cohort_ltv",
        "agg_stats",
        "agg_quantiles_bucketed",
        "tpch_q11",
        "tpch_q20",
        "sql_udf_inline",
    ],
    # batch 3: threshold comparisons on measure doubles — Spark's parquet
    # pushdown silently drops NaN rows for `>` where its in-memory
    # evaluator keeps them (and DuckDB keeps them); plus more quantized
    # consumers (histogram bins, MAD medians, interpolated quantiles)
    103003: [
        "scalar_struct",
        "tpch_q14",
        "agg_quantiles",
        "source_orc_roundtrip",
        "sql_interface",
        "events_histogram",
        "events_outliers_mad",
        "join_bloom_prefilter",
        "subquery_in",
        "join_full_outer",
    ],
    103002: [
        "window_frame",
        "window_range_frame",
        "agg_incremental_mv",
        "null_semantics",
        "agg_filter_clause",
        "sql_pipe_syntax",
        "sql_recursive_months",
        "analytics_rfm",
        "versioned_merge_snapshot",
        "versioned_mor_snapshot",
    ],
    103001: [
        "cluster_external_agreement",
        "kmeans_sweep_small",
        "gmm_sweep_small",
        "gap_statistic",
    ],
    # batch 4: q17's correlated-subquery oracle keeps the outer alias
    # through the finite rewrite; XML roundtrip joins the policy
    103005: [
        "tpch_q17",
        "source_xml_roundtrip",
    ],
    # batch 5/6 (targeted degenerate-position seeds): MV all-NULL group
    # sum, snapshot-diff + CSV roundtrip finite policy, 1-doc zipf OLS
    # nullif, NULL-predicate funnel counting
    103035: [
        "agg_incremental_mv",
        "versioned_snapshot_diff",
        "source_csv_roundtrip",
    ],
    103030: [
        "text_zipf_fit",
        "curation_filter_funnel",
    ],
}


@pytest.fixture(scope="module")
def fuzz_root(tmp_path_factory):
    if not os.path.isdir(REF_SF):
        pytest.skip(f"fixture dir {REF_SF} absent (schemas are mirrored)")
    from fuzz_gate import gen_trial

    root = tmp_path_factory.mktemp("fuzz_w3")
    for seed in CASES:
        gen_trial(str(root / f"fz{seed}"), seed)
    return str(root)


@pytest.mark.parametrize("seed", sorted(CASES))
def test_fuzz_w3_seed_subset_green(spark, fuzz_root, seed):
    from fuzz_gate import _explain
    from hostile_gate import run_gate

    results = run_gate([f"fz{seed}"], CASES[seed], fuzz_root, spark=spark)
    bad = [
        (key, out, detail)
        for _variant, key, out, detail, _ in results
        if out not in ("PASS", "ROWS") and not _explain(key, out, detail)
    ]
    assert bad == [], bad
