"""Fast hostile-gate subset: a dozen representative keys through all
three adversarial fixture variants inside the unit suite, so the
divergence classes fixed in round 9 (NULL ordering, NULL join keys,
empty-input guards, JSON validity, int64 id collapse) regress loudly
without waiting for the full 846-cell sweep (tools/hostile_gate.py,
the round-close step).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF_SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

# one key per fixed divergence class, all cheap at hostile fixture scale
KEYS = [
    "tpch_q1",               # baseline relational
    "tpch_q9",               # divide-by-zero guard
    "agg_stats",             # single-row-group moments
    "window_frame",          # NULLS LAST window ordering
    "scalar_math",           # ln/sqrt domain guards + int64 div
    "scalar_json",           # malformed-JSON validity guard
    "scalar_struct",         # BIGINT keys + NULL-field struct MAX
    "events_ewma_smooth",    # NULL-ts bucket ordering + zero denominator
    "stream_dedup",          # NULL-ts must not win "earliest" (r10)
    "window_fill_forward",   # NULL-ts fill position (r10)
    "stream_session_windows",  # NULL-ts phantom session (r10)
    "events_cusum",          # NULL hour bucket prefix position (r10)
    "dedup_chunk_exact",     # NULL-source group (NULL join keys)
    "udf_cogrouped_asof",    # odd ids past 2^53 through pandas
    "cluster_chi2",          # NULL vector/label contract + quantized argmin
    "agg_quantiles_bucketed",  # non-null statistics semantics
    "embedding_normalize",   # NULL-vector rendering
]


@pytest.fixture(scope="module")
def hostile_root(tmp_path_factory):
    if not os.path.isdir(REF_SF):
        pytest.skip(f"fixture dir {REF_SF} absent (schemas are mirrored)")
    import hostile_fixtures as hf

    root = tmp_path_factory.mktemp("hostile")
    for name, fn in (("empty", hf.gen_empty), ("edge", hf.gen_edge),
                     ("bigid", hf.gen_bigid)):
        fn(str(root / name))
    return str(root)


@pytest.mark.slow  # second tier (VERDICT r13 item 2); round-close runs both
def test_hostile_subset_all_green(spark, hostile_root):
    from hostile_gate import ALLOW, run_gate

    results = run_gate(["empty", "edge", "bigid"], KEYS, hostile_root,
                       spark=spark)
    bad = [
        (variant, key, out, detail)
        for variant, key, out, detail, _ in results
        if out not in ("PASS", "ROWS") and (variant, key) not in ALLOW
    ]
    assert bad == [], bad
