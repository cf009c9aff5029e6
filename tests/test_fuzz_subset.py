"""Fast fuzz-gate regression: replay the seed whose trial found the
round-10½ divergence batch (tools/fuzz_gate.py seed 101001 — negative-id
regime with NULL floods) through the Spark-vs-DuckDB differential for
exactly the keys it caught, so each fixed class regresses loudly inside
the unit suite:

- NULL group keys split/dropped by equi-joins (incremental_mv,
  weighted_median, source_lang_mix)
- NULL-vs-value tie-breaks in struct argmax (bool_modal, source_lang_mix)
- oracle sign-preserving % against Spark pmod / Python % partition ids
  (pack_greedy, sample_weighted, salted_skew, multimodal synth parity)
- DuckDB hard errors Spark tolerates (left-shift negative, ln of
  negative, invalid URL under ANSI)
- NULLS FIRST/LAST rank-window order (waterfill_budget)
- ICU-vs-simple UPPER casemap (scalar_string 'ß')
- CSV NULL/'' conflation on roundtrip (source_csv_roundtrip)
- hardcoded corpus dim (embedding_random_projection at dim 16)
- NULL-user cogroup attribution (udf_cogrouped_asof)
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF_SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

SEED = 101001

KEYS = [
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
    "scalar_url_parse",
    "source_csv_roundtrip",
    "embedding_random_projection",
    "multimodal_decode_real",
    "multimodal_audio_silence",
    "udf_cogrouped_asof",
]


@pytest.fixture(scope="module")
def fuzz_root(tmp_path_factory):
    if not os.path.isdir(REF_SF):
        pytest.skip(f"fixture dir {REF_SF} absent (schemas are mirrored)")
    from fuzz_gate import gen_trial

    root = tmp_path_factory.mktemp("fuzz")
    gen_trial(str(root / f"fz{SEED}"), SEED)
    return str(root)


def test_fuzz_seed_101001_subset_green(spark, fuzz_root):
    from fuzz_gate import _explain
    from hostile_gate import run_gate

    results = run_gate([f"fz{SEED}"], KEYS, fuzz_root, spark=spark)
    bad = [
        (key, out, detail)
        for _variant, key, out, detail, _ in results
        if out not in ("PASS", "ROWS") and not _explain(key, out, detail)
    ]
    assert bad == [], bad
