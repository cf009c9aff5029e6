"""Round-5 operator units: hand-computable micro-fixtures for the new
oracle-backed keys (growth accounting, MMR, minhash estimator, chunk dedup,
binary quantization/Hamming search, audio silence, readability, funnel)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_user_lifecycle_hand_case(spark):
    from clusterindices_spark.operators.analytics import WEEK_MS

    # u1 active weeks 0,1,3; u2 active week 1 only; u3 active weeks 0,1
    rows = []
    for uid, weeks in ((1, (0, 1, 3)), (2, (1,)), (3, (0, 1))):
        for w in weeks:
            rows.append((uid, w * WEEK_MS + 1000))
    e = spark.createDataFrame(rows, "user_id BIGINT, ms BIGINT").select(
        "user_id", F.timestamp_millis(F.col("ms")).alias("ts"),
        F.lit(1).alias("event_id"), F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="ci-lifecycle-")
    e.write.mode("overwrite").parquet(f"{d}/events.parquet")
    from clusterindices_spark.operators.analytics import q_events_user_lifecycle

    got = {
        r["week"]: (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_resurrected"], r["n_churned_in"],
        )
        for r in q_events_user_lifecycle(spark, d).collect()
    }
    # week0: u1,u3 both new. week1: u1,u3 retained + u2 new.
    # week2: inactive (not reported; u2,u3 churn into it — unobserved week
    # convention: churn into week2 IS reported? week2 not in active set →
    # left join drops it). week3: u1 resurrected.
    assert got[0] == (2, 2, 0, 0, 0)
    assert got[1] == (3, 1, 2, 0, 0)
    assert 2 not in got  # no actives in week 2 → not an observed week
    assert got[3] == (1, 0, 0, 1, 0)


def test_mmr_first_pick_is_top1_and_picks_distinct(spark):
    from clusterindices_spark.operators.similarity import (
        MMR_K,
        q_similarity_mmr_rerank,
        q_similarity_topk_exact,
    )

    mmr = q_similarity_mmr_rerank(spark, SF_SMOKE).collect()
    top = q_similarity_topk_exact(spark, SF_SMOKE).collect()
    top1 = {
        r["probe_id"]: r["neighbor_id"] for r in top
        if r["sim"] == max(
            t["sim"] for t in top if t["probe_id"] == r["probe_id"]
        )
    }
    by_probe: dict[int, list] = {}
    for r in mmr:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for pid, rows in by_probe.items():
        assert len(rows) == MMR_K
        picks = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["pick_order"])]
        assert len(set(picks)) == MMR_K  # no repeats
        # pick 1 is the plain top-1 (ties broken the same way)
        assert picks[0] == top1[pid]
        # later picks never beat pick 1 on mmr_score
        scores = [r["mmr_score"] for r in sorted(rows, key=lambda r: r["pick_order"])]
        assert all(s <= scores[0] + 1e-9 for s in scores)


def test_minhash_est_identical_docs_estimate_one(spark):
    from clusterindices_spark.operators.dedup import q_dedup_minhash_est, clear_pins

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, text, "en", "s0", len(text)), (2, text, "en", "s0", len(text)),
         (3, "one two three four five six seven eight nine ten", "en", "s1", 49)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="ci-mh-")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    clear_pins()
    rows = q_dedup_minhash_est(spark, d).collect()
    clear_pins()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["jaccard"] == 1.0
    assert r["est_jaccard"] == 1.0  # identical sets → identical signatures
    assert r["est_abs_err"] == 0.0


def test_chunk_dedup_flags_planted_boilerplate(spark):
    from clusterindices_spark.operators.dedup import CHUNK_TOKENS, q_dedup_chunk_exact

    boiler = " ".join(f"b{i}" for i in range(CHUNK_TOKENS))
    uniq1 = " ".join(f"u{i}" for i in range(CHUNK_TOKENS))
    uniq2 = " ".join(f"v{i}" for i in range(CHUNK_TOKENS))
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + uniq1, "en", "sA", 0),
            (2, boiler + " " + uniq2, "en", "sA", 0),
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="ci-chunk-")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = q_dedup_chunk_exact(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    # 2 chunks/doc; the boilerplate chunk appears in both docs → 2 dup
    # chunk instances of CHUNK_TOKENS tokens each
    assert r["n_chunks"] == 4
    assert r["dup_chunks"] == 2
    assert r["dup_chunk_tokens"] == 2 * CHUNK_TOKENS


def test_binary_quantize_and_hamming(spark):
    from clusterindices_spark.operators.embeddings import (
        q_embedding_binary_quantize,
        q_similarity_hamming_topk,
    )

    codes = {r["vec_id"]: r for r in q_embedding_binary_quantize(spark, SF_SMOKE).collect()}
    for r in codes.values():
        popcount = bin(r["w_lo"]).count("1") + bin(r["w_hi"]).count("1")
        assert popcount == r["n_pos"]  # packed bits agree with the count
        assert 0 <= r["w_lo"] < (1 << 32) and 0 <= r["w_hi"] < (1 << 32)
    top = q_similarity_hamming_topk(spark, SF_SMOKE).collect()
    by_probe: dict[int, list] = {}
    for r in top:
        by_probe.setdefault(r["probe_id"], []).append(r["hamming"])
    for pid, hs in by_probe.items():
        assert len(hs) == 5
        assert all(0 <= h <= 64 for h in hs)
        # recompute the best hamming by brute force for this probe
        p = codes[pid]
        best = min(
            bin(c["w_lo"] ^ p["w_lo"]).count("1")
            + bin(c["w_hi"] ^ p["w_hi"]).count("1")
            for vid, c in codes.items()
            if vid != pid
        )
        assert min(hs) == best


def test_audio_silence_hand_wav(spark):
    from clusterindices_spark.operators.multimodal import (
        SILENCE_THRESHOLD,
        audio_silence,
    )
    import struct

    # samples: 3 quiet, 1 loud, 2 quiet → n_quiet=5, longest run=3
    samples = [0, 100, -5, 30000, 10, -10]
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert SILENCE_THRESHOLD > 100
    df = spark.createDataFrame([(7, bytearray(wav))], "doc_id BIGINT, payload BINARY")
    [r] = audio_silence(df).collect()
    assert (r["n_samples"], r["n_quiet"], r["longest_quiet_run"]) == (6, 5, 3)


def test_readability_hand_doc(spark):
    from clusterindices_spark.operators.textops import q_text_readability

    # "go banana xylophones" → lens 2,6,10; syllables (vowel groups):
    # go=1, banana=3, xylophones=3 (y not a vowel here: o-o-e → 3)
    docs = spark.createDataFrame(
        [(1, "go banana xylophones", "en", "s0", 20)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="ci-read-")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    [r] = q_text_readability(spark, d).collect()
    assert r["n_tokens"] == 3
    assert r["avg_word_len"] == 6.0
    assert abs(r["syllables_per_word"] - 7 / 3) < 1e-6
    assert abs(r["long_word_frac"] - 1 / 3) < 1e-6
    # n_sent = ceil(3/15) = 1 → wps = 3
    want = 206.835 - 1.015 * 3 - 84.6 * (7 / 3)
    assert abs(r["flesch_ease"] - want) < 1e-5


def test_filter_funnel_is_consistent(spark):
    from clusterindices_spark.operators.curation import q_curation_filter_funnel

    rows = sorted(
        q_curation_filter_funnel(spark, SF_SMOKE).collect(),
        key=lambda r: r["step"],
    )
    assert [r["rule"] for r in rows] == [
        "lang_keep", "min_tokens", "avg_word_len", "canonical_only",
    ]
    for i, r in enumerate(rows):
        assert r["n_in"] - r["n_dropped"] == r["n_out"]
        if i:
            assert r["n_in"] == rows[i - 1]["n_out"]  # funnel chains
    assert rows[0]["n_dropped"] > 0  # zh docs exist at every sf


def test_asof_nearest_prefers_closer_then_earlier(spark):
    from clusterindices_spark.operators.relational import q_join_asof_nearest

    rows = q_join_asof_nearest(spark, SF_SMOKE).collect()
    assert all(r["dist_ms"] is None or r["dist_ms"] >= 0 for r in rows)
    assert all(
        r["dist_ms"] is None or r["dist_ms"] <= 86_400_000 for r in rows
    )
    # dense smoke events (15 users / 30 days): most purchases have a click
    # within a day
    matched = sum(1 for r in rows if r["click_id"] is not None)
    assert matched > 0 and matched >= len(rows) // 2


def test_autocorr_bounds_and_lags(spark):
    from clusterindices_spark.operators.analytics import ACF_LAGS, q_events_autocorr

    rows = q_events_autocorr(spark, SF_SMOKE).collect()
    assert {r["lag"] for r in rows} == set(ACF_LAGS)
    for r in rows:
        assert r["acf"] is None or -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
        assert r["n_pairs"] > 0


def test_forecast_baseline_consistency(spark):
    from clusterindices_spark.operators.analytics import (
        q_events_forecast_baseline,
    )

    rows = q_events_forecast_baseline(spark, SF_SMOKE).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r["mae_seasonal"] >= 0 and r["mae_naive"] >= 0
        if r["mae_naive"] > 0:
            assert abs(
                r["mae_ratio"] - r["mae_seasonal"] / r["mae_naive"]
            ) < 1e-5
        # lag-24 overlap is 24 fewer hours than lag-1 on a contiguous series
        assert r["n_seasonal"] <= r["n_naive"]


def test_semantic_clusters_membership_consistent(spark):
    from clusterindices_spark.operators.similarity import (
        q_dedup_semantic_clusters,
    )

    rows = q_dedup_semantic_clusters(spark, SF_SMOKE).collect()
    assert len(rows) == 500  # every vector assigned
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    for cid, members in by_comp.items():
        # component label is the min member id and exactly one canonical
        assert cid == min(m["vec_id"] for m in members)
        assert sum(1 for m in members if m["is_canonical"]) == 1
        assert all(m["n_members"] == len(members) for m in members)


def test_domain_caps_invariants(spark):
    from clusterindices_spark.operators.curation import (
        DOMAIN_CAP,
        q_curation_domain_caps,
    )

    for r in q_curation_domain_caps(spark, SF_SMOKE).collect():
        assert r["n_kept"] == min(r["n_docs"], DOMAIN_CAP)
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]


def test_error_rate_global_consistency(spark):
    from clusterindices_spark.operators.analytics import q_events_error_rate

    rows = q_events_error_rate(spark, SF_SMOKE).collect()
    n = sum(r["n"] for r in rows)
    e = sum(r["n_err"] for r in rows)
    p0 = e / n
    # hours matching the global rate exactly must have z == 0
    for r in rows:
        if r["n_err"] / r["n"] == p0:
            assert r["z"] == 0.0
        assert (abs(r["z"]) > 3.0) == r["is_alert"]
