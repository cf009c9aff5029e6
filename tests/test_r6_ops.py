"""Round-6 operator units: the ANN-candidate semantic-dedup tier
(agreement contract vs the exact tier — VERDICT r5 "Next round" #2) and
round-6 regression pins."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SF_GATE = "/root/testdata/sf0.01"


def _pairs_set(df, a="vec_a", b="vec_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_semantic_ann_pair_recall_gate_fixture(spark):
    """LSH candidate tier vs exact quadratic tier on the driver's gate
    fixture: recall ≥ 0.9 (contract floor; measured 1.0) and ZERO false
    positives — approxSimilarityJoin's distance filter on survivors is
    exact, so any pair it emits is truly over-threshold."""
    from clusterindices_spark.operators.similarity import (
        _emb,
        dedup_embedding_cosine,
        semantic_pairs_ann,
    )

    emb = _emb(spark, SF_GATE)
    exact = _pairs_set(dedup_embedding_cosine(emb))
    ann = _pairs_set(semantic_pairs_ann(emb))
    assert exact, "gate fixture must plant over-threshold pairs"
    assert not (ann - exact), f"false positives: {sorted(ann - exact)[:5]}"
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.9, f"pair recall {recall:.3f} < 0.9"


def test_semantic_ann_membership_agreement_floor(spark):
    """Membership agreement vs the exact tier on the gate fixtures
    (documented contract: recall FLOOR on fixtures + IDENTITY only on
    planted tight clusters — the next test).

    r12 honesty note: this test used to assert bit-identical membership,
    which only held because the old MLlib LSH tier was a disguised
    all-pairs (bucketLength 2.0 on unit vectors ≈ 2 buckets per table —
    it exhausted 75 GB of shuffle at 1M vectors). A genuinely pruning
    candidate tier at the LOOSE default threshold (cos ≥ 0.4 — broadly
    similar, not duplicates) misses a few boundary edges by design; the
    contract is ≥98% per-row membership agreement here plus exact
    identity on planted dup balls, where dedup correctness actually
    lives."""
    from clusterindices_spark.operators.similarity import (
        q_dedup_semantic_clusters,
        q_dedup_semantic_clusters_ann,
    )

    for sf in (SF_SMOKE, SF_GATE):
        ex = sorted(
            (r["vec_id"], r["component_id"], r["is_canonical"], r["n_members"])
            for r in q_dedup_semantic_clusters(spark, sf).collect()
        )
        an = sorted(
            (r["vec_id"], r["component_id"], r["is_canonical"], r["n_members"])
            for r in q_dedup_semantic_clusters_ann(spark, sf).collect()
        )
        assert len(ex) == len(an), f"row count diverges at {sf}"
        agree = sum(1 for a, b in zip(ex, an) if a == b) / max(len(ex), 1)
        assert agree >= 0.98, f"membership agreement {agree:.3f} < 0.98 at {sf}"


def test_semantic_ann_planted_paraphrase_clusters(spark):
    """Planted paraphrase clusters: K tight cones (pairwise cos ≈ 0.99,
    far over threshold) in an otherwise near-orthogonal cloud. The ANN
    tier must recover exactly the planted canonical sets — this is the
    controlled case where a recall miss would split a cluster and change
    the canonical election."""
    from clusterindices_spark.operators.similarity import (
        _clusters_from_pairs,
        semantic_pairs_ann,
    )

    rng = random.Random(7)
    dim, k_clusters, per_cluster, n_noise = 16, 4, 5, 40

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = []
    vid = 0
    for c in range(k_clusters):
        base = unit([rng.gauss(0, 1) for _ in range(dim)])
        for _ in range(per_cluster):
            jitter = [b + rng.gauss(0, 0.02) for b in base]
            rows.append((vid, unit(jitter)))
            vid += 1
    for _ in range(n_noise):
        rows.append((vid, unit([rng.gauss(0, 1) for _ in range(dim)])))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id BIGINT, x ARRAY<DOUBLE>")
    out = _clusters_from_pairs(
        emb, semantic_pairs_ann(emb, threshold=0.9)
    ).collect()
    comp = {r["vec_id"]: r["component_id"] for r in out}
    canon = {r["vec_id"] for r in out if r["is_canonical"]}
    for c in range(k_clusters):
        ids = list(range(c * per_cluster, (c + 1) * per_cluster))
        assert len({comp[i] for i in ids}) == 1, f"cluster {c} split"
        assert comp[ids[0]] == min(ids)
    # canonical = one min-id per planted cluster + every noise singleton
    expected = {c * per_cluster for c in range(k_clusters)} | set(
        range(k_clusters * per_cluster, vid)
    )
    assert canon == expected


def test_cross_source_prefix_tier_nonvacuous(spark):
    """The sf0.01 gate row must report >0 rows (VERDICT r5 wrong-item #2:
    a 0-row PASS is trivially hash-equal and proves nothing)."""
    from clusterindices_spark.operators.dedup import q_dedup_cross_source

    rows = q_dedup_cross_source(spark, SF_GATE).collect()
    assert len(rows) > 0
    assert all(r["n_shared_prefixes"] >= r["n_shared_hashes"] for r in rows)


def test_filter_funnel_sequential_canonical(spark):
    """Sequential-funnel semantics (ADVICE r5 item 3): a hash group whose
    min-id copy is dropped by an upstream rule must PROMOTE a surviving
    copy, not vanish. Rules 2-3 are content-derived (identical copies
    pass/fail together), so the differentiating rule is lang_keep: two
    byte-identical texts with different stored lang."""
    import tempfile

    keep = "tiny mirror doc body " * 8  # 32 tokens, awl 4.25
    other = "some other fine text here " * 8  # 40 tokens, awl 4.2
    rows = [
        (1, "zh", "web", keep),  # group min id — dropped by lang_keep
        (2, "en", "web", keep),  # must be PROMOTED canonical
        (3, "en", "web", other),
        (4, "en", "web", other),  # dup of 3 — dropped at canonical_only
    ]
    d = spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, source STRING, text STRING"
    )
    tmp = tempfile.mkdtemp(prefix="ci-funnel-")
    d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from clusterindices_spark.operators.curation import (
        q_curation_filter_funnel,
    )

    out = {r["rule"]: r for r in q_curation_filter_funnel(spark, tmp).collect()}
    # doc 1 drops at lang_keep; docs 2,3,4 reach rule 4; canonical per hash
    # among SURVIVORS: keep→{2} (1 was dropped → 2 promoted; corpus-global
    # semantics would have vanished the whole group), other→min{3,4}=3
    assert out["lang_keep"]["n_dropped"] == 1
    assert out["canonical_only"]["n_in"] == 3
    assert out["canonical_only"]["n_out"] == 2
    assert out["canonical_only"]["n_dropped"] == 1


def test_hamming_recall_audit_invariants(spark):
    """QA-loop audit of the sign-bit tier: per-probe overlap bounded by k,
    recall6 consistent with the counts, and the tier must beat random
    retrieval on the gate fixture (random top-5 of 500 would overlap ~0)."""
    from clusterindices_spark.operators.embeddings import (
        HAMMING_N_PROBES,
        HAMMING_TOP_K,
        q_similarity_hamming_recall_audit,
    )

    rows = q_similarity_hamming_recall_audit(spark, SF_GATE).collect()
    assert len(rows) == HAMMING_N_PROBES
    for r in rows:
        assert r["n_exact"] == HAMMING_TOP_K
        assert 0 <= r["n_overlap"] <= r["n_exact"]
        assert abs(r["recall6"] - r["n_overlap"] / r["n_exact"]) < 1e-6
    mean_recall = sum(r["recall6"] for r in rows) / len(rows)
    assert mean_recall > 0.2, f"sign-bit tier no better than random: {mean_recall}"


def test_int8_cosine_err_invariants(spark):
    """int8 quantization error audit: 8-bit per-vector affine codes keep
    |Δcos| tiny on 64-dim unit vectors (≤0.01 mean, ≤0.05 max); mean ≤ max;
    pair counts cover the corpus minus self."""
    from clusterindices_spark.operators.embeddings import (
        INT8_ERR_PROBES,
        q_embedding_int8_cosine_err,
    )

    rows = q_embedding_int8_cosine_err(spark, SF_GATE).collect()
    assert len(rows) == INT8_ERR_PROBES
    for r in rows:
        assert r["n_pairs"] == 499  # 500 vectors minus self
        assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"]
        assert r["mean_abs_err"] <= 0.01, r
        assert r["max_abs_err"] <= 0.05, r


def test_events_cusum_closed_form_matches_recursion(spark):
    """The prefix-min closed form s_t = c_t − min(0, min_{j≤t} c_j) must
    equal the textbook recursion s_t = max(0, s_{t−1} + dev_t), replayed
    here in exact integer micros from the same hourly counts."""
    import duckdb

    from clusterindices_spark.operators.analytics import (
        CUSUM_H_MULT,
        CUSUM_ALLOWANCE_DIV,
        q_events_cusum,
    )

    got = {
        (r["event_type"], r["hour"]): (r["s_pos"], r["s_neg"], r["is_alarm"])
        for r in q_events_cusum(spark, SF_SMOKE).collect()
    }
    hourly = duckdb.sql(
        f"""SELECT event_type,
                   CAST(floor(epoch_ms(CAST(ts AS TIMESTAMP)) / 3600000)
                        AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM '{SF_SMOKE}/events.parquet' GROUP BY 1, 2
            ORDER BY event_type, hour"""
    ).fetchall()
    from collections import defaultdict

    series = defaultdict(list)
    for et, hour, n in hourly:
        series[et].append((hour, n))
    n_alarm = 0
    for et, rows in series.items():
        total = sum(n for _, n in rows)
        mean_micros = int(math.floor(total * 1_000_000.0 / len(rows)))
        k = int(math.floor(mean_micros / CUSUM_ALLOWANCE_DIV))
        sp = sn = 0
        for hour, n in rows:
            sp = max(0, sp + n * 1_000_000 - mean_micros - k)
            sn = max(0, sn + mean_micros - n * 1_000_000 - k)
            alarm = sp > CUSUM_H_MULT * mean_micros or sn > CUSUM_H_MULT * mean_micros
            g = got[(et, hour)]
            assert g[0] == math.floor(sp / 1e6 * 1e6 + 0.5) / 1e6, (et, hour)
            assert g[1] == math.floor(sn / 1e6 * 1e6 + 0.5) / 1e6, (et, hour)
            assert g[2] == alarm, (et, hour)
            n_alarm += alarm
    assert len(got) == sum(len(v) for v in series.values())


def test_text_ngram_novelty_invariants(spark):
    """First multi-token doc is 100% novel; fractions bounded; the novel
    counts partition the corpus bigram vocabulary exactly (every distinct
    bigram is novel in exactly one doc — its min-doc_id introducer)."""
    from clusterindices_spark.operators.textops import q_text_ngram_novelty

    rows = q_text_ngram_novelty(spark, SF_SMOKE).collect()
    by_id = {r["doc_id"]: r for r in rows}
    first = by_id[min(by_id)]
    assert first["novel_frac"] == 1.0
    assert all(0.0 <= r["novel_frac"] <= 1.0 for r in rows)
    assert all(0 <= r["n_novel"] <= r["n_distinct_bigrams"] for r in rows)
    import duckdb

    from clusterindices_spark.functions.text import SQL_TOKENS

    toks = SQL_TOKENS.format(col="text")
    n_vocab = duckdb.sql(
        f"""WITH t AS (SELECT {toks} AS toks
                       FROM '{SF_SMOKE}/documents.parquet')
            SELECT COUNT(DISTINCT bg) FROM (
              SELECT unnest(list_transform(range(greatest(len(toks)-1, 0)),
                            i -> toks[i+1] || ' ' || toks[i+2])) AS bg
              FROM t)"""
    ).fetchone()[0]
    assert sum(r["n_novel"] for r in rows) == n_vocab


def test_curation_dsir_weights_separates_target_language(spark):
    """The unigram importance weight must rank the target-language slice
    above every other language's mean (that is the DSIR contract: the
    target's own vocabulary distribution scores highest under the
    target/raw likelihood ratio)."""
    from clusterindices_spark.operators.curation import (
        DSIR_TARGET_LANG,
        q_curation_dsir_weights,
    )

    rows = q_curation_dsir_weights(spark, SF_SMOKE).collect()
    from collections import defaultdict

    acc = defaultdict(list)
    for r in rows:
        acc[r["lang"]].append(r["avg_log_ratio"])
    means = {lg: sum(v) / len(v) for lg, v in acc.items()}
    assert DSIR_TARGET_LANG in means and len(means) > 1
    tgt = means.pop(DSIR_TARGET_LANG)
    assert tgt > max(means.values()), means
    kept = [r for r in rows if r["keep"]]
    assert kept and len(kept) < len(rows)


def test_embedding_dim_covariance_matches_numpy(spark):
    """Spark's exact-integer covariance/correlation must agree with a
    numpy replay of the SAME quantization (and the quantized corr must sit
    within quantization error of the float64 truth)."""
    import numpy as np
    import pyarrow.parquet as pq

    from clusterindices_spark.operators.embeddings import (
        q_embedding_dim_covariance,
    )

    rows = {
        (r["dim_a"], r["dim_b"]): (r["n"], r["cov"], r["corr"])
        for r in q_embedding_dim_covariance(spark, SF_SMOKE).collect()
    }
    x = np.array(
        pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
        .column("embedding")
        .to_pylist(),
        dtype=np.float64,
    )
    n, d = x.shape
    assert len(rows) == d * (d - 1) // 2
    u = np.floor(x * 1e6 + 0.5).astype(np.int64)
    m = np.floor(x * 1e3 + 0.5).astype(np.int64)
    for (i, j) in ((0, 1), (45, 48), (12, 63)):
        sa, sb = int(u[:, i].sum()), int(u[:, j].sum())
        sab = int((m[:, i] * m[:, j]).sum())
        saa = int((m[:, i] * m[:, i]).sum())
        sbb = int((m[:, j] * m[:, j]).sum())
        mean_a, mean_b = sa / n / 1e6, sb / n / 1e6
        cov = sab / n / 1e6 - mean_a * mean_b
        var_a = max(saa / n / 1e6 - mean_a * mean_a, 0.0)
        var_b = max(sbb / n / 1e6 - mean_b * mean_b, 0.0)
        corr = cov / math.sqrt(var_a * var_b)
        r6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
        got = rows[(i, j)]
        assert got[0] == n
        assert got[1] == r6(cov), (i, j)
        assert got[2] == r6(corr), (i, j)
        true_corr = float(np.corrcoef(x[:, i], x[:, j])[0, 1])
        assert abs(got[2] - true_corr) < 5e-3, (i, j)


def test_text_rake_keywords_replays_reference_algorithm(spark):
    """Spark's DataFrame RAKE must equal a direct Python implementation of
    the published algorithm (phrase segmentation on stopwords, word score
    deg/freq, phrase score = Σ word scores) on every sampled doc."""
    import duckdb

    from clusterindices_spark.operators.textops import (
        RAKE_TOP_K,
        STOPWORDS,
        q_text_rake_keywords,
    )

    got = {}
    for r in q_text_rake_keywords(spark, SF_SMOKE).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["phrase"], r["score"])
        )
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    stop = set(STOPWORDS)
    import re as _re

    checked = 0
    for doc_id, text in docs[:50]:
        toks = [t for t in _re.split(r"\s+", text.lower()) if t]
        phrases, cur = [], []
        for t in toks:
            if t in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(cur)
        if not phrases:
            assert doc_id not in got
            continue
        freq, deg = {}, {}
        for p in phrases:
            for w in p:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(p)
        ws = {w: math.floor(deg[w] / freq[w] * 1e6 + 0.5) for w in freq}
        scored = {}
        for p in phrases:
            s = sum(ws[w] for w in p)
            key = " ".join(p)
            scored[key] = max(scored.get(key, 0), s)
        want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[
            :RAKE_TOP_K
        ]
        want = [
            (i + 1, ph, math.floor(sm / 1e6 * 1e6 + 0.5) / 1e6)
            for i, (ph, sm) in enumerate(want)
        ]
        assert sorted(got[doc_id]) == want, doc_id
        checked += 1
    assert checked >= 40


def test_events_ab_ttest_matches_float64_welch(spark):
    """The quantized Welch t must sit within quantization error of the
    float64 truth computed directly from the raw values, for every pair,
    and the df must satisfy min(n)-1 <= df <= n_a+n_b-2."""
    import duckdb
    import numpy as np

    from clusterindices_spark.operators.analytics import q_events_ab_ttest

    rows = q_events_ab_ttest(spark, SF_SMOKE).collect()
    vals = {}
    for et, v in duckdb.sql(
        f"SELECT event_type, value FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall():
        vals.setdefault(et, []).append(v)
    vals = {k: np.array(v, dtype=np.float64) for k, v in vals.items()}
    assert len(rows) == len(vals) * (len(vals) - 1) // 2
    for r in rows:
        xa, xb = vals[r["type_a"]], vals[r["type_b"]]
        va, vb = xa.var(ddof=1), xb.var(ddof=1)
        se2a, se2b = va / len(xa), vb / len(xb)
        t_true = (xa.mean() - xb.mean()) / math.sqrt(se2a + se2b)
        df_true = (se2a + se2b) ** 2 / (
            se2a**2 / (len(xa) - 1) + se2b**2 / (len(xb) - 1)
        )
        assert abs(r["t_stat"] - t_true) < 0.05, (r["type_a"], r["type_b"])
        assert abs(r["welch_df"] - df_true) / df_true < 0.01
        assert (
            min(len(xa), len(xb)) - 1 <= r["welch_df"] <= len(xa) + len(xb) - 2
        )
        assert r["is_significant"] == (abs(r["t_stat"]) > 1.96) or abs(
            abs(r["t_stat"]) - 1.96
        ) < 1e-6


def test_events_bootstrap_ci_brackets_mean_and_replays(spark):
    """CI must bracket the true mean (Poisson bootstrap at n≫1), the
    interval must be ordered, and one replicate's weighted mean must
    replay exactly from the published hash formula."""
    import duckdb

    from clusterindices_spark.operators.analytics import (
        BOOT_HASH_A,
        BOOT_HASH_B,
        BOOT_MOD,
        BOOT_POISSON_CUM,
        q_events_bootstrap_ci,
    )

    rows = {r["event_type"]: r for r in q_events_bootstrap_ci(spark, SF_SMOKE).collect()}
    assert rows
    for et, r in rows.items():
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], et
        # sane relative width (smoke-SF types are small + heavy-tailed)
        assert r["ci_hi"] - r["ci_lo"] < max(1.0, r["mean_value"]), et

    raw = duckdb.sql(
        f"SELECT event_id, event_type, value FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    et0 = sorted(rows)[0]
    means = []
    for rep in range(40):
        wn = ws = 0
        for eid, et, v in raw:
            if et != et0:
                continue
            u = (eid * BOOT_HASH_A + rep * BOOT_HASH_B) % BOOT_MOD
            w = sum(1 for t in BOOT_POISSON_CUM if u >= t)
            wn += w
            ws += w * math.floor(v * 1e6 + 0.5)
        means.append(math.floor(ws / wn / 1e6 * 1e6 + 0.5) / 1e6)
    means.sort()
    assert rows[et0]["ci_lo"] == means[1]
    assert rows[et0]["ci_hi"] == means[38]


def test_kcore_peel_chain_dissolves_clique_survives(spark):
    """On a planted path⊕clique graph the 2-core must dissolve the path
    over successive rounds (ends first, then inward) and keep the clique
    intact with full residual degree."""
    from pyspark.sql import functions as F

    from clusterindices_spark.operators.dedup import kcore_peel

    path = [(1, 2), (2, 3), (3, 4), (4, 5)]
    clique = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    und = path + clique
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "s LONG, d LONG"
    )
    got = {r["node"]: r for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert got[1]["peeled_round"] == 1 and got[5]["peeled_round"] == 1
    assert got[2]["peeled_round"] == 2 and got[4]["peeled_round"] == 2
    assert got[3]["peeled_round"] == 3
    assert all(not got[v]["in_kcore"] for v in (1, 2, 3, 4, 5))
    for v in (10, 11, 12, 13):
        assert got[v]["in_kcore"] and got[v]["peeled_round"] == 0
        assert got[v]["core_deg"] == 3 and got[v]["deg0"] == 3


def test_events_survival_km_replays_textbook_estimator(spark):
    """Spark's KM curve must replay the textbook estimator computed
    directly from user lifetimes (same censoring rule), be monotone
    non-increasing, and sit ABOVE the censoring-blind naive curve (the
    bias KM exists to correct)."""
    import duckdb

    from clusterindices_spark.operators.analytics import (
        KM_CENSOR_HOURS,
        q_events_survival_km,
    )

    rows = sorted(
        q_events_survival_km(spark, SF_SMOKE).collect(),
        key=lambda r: r["t_hours"],
    )
    assert len(rows) >= 5
    lifetimes = duckdb.sql(
        f"""WITH d0 AS (SELECT user_id,
              CAST(floor(epoch_ms(CAST(ts AS TIMESTAMP)) / 3600000) AS BIGINT) AS h
            FROM '{SF_SMOKE}/events.parquet')
            SELECT MAX(h) - MIN(h) AS t, MAX(h) AS lh FROM d0 GROUP BY user_id"""
    ).fetchall()
    max_h = max(lh for _, lh in lifetimes)
    obs = [(t, lh <= max_h - KM_CENSOR_HOURS) for t, lh in lifetimes]  # (t, died)
    n_at_risk = len(obs)
    surv_log_micros = 0
    prev_s = 1.0
    for r in rows:
        t = r["t_hours"]
        d = sum(1 for tt, died in obs if tt == t and died)
        c = sum(1 for tt, died in obs if tt == t and not died)
        assert r["n_deaths"] == d and r["n_censored"] == c, t
        assert r["n_at_risk"] == n_at_risk, t
        surv_log_micros += math.floor(
            math.log(max(1.0 - d / n_at_risk, 1e-300)) * 1e6 + 0.5
        )
        s = math.floor(math.exp(surv_log_micros / 1e6) * 1e6 + 0.5) / 1e6
        assert r["surv"] == s, t
        assert r["surv"] <= prev_s + 1e-12, "curve must not increase"
        prev_s = r["surv"]
        n_at_risk -= d + c
    # censoring-blind naive survival at the last death time underestimates
    deaths = sorted(t for t, died in obs if died)
    if deaths:
        t_last = deaths[-1]
        naive = sum(1 for t, _ in obs if t > t_last) / len(obs)
        km_last = [r["surv"] for r in rows if r["t_hours"] == t_last][0]
        assert km_last >= naive - 1e-9


def test_scd2_intervals_partition_history(spark):
    """SCD2 contract per customer: versions are 1..N, consecutive runs
    change status, valid_to of run i equals valid_from of run i+1 (the
    half-open chain), exactly one open interval (valid_to NULL), and the
    run order counts sum to the customer's order count."""
    import duckdb

    from clusterindices_spark.operators.relational_ext import (
        q_scd2_status_intervals,
    )

    by_cust = {}
    for r in q_scd2_status_intervals(spark, SF_SMOKE).collect():
        by_cust.setdefault(r["o_custkey"], []).append(r)
    counts = dict(
        duckdb.sql(
            f"SELECT o_custkey, COUNT(*) FROM '{SF_SMOKE}/orders.parquet'"
            " GROUP BY o_custkey"
        ).fetchall()
    )
    assert set(by_cust) == set(counts)
    for ck, runs in by_cust.items():
        runs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in runs] == list(range(1, len(runs) + 1))
        assert sum(r["n_orders"] for r in runs) == counts[ck]
        opens = [r for r in runs if r["valid_to"] is None]
        assert len(opens) == 1 and opens[0] is runs[-1]
        for a, b in zip(runs, runs[1:]):
            assert a["status"] != b["status"], ck
            assert a["valid_to"] == b["valid_from"], ck
            assert a["valid_from"] <= b["valid_from"], ck


def test_weighted_median_bucketed_equals_definition_on_edges(spark):
    """The two-pass bucketed algorithm must equal the definitional sorted
    CDF on adversarial cases: the 2·cum == tot exact boundary, medians
    landing exactly ON a bucket edge, and single-row groups."""
    import tempfile

    from pyspark.sql import functions as F

    from clusterindices_spark.operators.relational_ext import (
        WM_BUCKET_CENTS,
        q_agg_weighted_median,
    )

    edge = WM_BUCKET_CENTS / 100.0  # price exactly on a bucket boundary
    rows = [
        # group A: weights 1,1 → 2*cum==tot at the FIRST row (even split):
        # definition picks the smaller price
        ("A", 10.00, 1.0), ("A", 20.00, 1.0),
        # group B: median exactly on the bucket edge
        ("B", edge - 1.0, 1.0), ("B", edge, 2.0), ("B", edge + 1.0, 1.0),
        # group C: single row
        ("C", 42.42, 7.0),
        # group D: heavy weight dominates from a later bucket
        ("D", 5.00, 1.0), ("D", edge * 3, 10.0),
    ]
    d = spark.createDataFrame(
        rows, "l_returnflag STRING, l_extendedprice DOUBLE, l_quantity DOUBLE"
    )
    tmp = tempfile.mkdtemp(prefix="ci-wm-")
    d.write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["total_weight"], r["weighted_median"])
        for r in q_agg_weighted_median(spark, tmp).collect()
    }
    assert got["A"] == (2, 10.00)
    assert got["B"] == (4, edge)
    assert got["C"] == (7, 42.42)
    assert got["D"] == (11, edge * 3)


def test_bucketed_quantiles_match_sorted_definition(spark):
    """Bucketed two-pass type-1 quantiles must equal the sorted-order-
    statistic definition replayed in Python, and p50 must sit within one
    value step of the interpolated exact ladder."""
    import duckdb

    from clusterindices_spark.operators.relational_ext import (
        Q_FRACTIONS,
        q_agg_quantiles,
        q_agg_quantiles_bucketed,
    )

    got = {
        (r["event_type"], r["p"]): (r["n_rows"], r["q"])
        for r in q_agg_quantiles_bucketed(spark, SF_SMOKE).collect()
    }
    vals = {}
    for et, v in duckdb.sql(
        f"SELECT event_type, value FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall():
        vals.setdefault(et, []).append(math.floor(v * 1e6 + 0.5))
    for et, xs in vals.items():
        xs.sort()
        n = len(xs)
        for p, num, den in Q_FRACTIONS:
            r = (num * n + den - 1) // den
            want = xs[r - 1] / 1e6
            assert got[(et, p)] == (n, want), (et, p)
    interp = {
        r["event_type"]: r["p50"] for r in q_agg_quantiles(spark, SF_SMOKE).collect()
    }
    for et in interp:
        assert abs(got[(et, "p50")][1] - interp[et]) < 0.51, et


def test_minhash_pr_curve_monotone_and_consistent(spark):
    """PR-curve invariants: candidate universe constant across taus,
    tp+fn (actual positives) non-increasing in tau, precision
    non-decreasing on this corpus's separable high end, P/R consistent
    with the integer counts, and the curve must be NON-degenerate at the
    low end (the 16-perm quantization flood: fp > 0 at tau=0.05)."""
    from clusterindices_spark.operators.dedup import (
        q_dedup_minhash_pr_curve,
    )

    rows = sorted(
        q_dedup_minhash_pr_curve(spark, SF_SMOKE).collect(),
        key=lambda r: r["tau"],
    )
    assert len(rows) == 6
    n0 = rows[0]["n_candidates"]
    prev_pos = None
    for r in rows:
        assert r["n_candidates"] == n0
        pos = r["tp"] + r["fn"]
        if prev_pos is not None:
            assert pos <= prev_pos, r["tau_label"]
        prev_pos = pos
        if r["tp"] + r["fp"] > 0:
            assert abs(r["precision"] - r["tp"] / (r["tp"] + r["fp"])) < 1e-6
        if pos > 0:
            assert abs(r["recall"] - r["tp"] / pos) < 1e-6
    assert rows[0]["fp"] > 100, "low-tau quantization flood must appear"
    assert rows[-1]["fp"] == 0 and rows[-1]["recall"] == 1.0


def test_neardup_banding_full_recall_contract(spark):
    """Pigeonhole contract on the fixture: the banded report's neighbor
    counts must equal a brute-force popcount scan of the same dhash
    frame, and a hamming-3 pair must NOT appear (threshold, not recall
    loss: bands can still collide on 3-bit differences)."""
    from clusterindices_spark.operators.multimodal import (
        NEARDUP_MAX_HAMMING,
        _dhash_frame,
        q_multimodal_near_dup_report,
    )

    got = {
        r["doc_id"]: (r["n_near"], r["min_hamming"], r["nearest_doc"])
        for r in q_multimodal_near_dup_report(spark, SF_SMOKE).collect()
    }
    hashes = {
        r["doc_id"]: r["dhash"] for r in _dhash_frame(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(hashes)
    for did, h in hashes.items():
        neigh = [
            (bin(h ^ h2).count("1"), d2)
            for d2, h2 in hashes.items()
            if d2 != did and bin(h ^ h2).count("1") <= NEARDUP_MAX_HAMMING
        ]
        n_near, mh, nd = got[did]
        assert n_near == len(neigh), did
        if neigh:
            assert (mh, nd) == min(neigh), did
        else:
            assert mh is None and nd is None, did
    assert any(v[0] > 0 for v in got.values()), "fixture must have near-dups"


def test_markov_entropy_bounds_and_replay(spark):
    """Entropy invariants: 0 <= H(next|s) <= log2(n_types), the rate is
    the pi-weighted mean of per-state entropies, and a numpy replay from
    the transition counts agrees within quantization error."""
    import duckdb
    import numpy as np

    from clusterindices_spark.operators.analytics import (
        q_events_markov_entropy,
    )

    rows = q_events_markov_entropy(spark, SF_SMOKE).collect()
    n_types = len(rows)
    rate = rows[0]["entropy_rate_bits"]
    assert all(abs(r["entropy_rate_bits"] - rate) < 1e-9 for r in rows)
    wsum = 0.0
    for r in rows:
        assert 0.0 <= r["h_bits"] <= math.log2(n_types) + 1e-9, r
        wsum += r["pi"] * r["h_bits"]
    assert abs(wsum - rate) < 1e-3
    trans = duckdb.sql(
        f"""WITH s AS (SELECT user_id, event_id, event_type,
              lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS f
            FROM '{SF_SMOKE}/events.parquet')
            SELECT f, event_type, COUNT(*) FROM s WHERE f IS NOT NULL
            GROUP BY 1, 2"""
    ).fetchall()
    outs = {}
    for f, t, n in trans:
        outs.setdefault(f, {})[t] = n
    got = {r["from_type"]: r for r in rows}
    for f, d in outs.items():
        tot = sum(d.values())
        h = -sum((n / tot) * math.log2(n / tot) for n in d.values())
        assert abs(got[f]["h_bits"] - h) < 1e-4, f
        assert got[f]["n_out"] == tot


def test_burstiness_poisson_floor_and_replay(spark):
    """VMR must replay exactly from raw counts (zeros included) and the
    corpus must show spread: every VMR > 0 and the max VMR well above the
    min (clumped vs glue vocabulary)."""
    import duckdb

    from clusterindices_spark.operators.textops import q_text_burstiness

    rows = {r["term"]: r for r in q_text_burstiness(spark, SF_SMOKE).collect()}
    raw = duckdb.sql(
        f"""SELECT doc_id,
              unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '')) AS term
            FROM '{SF_SMOKE}/documents.parquet'"""
    ).fetchall()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    counts = {}
    for did, term in raw:
        counts.setdefault(term, {})
        counts[term][did] = counts[term].get(did, 0) + 1
    assert set(rows) == set(counts)
    for term, per in counts.items():
        s = sum(per.values())
        s2 = sum(c * c for c in per.values())
        vmr = (n_docs * s2 - s * s) / (n_docs * s)
        r6 = math.floor(vmr * 1e6 + 0.5) / 1e6
        assert rows[term]["vmr"] == r6, term
        assert rows[term]["df"] == len(per) and rows[term]["total_count"] == s
    # the synthetic corpus is near-uniform word soup: all terms sit just
    # above the Poisson floor (measured 1.20-1.57 at smoke SF) — assert
    # the floor and a nonzero spread, not topical-corpus clumping
    vmrs = [r["vmr"] for r in rows.values()]
    assert min(vmrs) > 0 and max(vmrs) > 1.2 * min(vmrs)


def test_waterfill_conservation_and_fairness(spark):
    """Waterfilling contract: when anything is capped, allocations sum to
    the budget (within per-source rounding) and every capped source gets
    EXACTLY the level while every uncapped one keeps all its tokens; a
    hand-built skewed fixture pins the closed form."""
    import tempfile

    from clusterindices_spark.operators.curation import (
        q_curation_waterfill_budget,
    )

    rows = q_curation_waterfill_budget(spark, SF_SMOKE).collect()
    budget = rows[0]["budget"]
    total_alloc = sum(r["allocated"] for r in rows)
    if any(r["capped"] for r in rows):
        assert abs(total_alloc - budget) < 1e-3 * budget + len(rows)
        level = rows[0]["level"]
        for r in rows:
            if r["capped"]:
                assert r["allocated"] == level and r["tokens"] > level
            else:
                assert r["allocated"] == float(r["tokens"]) <= level + 1e-9

    # hand case: sizes 10, 20, 100 tokens → total 130, budget 65;
    # t = (65 - 30) / 1 = 35 on the last source
    docs = []
    did = 0
    for src, n in (("a", 10), ("b", 20), ("c", 100)):
        docs.append((did, " ".join(["w"] * n), "en", src))
        did += 1
    d = spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING, lang STRING, source STRING"
    )
    tmp = tempfile.mkdtemp(prefix="ci-wf-")
    d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {
        r["source"]: r for r in q_curation_waterfill_budget(spark, tmp).collect()
    }
    assert got["a"]["allocated"] == 10.0 and not got["a"]["capped"]
    assert got["b"]["allocated"] == 20.0 and not got["b"]["capped"]
    assert got["c"]["allocated"] == 35.0 and got["c"]["capped"]
    assert got["c"]["level"] == 35.0 and got["c"]["budget"] == 65


def test_simhash_calibration_monotone_signal(spark):
    """Calibration contract: counts cover the candidate universe, mean
    jaccard at hamming 0 must sit far above the tail mean (the cutoff
    signal), and hamming stays within the 16-bit range."""
    from clusterindices_spark.operators.dedup import (
        q_dedup_minhash_pr_curve,
        q_dedup_simhash_est,
    )

    rows = sorted(
        q_dedup_simhash_est(spark, SF_SMOKE).collect(),
        key=lambda r: r["hamming16"],
    )
    assert all(0 <= r["hamming16"] <= 16 for r in rows)
    assert all(r["mean_jaccard"] <= r["max_jaccard"] + 1e-9 for r in rows)
    universe = q_dedup_minhash_pr_curve(spark, SF_SMOKE).collect()[0][
        "n_candidates"
    ]
    assert sum(r["n_pairs"] for r in rows) == universe
    head = rows[0]
    tail = [r for r in rows if r["hamming16"] >= 6]
    assert head["hamming16"] <= 1
    tail_mean = sum(r["mean_jaccard"] * r["n_pairs"] for r in tail) / sum(
        r["n_pairs"] for r in tail
    )
    assert head["mean_jaccard"] > 10 * tail_mean
