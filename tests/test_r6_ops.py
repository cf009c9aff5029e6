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


def test_semantic_ann_membership_matches_exact(spark):
    """Full-recall candidate generation ⇒ identical components, canonical
    picks, and member counts as the exact tier, on both gate fixtures."""
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
        assert ex == an, f"membership diverges at {sf}"


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
