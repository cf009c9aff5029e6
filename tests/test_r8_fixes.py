"""Round-8 hardening: ADVICE r7 fixes pinned — empty-corpus guard on the
dim-covariance Gram path, roundtrip tempdir keying by full fixture path,
and the attribution integer-div parity (the 2^53 family of hazards)."""

import os
import tempfile


def test_dim_covariance_empty_corpus(spark):
    """An empty embeddings table must return the empty 8-column frame,
    not TypeError on first() → None (ADVICE r7)."""
    from clusterindices_spark.operators.embeddings import (
        q_embedding_dim_covariance,
    )

    tmp = tempfile.mkdtemp(prefix="ci-emptyemb-")
    spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    ).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    out = q_embedding_dim_covariance(spark, tmp)
    assert out.count() == 0
    # same output surface as the populated path
    assert "corr" in out.columns and "cov" in out.columns


def test_roundtrip_path_distinct_roots_same_basename():
    """Two fixture roots sharing a basename (/a/sf0.1 vs /b/sf0.1) must
    get DISTINCT roundtrip dirs in one session (ADVICE r7), while the
    same root must keep reusing ONE location."""
    from clusterindices_spark.sources.readers import _roundtrip_path

    a = os.path.join(tempfile.mkdtemp(prefix="ci-rt-a-"), "sf0.1")
    b = os.path.join(tempfile.mkdtemp(prefix="ci-rt-b-"), "sf0.1")
    pa_, pb = _roundtrip_path("csv", a), _roundtrip_path("csv", b)
    assert pa_ != pb
    assert _roundtrip_path("csv", a) == pa_  # stable per root
    assert _roundtrip_path("json", a) != pa_  # format-keyed


def test_sample_weighted_snowflake_ids(spark):
    """doc_id = 5e9 breaks the raw Knuth multiply (5e9 * 2654435761 >
    2^63 → ANSI error / wrap); the mod-before-multiply form must select
    fine and by modular arithmetic pick the same clocks as small ids with
    the same residue (int64_audit HIGH hit, round 8)."""
    from clusterindices_spark.operators.curation import (
        _ES_M,
        q_curation_sample_weighted,
    )

    big = 5_000_000_000
    rows = [
        (big + i, "en", 100, "x" * 10) for i in range(5)
    ] + [((big + i) % _ES_M, "fr", 100, "y" * 10) for i in range(5)]
    tmp = tempfile.mkdtemp(prefix="ci-esample-")
    spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, n_chars INT, text STRING"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    out = q_curation_sample_weighted(spark, tmp).collect()
    en = sorted(
        (r["es_key"] for r in out if r["lang"] == "en")
    )
    fr = sorted((r["es_key"] for r in out if r["lang"] == "fr"))
    assert len(en) == 5 and en == fr  # same residues → same clocks


def test_attribution_share_is_integer_div(spark):
    """Planted purchase with 3 touches: 10 µ-revenue splits as
    div(10,3)=3 per touch, remainder dropped — 9 µ attributed total.
    Exercises the integer-div share path (ADVICE r7)."""
    from datetime import datetime, timezone

    from clusterindices_spark.operators.analytics import (
        q_events_attribution_linear,
    )

    def ts(ms):
        return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )

    base = 1_704_067_200_000  # 2024-01-01
    rows = [
        (1, ts(base + 1000), 7, "view", 0.0),
        (2, ts(base + 2000), 7, "click", 0.0),
        (3, ts(base + 3000), 7, "search", 0.0),
        # purchase of 0.000010 → 10 µ, after the 3 touches
        (4, ts(base + 4000), 7, "purchase", 0.000010),
    ]
    tmp = tempfile.mkdtemp(prefix="ci-attr-")
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = {
        r["channel"]: r for r in q_events_attribution_linear(spark, tmp).collect()
    }
    assert set(out) == {"view", "click", "search"}
    for ch in out:
        assert out[ch]["n_touches"] == 1
        assert abs(out[ch]["attributed_revenue"] - 3e-06) < 1e-12
