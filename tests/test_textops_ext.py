"""Round-3 text/agg surface: PII scrub and exact grouped quantiles."""

from __future__ import annotations

import re

import numpy as np

from clusterindices_spark.operators.relational_ext import q_agg_quantiles
from clusterindices_spark.operators.textops import (
    PII_EMAIL,
    PII_IP,
    PII_PHONE,
    q_text_pii_scrub,
)
from clusterindices_spark.sources.fixtures import load_table

from tests.conftest import SF_SMOKE


def test_pii_scrub_counts_follow_plant_rules(spark):
    rows = q_text_pii_scrub(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 3 < 2 else 0)
        assert r.n_phones == (1 if r.doc_id % 2 == 0 else 0)
        assert r.n_ips == 1


def test_pii_scrub_redaction_is_complete(spark):
    # After redaction none of the PII patterns may match, and the planted
    # classes must appear as placeholder tokens per the plant rules.
    rows = q_text_pii_scrub(spark, SF_SMOKE).collect()
    for r in rows:
        for pat in (PII_EMAIL, PII_PHONE, PII_IP):
            assert not re.search(pat, r.redacted), (r.doc_id, pat)
        assert ("<EMAIL>" in r.redacted) == (r.doc_id % 3 < 2)
        assert ("<PHONE>" in r.redacted) == (r.doc_id % 2 == 0)
        assert "<IP>" in r.redacted


def test_agg_quantiles_match_numpy(spark):
    got = {r.event_type: r for r in q_agg_quantiles(spark, SF_SMOKE).collect()}
    vals = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in vals:
        by_type.setdefault(r.event_type, []).append(r.value)
    assert set(got) == set(by_type)
    for et, xs in by_type.items():
        r = got[et]
        assert r.n_rows == len(xs)
        for name, p in (("p25", 25), ("p50", 50), ("p75", 75), ("p90", 90), ("p99", 99)):
            # numpy 'linear' interpolation is the same p*(n-1) definition
            assert abs(getattr(r, name) - float(np.percentile(xs, p))) < 1e-6


def test_agg_quantiles_approx_tracks_exact(spark):
    """approx_percentile at accuracy 10000 must land within tight rank
    error of the exact ladder (the documented scale-path contract)."""
    from clusterindices_spark.operators.relational_ext import (
        q_agg_quantiles_approx,
    )

    exact = {r.event_type: r for r in q_agg_quantiles(spark, SF_SMOKE).collect()}
    approx = {
        r.event_type: r for r in q_agg_quantiles_approx(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx)
    vals = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in vals:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et in exact:
        xs = sorted(by_type[et])
        n = len(xs)
        for name, p in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9), ("p99", 0.99)):
            got = getattr(approx[et], name)
            # rank-error contract: the returned value's rank must be within
            # n/accuracy (+1 margin for interpolation vs selection) of p*n
            import bisect

            rank = bisect.bisect_right(xs, got)
            assert abs(rank - p * n) <= n / 10000 + 1, (et, name, got, rank, p * n)


def test_rfm_scores_and_segments(spark):
    from clusterindices_spark.operators.analytics import q_analytics_rfm

    rows = q_analytics_rfm(spark, SF_SMOKE).collect()
    assert rows
    n_cust = len({r.o_custkey for r in rows})
    assert n_cust == len(rows)  # one row per customer
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.segment in {"champion", "new", "at_risk_loyal", "hibernating", "regular"}
    # scores must be monotone in their metric: the max-monetary customer
    # scores m=5, the min-monetary one m=1 (quintile boundaries)
    top_m = max(rows, key=lambda r: r.monetary)
    bot_m = min(rows, key=lambda r: r.monetary)
    assert top_m.m_score == 5 and bot_m.m_score == 1
    # recency is inverted: most recent orderer scores r=5
    most_recent = min(rows, key=lambda r: (r.recency_days, r.o_custkey))
    assert most_recent.r_score == 5


def test_markov_rows_are_proper_distributions(spark):
    from clusterindices_spark.operators.analytics import (
        q_events_markov_transition,
    )

    rows = q_events_markov_transition(spark, SF_SMOKE).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p
    assert by_from
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-4, (ft, total)  # rows sum to 1


def test_vocab_stats_hand_values_and_tiebreak(spark, tmp_path):
    """Hand fixture: counts, hapax share, and the pinned modal-token
    tie-break (lexicographically largest among equal counts)."""
    df = spark.createDataFrame(
        [
            (1, "en", "a b b", "s", 5),
            (2, "en", "b c", "s", 3),
            (3, "fr", "x y", "s", 3),
        ],
        "doc_id BIGINT, lang STRING, text STRING, source STRING, n_chars BIGINT",
    )
    out = str(tmp_path / "vs")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    from clusterindices_spark.operators.textops import q_text_vocab_stats

    rows = {r["lang"]: r for r in q_text_vocab_stats(spark, out).collect()}
    en = rows["en"]
    # en: a:1 b:3 c:1 -> vocab 3, total 5, hapax 2
    assert en["vocab_size"] == 3 and en["total_tokens"] == 5
    assert en["n_hapax"] == 2
    assert en["top_token"] == "b" and en["top_count"] == 3
    fr = rows["fr"]
    # fr: x:1 y:1 -> tie at cnt=1 resolves to the LARGER token 'y'
    assert fr["top_token"] == "y" and fr["top_count"] == 1
    assert fr["hapax_share"] == 1.0


def test_bigram_logprob_orders_scrambled_below_natural(spark, tmp_path):
    """The bigram tier's discriminative property: the same multiset of
    tokens in implausible order scores LOWER than the natural order —
    exactly what the unigram filter cannot see."""
    base = "the quick brown fox jumps over the lazy dog " * 5
    scrambled = " ".join(reversed(base.split()))
    # corpus context: many natural-order docs make natural bigrams frequent
    rows = [(i, "en", base, "s", 9) for i in range(10)]
    rows.append((100, "en", scrambled, "s", 9))
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING, source STRING, n_chars BIGINT"
    )
    out = str(tmp_path / "bg")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    from clusterindices_spark.operators.textops import q_text_bigram_logprob

    got = {r["doc_id"]: r["avg_bigram_logprob"] for r in q_text_bigram_logprob(spark, out).collect()}
    assert got[100] < got[0]


def test_bigram_logprob_short_docs_drop(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "en", "solo", "s", 4), (2, "en", "two words", "s", 9)],
        "doc_id BIGINT, lang STRING, text STRING, source STRING, n_chars BIGINT",
    )
    out = str(tmp_path / "bg2")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    from clusterindices_spark.operators.textops import q_text_bigram_logprob

    rows = {r["doc_id"]: r for r in q_text_bigram_logprob(spark, out).collect()}
    assert set(rows) == {2}
    assert rows[2]["n_bigrams"] == 1
