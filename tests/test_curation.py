from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_split_deterministic_and_stable(spark):
    """The fold must be a pure function of doc_id: two evaluations agree
    row-for-row, and the train share sits near the 243/256 design point."""
    from clusterindices_spark.operators.curation import q_curation_split

    a = {r["doc_id"]: r["split"] for r in q_curation_split(spark, SF_SMOKE).collect()}
    b = {r["doc_id"]: r["split"] for r in q_curation_split(spark, SF_SMOKE).collect()}
    assert a == b
    share = sum(v == "train" for v in a.values()) / len(a)
    assert 0.85 < share < 1.0  # 50 docs at sf0.001 — loose binomial bounds


def test_pack_respects_capacity_and_covers_all_docs(spark):
    from clusterindices_spark.operators.curation import (
        PACK_CAPACITY,
        q_curation_pack_greedy,
    )
    from clusterindices_spark.sources.fixtures import load_table

    packed = q_curation_pack_greedy(spark, SF_SMOKE)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    rows = packed.collect()
    assert len(rows) == n_docs
    fills = (
        packed.groupBy("grp", "bin")
        .agg(F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # a bin may exceed capacity only via a single over-long (capped) doc
    assert all(r["fill"] <= PACK_CAPACITY for r in fills)


def test_pack_greedy_is_order_deterministic(spark):
    """Greedy fold over (grp, doc_id) order: independent of input
    partitioning, so a repartitioned input must pack identically."""
    from clusterindices_spark.operators.curation import pack_greedy
    from clusterindices_spark.sources.fixtures import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    base = sorted(map(tuple, pack_greedy(d).collect()))
    shuffled = sorted(map(tuple, pack_greedy(d.repartition(7)).collect()))
    assert base == shuffled


def test_pack_bins_are_contiguous_per_group(spark):
    """Bins within a group must be 0..max with no gaps (greedy never skips),
    and doc order within a group maps to non-decreasing bin ids."""
    from clusterindices_spark.operators.curation import q_curation_pack_greedy

    rows = q_curation_pack_greedy(spark, SF_SMOKE).collect()
    by_grp: dict[int, list] = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append((r["doc_id"], r["bin"]))
    for docs in by_grp.values():
        docs.sort()
        bins = [b for _, b in docs]
        assert bins == sorted(bins)
        assert set(bins) == set(range(max(bins) + 1))


def test_pipeline_funnel_monotone(spark):
    from clusterindices_spark.operators.curation import q_curation_pipeline

    rows = q_curation_pipeline(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_retained"] <= r["n_quality_ok"] <= r["n_docs"]
        assert r["n_retained"] <= r["n_langid_ok"] <= r["n_docs"]
        if r["n_retained"] == 0:
            assert r["n_tokens_retained"] == 0
            assert r["avg_quality_retained"] is None


def test_sample_stratified_is_scan_side_and_stratified(spark):
    """The stratified sample must be pure scan-side work (no exchange in
    the executed plan) and must actually downsample the 'en' stratum
    relative to the rest (thresholds 0x4000 vs 0xc000)."""
    from clusterindices_spark.operators.curation import (
        q_curation_sample_stratified,
    )
    from clusterindices_spark.sources.fixtures import load_table

    df = q_curation_sample_stratified(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    kept = df.groupBy("lang").count().collect()
    total = (
        load_table(spark, SF_SMOKE, "documents").groupBy("lang").count().collect()
    )
    kept_by = {r["lang"]: r["count"] for r in kept}
    tot_by = {r["lang"]: r["count"] for r in total}
    en_rate = kept_by.get("en", 0) / tot_by["en"]
    rest_kept = sum(v for k, v in kept_by.items() if k != "en")
    rest_tot = sum(v for k, v in tot_by.items() if k != "en")
    assert en_rate < rest_kept / rest_tot


def test_sample_topk_prunes_before_shuffle(spark):
    """row_number ≤ K must compile to WindowGroupLimit in both the partial
    (pre-shuffle) and final positions, and yield exactly K rows per stratum
    when the stratum has ≥ K documents."""
    from clusterindices_spark.operators.curation import (
        TOPK_PER_STRATUM,
        q_curation_sample_topk,
    )

    df = q_curation_sample_topk(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") == 2, plan
    from clusterindices_spark.sources.fixtures import load_table

    totals = {
        r["lang"]: r["count"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .count()
        .collect()
    }
    per = {r["lang"]: r["count"] for r in df.groupBy("lang").count().collect()}
    for lang, total in totals.items():
        assert per.get(lang, 0) == min(total, TOPK_PER_STRATUM), (lang, per)
    # two runs agree row-for-row (deterministic reservoir)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, q_curation_sample_topk(spark, SF_SMOKE).collect()))
    assert a == b


def test_decontaminate_planted(spark):
    """A train doc sharing a 3-gram with the eval doc is flagged with the
    right overlap count; a disjoint train doc is not flagged."""
    from pyspark.sql import functions as F

    from clusterindices_spark.functions.text import shingles3, tokens
    from clusterindices_spark.operators.curation import decontaminate

    rows = [
        (1, "alpha beta gamma delta", True),   # eval: shingles {a b g, b g d}
        (2, "zz alpha beta gamma yy", False),  # shares "alpha beta gamma"
        (3, "one two three four", False),      # disjoint
        (4, "alpha beta gamma delta", False),  # shares both eval shingles
    ]
    d = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, is_eval BOOLEAN"
    ).select(
        "doc_id", shingles3(tokens(F.col("text"))).alias("shingles"), "is_eval"
    )
    got = {r["doc_id"]: r["n_shared_shingles"] for r in decontaminate(d).collect()}
    assert got == {2: 1, 4: 2}


def test_repetition_stats_hand(spark, tmp_path):
    """Hand-checked fractions on a fully repetitious vs an all-distinct doc."""
    import pytest as pt

    from clusterindices_spark.operators.textops import q_text_repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam", "en", "s", 19),
            (2, "all words are different", "en", "s", 23),
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    path = str(tmp_path / "docs")
    docs.write.parquet(path + "/documents.parquet")
    got = {
        r["doc_id"]: r for r in q_text_repetition_stats(spark, path).collect()
    }
    r1, r2 = got[1], got[2]
    assert r1["n_tokens"] == 4
    assert r1["dup_token_frac"] == pt.approx(0.75)      # 1 distinct of 4
    assert r1["top_token_share"] == pt.approx(1.0)
    assert r1["dup_2gram_frac"] == pt.approx(2.0 / 3.0, abs=1e-6)
    assert r2["dup_token_frac"] == pt.approx(0.0)
    assert r2["top_token_share"] == pt.approx(0.25)
    assert r2["dup_2gram_frac"] == pt.approx(0.0)


def test_sample_weighted_determinism_and_formula(spark):
    """A-ES weighted sample: replay-identical, ≤K per stratum, ranks dense
    ascending in the exponential clock, and the clock matches the hand
    formula −ln((doc_id·A mod M + 0.5)/M)/max(n_chars,1)."""
    import math

    from clusterindices_spark.operators.curation import (
        _ES_A,
        _ES_M,
        WEIGHTED_K,
        q_curation_sample_weighted,
    )

    a = q_curation_sample_weighted(spark, SF_SMOKE).collect()
    b = q_curation_sample_weighted(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_lang = {}
    for r in a:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        assert len(rows) <= WEIGHTED_K
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [r["es_key"] for r in rows]
        assert keys == sorted(keys), lang
        for r in rows:
            u = ((r["doc_id"] * _ES_A) % _ES_M + 0.5) / _ES_M
            want = -math.log(u) / max(r["n_chars"], 1)
            assert abs(r["es_key"] - want) < 1e-6


def test_sample_weighted_prefers_heavier_docs(spark):
    """Size-weighting sanity: the sampled docs' mean n_chars exceeds the
    stratum mean (longer docs get smaller exponential clocks on average)."""
    from pyspark.sql import functions as F

    from clusterindices_spark.operators.curation import (
        q_curation_sample_weighted,
    )
    from clusterindices_spark.sources.fixtures import load_table

    samp = q_curation_sample_weighted(spark, SF_SMOKE)
    mean_s = samp.agg(F.avg("n_chars")).collect()[0][0]
    mean_all = (
        load_table(spark, SF_SMOKE, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert mean_s > mean_all
