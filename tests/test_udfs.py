"""UDF-surface tests (operators/udfs.py): each Arrow tier must agree with an
independent JVM-side formulation of the same semantics — that validates the
plumbing (batch shape, schema, grouping, lateral expansion) for the real
use-cases whose bodies SQL can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from clusterindices_spark.functions.distances import norm
from clusterindices_spark.operators.udfs import (
    PROBE_VEC_ID,
    q_udf_grouped_agg_median,
    q_udf_scalar_cosine,
    q_udtf_sentences,
)
from clusterindices_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE


def test_scalar_cosine_matches_builtin_expression(spark):
    """Scalar pandas UDF cosine == higher-order-function cosine (1e-9)."""
    got = q_udf_scalar_cosine(spark, SF_SMOKE)

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probe = emb.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p")
    )
    x, p = F.col("embedding"), F.col("p")
    dot = F.aggregate(
        F.zip_with(x, p, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    want = (
        emb.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(dot / (norm(x) * norm(p)), 6).alias("cos_probe"),
        )
    )
    diff = (
        got.alias("g")
        .join(want.alias("w"), "vec_id")
        .where(F.abs(F.col("g.cos_probe") - F.col("w.cos_probe")) > 1e-9)
    )
    assert got.count() == want.count() > 0
    assert diff.count() == 0
    bad = got.where((F.col("cos_probe") < -1.000001) | (F.col("cos_probe") > 1.000001))
    assert bad.count() == 0


def test_grouped_agg_median_matches_builtin_median(spark):
    """Grouped-agg pandas UDF median == Spark's builtin median (1e-9)."""
    got = q_udf_grouped_agg_median(spark, SF_SMOKE)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    want = (
        emb.select("label", norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.median("nrm"), 6).alias("median_norm"),
        )
    )
    joined = got.alias("g").join(want.alias("w"), "label")
    assert joined.count() == got.count() == want.count() > 0
    diff = joined.where(
        (F.col("g.n") != F.col("w.n"))
        | (F.abs(F.col("g.median_norm") - F.col("w.median_norm")) > 1e-9)
    )
    assert diff.count() == 0


def test_udtf_sentences_shape_and_counts(spark):
    """UDTF output: contiguous per-doc sent_idx from 0, non-empty trimmed
    sentences, n_tokens == whitespace token count, every doc with text
    containing a word appears."""
    out = q_udtf_sentences(spark, SF_SMOKE).cache()
    try:
        assert out.count() > 0
        bad_sentence = out.where(
            (F.trim("sentence") != F.col("sentence")) | (F.length("sentence") == 0)
        )
        assert bad_sentence.count() == 0
        recount = F.size(
            F.filter(F.split(F.col("sentence"), r"\s+"), lambda t: t != "")
        )
        assert out.where(F.col("n_tokens") != recount).count() == 0
        idx = out.groupBy("doc_id").agg(
            F.min("sent_idx").alias("lo"),
            F.max("sent_idx").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        assert idx.where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count() == 0
        n_docs_with_text = (
            load_table(spark, SF_SMOKE, "documents")
            .where(F.length(F.regexp_replace("text", r"[.!?\s]+", "")) > 0)
            .count()
        )
        assert idx.count() == n_docs_with_text
    finally:
        out.unpersist()


def test_cogrouped_asof_matches_dataframe_native(spark):
    """The cogroup/merge_asof path must agree row-for-row with an
    independent DataFrame-native formulation (join + max_by)."""
    from pyspark.sql import functions as F

    from clusterindices_spark.operators.udfs import q_udf_cogrouped_asof
    from clusterindices_spark.sources.fixtures import load_table

    got = sorted(map(tuple, q_udf_cogrouped_asof(spark, SF_SMOKE).collect()))

    e = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ms"), "event_type"
    )
    p = e.where(F.col("event_type") == "purchase")
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ms").alias("click_ms"),
    )
    native = (
        p.join(c, (p.user_id == c.cu) & (c.click_ms <= p.ms), "left")
        .groupBy("user_id", "event_id", "ms")
        .agg(
            F.max_by(
                F.struct("click_id", "click_ms"),
                F.struct("click_ms", "click_id"),
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ms").alias("purchase_ms"),
            F.col("s.click_id").alias("click_id"),
            F.col("s.click_ms").alias("click_ms"),
        )
    )
    assert got == sorted(map(tuple, native.collect()))


def test_cogrouped_asof_edge_keys(spark):
    """Users present on only one side: clicks-only users emit nothing;
    purchases-only users emit NULL attribution; equal-ts tie → max click_id."""
    from clusterindices_spark.operators.udfs import _ASOF_SCHEMA, _attach_clicks

    rows_p = [(1, 10, 1000), (2, 20, 2000)]
    rows_c = [(1, 5, 1000), (1, 6, 1000), (3, 7, 500)]
    p = spark.createDataFrame(rows_p, "user_id BIGINT, event_id BIGINT, ms BIGINT")
    c = spark.createDataFrame(rows_c, "user_id BIGINT, event_id BIGINT, ms BIGINT")
    out = {
        r["purchase_id"]: r
        for r in p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(_attach_clicks, _ASOF_SCHEMA)
        .collect()
    }
    assert set(out) == {10, 20}
    assert out[10]["click_id"] == 6  # tie on ms=1000 → larger event_id
    assert out[20]["click_id"] is None  # user 2 has no clicks


def test_arrow_optimized_python_udf_parity(spark):
    """Spark 4 arrow-optimized Python UDFs (useArrow=True): same results as
    the row-at-a-time pickle path and as the native expression — the
    migration story for legacy @udf code that can't move to pandas_udf
    wholesale (Arrow batches the serialization without changing per-row
    semantics)."""
    from pyspark.sql.functions import udf

    import math

    # floor(x·100 + 0.5), not Python round(): round() is banker's
    # round-half-even while F.round is HALF_UP — 128.545 diverges
    # (128.54 vs 128.55). Same boundary class round6_stable exists for.
    def _score(price, pri):
        return math.floor(price / 100.0 * 100.0 + 0.5) / 100.0 + (
            1.0 if pri == "1-URGENT" else 0.0
        )

    row_udf = udf(_score, "double")
    arrow_udf = udf(_score, "double", useArrow=True)
    o = load_table(spark, SF_SMOKE, "orders").limit(500)
    native = F.floor(F.col("o_totalprice") / 100.0 * 100.0 + 0.5) / 100.0 + F.when(
        F.col("o_orderpriority") == "1-URGENT", 1.0
    ).otherwise(0.0)
    got = o.select(
        "o_orderkey",
        row_udf("o_totalprice", "o_orderpriority").alias("r"),
        arrow_udf("o_totalprice", "o_orderpriority").alias("a"),
        native.alias("n"),
    ).collect()
    assert len(got) == 500
    for r in got:
        assert r["r"] == r["a"] == r["n"], r["o_orderkey"]
