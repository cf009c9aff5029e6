"""Regression guards for the round-9 hostile-gate fixes.

The hostile differential gate (tools/hostile_gate.py over
tools/hostile_fixtures.py) is the systematic guard; these tests pin the
three SILENT-wrong-answer classes it surfaced directly, so a regression
fails fast in the unit suite without rebuilding the hostile dirs.
"""

import datetime as dt
import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

P53 = 2**53


def test_cogrouped_asof_preserves_odd_ids_past_2_53(spark):
    """pd.merge_asof's NaN fill forced click ids through float64, rounding
    9007199254741103 -> ...104 (silent id corruption). The searchsorted
    rewrite must return the EXACT odd id, with an unmatched purchase in
    the same group forcing the NA path that used to trigger the cast."""
    from clusterindices_spark.operators.udfs import _attach_clicks

    odd_click = P53 + 111  # odd -> unrepresentable in float64
    assert float(odd_click) != odd_click
    purch = pd.DataFrame(
        {
            "user_id": [1, 1],
            "event_id": [P53 + 200, P53 + 201],
            # first purchase BEFORE any click -> unmatched -> NA fill
            "ms": [500, 2000],
        }
    )
    clk = pd.DataFrame(
        {"user_id": [1], "event_id": [odd_click], "ms": [1000]}
    )
    out = _attach_clicks(purch, clk)
    by_pid = {r.purchase_id: r for r in out.itertuples()}
    assert pd.isna(by_pid[P53 + 200].click_id)
    assert by_pid[P53 + 201].click_id == odd_click  # exact, not ...112


def test_chunk_dedup_counts_null_source_group(spark):
    """dedup_chunk_exact: duplicate chunks in a NULL-source document were
    silently dropped by a join keyed on source (NULL keys never match)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    ref = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.isdir(ref):
        pytest.skip("driver testdata absent")
    from clusterindices_spark.operators.dedup import q_dedup_chunk_exact

    schema = pq.read_schema(f"{ref}/documents.parquet").remove_metadata()
    text = "alpha beta gamma delta"
    with tempfile.TemporaryDirectory() as d:
        tbl = pa.Table.from_arrays(
            [
                pa.array([1, 2], type=pa.int64()),
                pa.array([text, text]),
                pa.array(["en", "en"]),
                pa.array(["src0", None]),  # the dup lives in NULL source
                pa.array([len(text)] * 2, type=pa.int64()),
            ],
            schema=schema,
        )
        pq.write_table(tbl, f"{d}/documents.parquet")
        rows = {r["source"]: r for r in
                q_dedup_chunk_exact(spark, d).collect()}
    assert rows[None]["dup_chunks"] == 1
    assert rows["src0"]["dup_chunks"] == 1


def test_assign_argmin_quantized_tie_break(spark):
    """assign() compares round6-quantized d2: two centroids whose true
    distances differ only below 1e-6 must resolve by the CLUSTER-ID
    tie-break, immune to aggregation-order ulps."""
    from clusterindices_spark.operators.assignment import assign

    pts = spark.createDataFrame(
        [(1, 0, [0.0, 0.0])], "vec_id bigint, cluster int, x array<double>"
    )
    # centroid 5 is a hair closer than centroid 2 — but only at the 1e-9
    # scale, far below the 6dp quantum: the smaller cluster id must win
    cents = spark.createDataFrame(
        [(5, [1.0 - 1e-9, 0.0]), (2, [1.0, 0.0])],
        "cluster int, centroid array<double>",
    )
    got = assign(pts, cents).first()
    assert got["assigned_cluster"] == 2


def test_udtf_sentence_token_count_ascii_whitespace(spark):
    """NBSP-joined words are ONE token (Java/RE2 \\s semantics), even
    though Python's str.split would cut them apart."""
    from clusterindices_spark.operators.udfs import SplitSentences

    cls = getattr(SplitSentences, "func", SplitSentences)  # @udtf wrapper
    out = list(cls().eval("nbsp\xa0joined words. two"))
    assert out[0][2] == 2  # 'nbsp<NBSP>joined' + 'words'
    assert out[1][2] == 1


def test_unit_normalization_total_on_null_vectors(spark):
    """The LSH unit() path must tolerate NULL vectors end-to-end (Spark's
    UDF pull-out evaluates array_to_vector below the norm filter)."""
    from clusterindices_spark.operators.similarity import ann_lsh_topk

    emb = spark.createDataFrame(
        [
            (1, [1.0] * 64),
            (2, [0.5] * 64),
            (3, None),  # NULL vector
            (4, [0.0] * 64),  # zero norm
        ],
        "vec_id bigint, x array<double>",
    )
    out = ann_lsh_topk(emb, emb.where(F.col("vec_id") == 1)).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 2 in ids and 3 not in ids and 4 not in ids


def test_ann_lsh_empty_corpus(spark):
    from clusterindices_spark.operators.similarity import ann_lsh_topk

    emb = spark.createDataFrame([], "vec_id bigint, x array<double>")
    assert ann_lsh_topk(emb, emb).count() == 0
