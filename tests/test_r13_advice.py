"""Regression guards for the r12 ADVICE items fixed in r13:

1. (medium) scalar_json's integer-literal gate used ^...$, where Java's $
   matches BEFORE a final line terminator: '{"k":"123\\n"}' passed the
   gate Spark-side (k=123) while the DuckDB oracle's RE2 $ (end-of-text
   only) answered NULL. The Spark pattern is now \\A[+-]?[0-9]+\\z —
   RE2 whole-string semantics in Java regex, covering \\r and Unicode
   line terminators too. Same fix applied to the URL-safe charset gate
   in sql_features (a source 'abc\\n' must not build a URL the oracle
   rejects). Parity is asserted against DuckDB running the REAL oracle
   SQL on the same parquet.
2. (low) streams.LAST_QUERY_PROGRESS grew without bound across drains
   (run_to_completion always extended, only gate callers cleared). It
   now holds the most recent drain only.
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

# digit strings with trailing line terminators: Java ^...$ matched these,
# RE2 $ does not — they must be NULL in BOTH engines now
_TERMINATOR_PROPS = [
    '{"k":"123\n"}',
    '{"k":"123\r"}',
    '{"k":"-45 "}',
    '{"k":"7 "}',
    '{"k":"9"}',
]


def _events_dir(spark, props_list):
    tmp = tempfile.mkdtemp(prefix="r13adv_")
    rows = [
        (i + 1, "2024-01-01 00:00:00", i, "view", 1.0, p)
        for i, p in enumerate(props_list)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet")
    )
    return tmp


def test_scalar_json_trailing_terminator_is_null_and_matches_oracle(spark):
    from clusterindices_spark.operators.relational import (
        ORACLES,
        q_scalar_json,
    )

    props = _TERMINATOR_PROPS + [
        '{"k":"123"}',    # clean digit string → 123 in both engines
        '{"k":"+08"}',    # signed, leading zero → 8 in both engines
        '{"k":"12 3"}',   # interior space → NULL in both
        '{"k":" 123"}',   # leading space → NULL in both
    ]
    d = _events_dir(spark, props)
    got = {
        r["event_id"]: r["k"]
        for r in q_scalar_json(spark, d).collect()
    }
    n_term = len(_TERMINATOR_PROPS)
    for i in range(1, n_term + 1):
        assert got[i] is None, f"terminator case {props[i-1]!r} leaked {got[i]}"
    assert got[n_term + 1] == 123
    assert got[n_term + 2] == 8
    assert got[n_term + 3] is None
    assert got[n_term + 4] is None

    # engine parity on the REAL oracle SQL over the same parquet
    con = duckdb.connect()
    glob = os.path.join(d, "events.parquet", "*.parquet").replace("'", "''")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob}')"
    )
    oracle = {
        int(eid): k
        for eid, k in con.execute(ORACLES["scalar_json"]).fetchall()
    }
    assert oracle == got


def test_url_safe_gate_rejects_trailing_newline_source(spark):
    """A documents.source of 'abc\\n' passed the Java ^...$ charset gate and
    built a URL the RE2-semantics oracle rejects; \\A...\\z NULLs it in
    both engines."""
    from clusterindices_spark.operators.sql_features import QUERIES

    tmp = tempfile.mkdtemp(prefix="r13url_")
    rows = [
        (1, "text one", "en", "abc\n", 8),
        (2, "text two", "en\r", "goodsrc", 8),
        (3, "text three", "en", "goodsrc", 10),
    ]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars INT",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    fn = QUERIES["scalar_url_parse"]
    out = {r[0]: r[1] for r in fn(spark, tmp).select("doc_id", "url").collect()}
    assert out[1] is None, "source with trailing \\n must not build a URL"
    assert out[2] is None, "lang with trailing \\r must not build a URL"
    assert out[3] is not None


def test_last_query_progress_is_per_drain(spark):
    """Two consecutive drains: the module list must hold only the second
    drain's progress, not the concatenation (unbounded growth + polluted
    peak-state reads)."""
    from clusterindices_spark.streaming import streams as st

    tmp = tempfile.mkdtemp(prefix="r13prog_")
    rows = [
        (i, "2024-01-01 00:%02d:00" % (i % 50), i % 3, "view", 1.0, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").json(tmp)
    ev = st.events_file_stream(spark, tmp)
    agg = ev.groupBy("user_id").agg(F.count("*").alias("n"))

    st.run_to_completion(agg, "r13_prog_a")
    len_a = len(st.LAST_QUERY_PROGRESS)
    assert len_a > 0, "first drain recorded no progress"
    ev2 = st.events_file_stream(spark, tmp)
    agg2 = ev2.groupBy("event_type").agg(F.count("*").alias("n"))
    st.run_to_completion(agg2, "r13_prog_b")
    len_b = len(st.LAST_QUERY_PROGRESS)
    assert len_b <= len_a + 2, (
        f"progress list accumulated across drains: {len_a} then {len_b}"
    )
    # and the retained entries are the SECOND drain's (its query name)
    names = {
        p.get("name") for p in st.LAST_QUERY_PROGRESS if p.get("name")
    }
    assert names <= {"r13_prog_b"}, names
