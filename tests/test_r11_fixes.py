"""Regression guards for the round-11 ADVICE fixes.

- tools/fuzz_gate._OVERFLOW_SPARK no longer matches the generic
  'Py4JJavaError' (which matched EVERY Spark exception, auto-explaining any
  XERR whose DuckDB side looked like overflow even when Spark failed for an
  unrelated reason).
- q_embedding_random_projection probes corpus dim PER ROW: a leading
  empty-list embedding no longer drops its whole Arrow batch, and mixed
  per-batch dims project per-row (oracle semantics: unnest + INNER join on
  i drops only the empty row and projects each row's own min(len, 64)
  components).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


# ---------------------------------------------------------------------------
# _explain overflow pin tightening (ADVICE r10 item 1)
# ---------------------------------------------------------------------------

_DUCK_OVERFLOW = "ConversionException: Conversion Error: Out of Range"


def test_explain_rejects_generic_py4j_error():
    """A Spark failure that is NOT overflow (here an ANSI divide) paired
    with a DuckDB overflow must stay UNEXPLAINED — the old pattern's
    'Py4JJavaError' alternative auto-explained it."""
    from fuzz_gate import _explain

    detail = (
        "spark[Py4JJavaError: An error occurred while calling o123.collectToPython: "
        "org.apache.spark.SparkArithmeticException: [DIVIDE_BY_ZERO] Division by zero] "
        f"duck[{_DUCK_OVERFLOW}]"
    )
    assert _explain("events_cuped", "XERR", detail) is None


def test_explain_keeps_real_overflow_pin():
    """Both-engine loud overflow stays explained (the wave-2 ±1e9 class)."""
    from fuzz_gate import _explain

    detail = (
        "spark[ArithmeticException: [ARITHMETIC_OVERFLOW] long overflow. "
        "Use 'try_multiply' to tolerate overflow]"
        f" duck[{_DUCK_OVERFLOW}]"
    )
    assert _explain("events_rolling_zscore", "XERR", detail) is not None


def test_explain_keeps_py4j_wrapped_overflow():
    """Py4J-wrapped ARITHMETIC_OVERFLOW (the marker inside the java trace)
    still matches — only the bare wrapper name stopped matching."""
    from fuzz_gate import _explain

    detail = (
        "spark[Py4JJavaError: An error occurred: "
        "org.apache.spark.SparkArithmeticException: [ARITHMETIC_OVERFLOW] "
        "long overflow]"
        f" duck[{_DUCK_OVERFLOW}]"
    )
    assert _explain("events_rolling_zscore", "XERR", detail) is not None


# ---------------------------------------------------------------------------
# random projection: per-row dim probing (ADVICE r10 item 2)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ragged_emb_dir(tmp_path_factory):
    """An embeddings table whose FIRST row is an empty list and whose rows
    mix dims 0 / 3 / 64 — the exact shapes the old row-0 probe mishandled."""
    root = tmp_path_factory.mktemp("ragged_emb")
    vecs = [
        [],                                  # row 0: empty — old code dropped batch
        [1.0, 2.0, 3.0],                     # dim 3
        [0.5] * 64,                          # dim 64
        [],                                  # another empty
        [2.0, -1.0, 0.25],                   # dim 3 again
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([10, 11, 12, 13, 14], type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([0, 1, 0, 1, 0], type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(root / "embeddings.parquet"))
    return str(root)


def test_random_projection_survives_leading_empty_and_mixed_dims(
    spark, ragged_emb_dir, duckdb_con_factory=None
):
    import duckdb

    from clusterindices_spark.operators.embeddings import (
        ORACLES,
        q_embedding_random_projection,
    )

    got = sorted(
        map(tuple, q_embedding_random_projection(spark, ragged_emb_dir).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{ragged_emb_dir}/embeddings.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLES["embedding_random_projection"]).fetchall()))
    con.close()
    # empty rows emit nothing (oracle unnest of [] -> zero rows); the
    # dim-3 and dim-64 rows each project all 16 output dims
    assert {r[0] for r in got} == {11, 12, 14}
    assert len(got) == 3 * 16
    assert got == want
