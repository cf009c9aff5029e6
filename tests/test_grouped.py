"""Grouped-map Arrow path must agree with the built-in window formulation
(SURVEY.md §2B UDF surface)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clusterindices_spark.operators.grouped import zscore_per_group
from clusterindices_spark.sources.fixtures import load_table

from tests.conftest import SF_SMOKE


def test_zscore_matches_window_formula(spark):
    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    got = {
        r["event_id"]: r["z"]
        for r in zscore_per_group(e, "event_type", "value").collect()
    }
    w = Window.partitionBy("event_type")
    want = {
        r["event_id"]: r["z"]
        for r in e.select(
            "event_id",
            (
                (F.col("value") - F.avg("value").over(w))
                / F.stddev_samp("value").over(w)
            ).alias("z"),
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_zscore_degenerate_groups_are_null(spark):
    """Zero-variance and singleton groups give NULL z — matching the window
    formulation (stddev_samp NULL for one row; /0 NULL under the repo's
    nullif convention), never NaN or a fabricated 0.0."""
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0)],
        "event_id BIGINT, event_type STRING, value DOUBLE",
    )
    rows = zscore_per_group(df, "event_type", "value").collect()
    z = {r["event_id"]: r["z"] for r in rows}
    assert z[1] is None and z[2] is None and z[3] is None


def test_zscore_null_input_gives_null_not_nan(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", None), (3, "a", 3.0)],
        "event_id BIGINT, event_type STRING, value DOUBLE",
    )
    z = {
        r["event_id"]: r["z"]
        for r in zscore_per_group(df, "event_type", "value").collect()
    }
    assert z[2] is None
    assert z[1] is not None and z[3] is not None
