"""Hand-planted semantics for the round-4 time-series operators:
interval merge islands, hierarchical rollup reconciliation, EWMA weights."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_interval_merge_hand_islands(spark, tmp_path, monkeypatch):
    """Events at +0, +3min, +20min with a 5-min halo → the first two merge
    (3min < 5min gap-to-end), the third starts a new span."""
    import clusterindices_spark.operators.relational_ext as rx

    df = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
            (2, "2024-01-01 00:03:00", 7, "click", 1.0, "{}"),
            (3, "2024-01-01 00:20:00", 7, "click", 1.0, "{}"),
        ],
    )
    monkeypatch.setattr(rx, "load_table", lambda s, sf, t: df)
    out = sorted(
        (r["island"], r["n_events"], r["span_end_ms"] - r["span_start_ms"])
        for r in rx.q_window_interval_merge(spark, "ignored").collect()
    )
    # island 1: events 1+2, span 0..(3min+5min); island 2: event 3, 5min
    assert out == [(1, 2, 8 * 60_000), (2, 1, 5 * 60_000)]


def test_rollup_hierarchy_day_equals_sum_of_hours(spark):
    from clusterindices_spark.operators.analytics import (
        q_events_rollup_hierarchy,
    )

    df = q_events_rollup_hierarchy(spark, SF_SMOKE)
    hours = (
        df.where(F.col("grain") == "hour")
        .withColumn(
            "day",
            (F.floor(F.col("bucket_ms") / 86_400_000) * 86_400_000).cast(
                "bigint"
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("n").alias("n"), F.round(F.sum("sum_value"), 6).alias("s"))
    )
    days = df.where(F.col("grain") == "day").select(
        "event_type",
        F.col("bucket_ms").alias("day"),
        "n",
        F.round("sum_value", 6).alias("s"),
    )
    assert sorted(map(tuple, hours.collect())) == sorted(
        map(tuple, days.collect())
    )


def test_ewma_hand_weights(spark, monkeypatch):
    """Three hourly buckets of constant per-hour sums 1, 2, 4 (micros):
    ewma_3 = (4·128 + 2·64 + 1·32) / (128+64+32) integer-div. Head rows
    renormalize over the lags that exist."""
    import clusterindices_spark.operators.analytics as an

    df = _events(
        spark,
        [
            (1, "2024-01-01 00:10:00", 7, "click", 1e-6, "{}"),
            (2, "2024-01-01 01:10:00", 7, "click", 2e-6, "{}"),
            (3, "2024-01-01 02:10:00", 7, "click", 4e-6, "{}"),
        ],
    )
    monkeypatch.setattr(an, "load_table", lambda s, sf, t: df)
    got = {
        r["bucket_ms"]: r["ewma_micros"]
        for r in an.q_events_ewma_smooth(spark, "ignored").collect()
    }
    b0 = 1704067200000  # 2024-01-01T00:00Z epoch ms
    assert got[b0] == 1  # only itself
    assert got[b0 + 3_600_000] == (2 * 128 + 1 * 64) // (128 + 64)
    assert got[b0 + 7_200_000] == (4 * 128 + 2 * 64 + 1 * 32) // (128 + 64 + 32)
