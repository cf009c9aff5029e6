"""Streaming ≡ batch agreement on a bounded replay (SURVEY.md §5.2):
the events fixture is replayed through a file stream; windowed/stateful
results must match the oracle-checked batch queries."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from clusterindices_spark.operators.sessions import (
    q_stream_session_windows,
    q_stream_tumbling_agg,
)
from clusterindices_spark.sources.fixtures import load_table
from clusterindices_spark.streaming.streams import (
    dedup_stream,
    events_file_stream,
    run_to_completion,
    session_window_stream,
    tumbling_agg_stream,
)

from tests.conftest import SF_SMOKE


def _replay_dir(spark, tmp):
    load_table(spark, SF_SMOKE, "events").coalesce(2).write.mode("overwrite").json(tmp)
    return tmp


def test_tumbling_stream_matches_batch(spark):
    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            tumbling_agg_stream(stream), "t_tumbling", mode="complete"
        )
        want = q_stream_tumbling_agg(spark, SF_SMOKE)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_stream_matches_batch_session_count(spark):
    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            session_window_stream(stream), "t_sessions", mode="complete"
        )
        want = q_stream_session_windows(spark, SF_SMOKE)
        # session_window and gaps-and-islands must agree on session count,
        # per-user counts, and total events
        assert got.count() == want.count()
        g = {r["user_id"]: r["n"] for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
        w = {r["user_id"]: r["n"] for r in want.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
        assert g == w
        assert (
            got.agg(F.sum("n_events")).first()[0]
            == want.agg(F.sum("n_events")).first()[0]
        )


def test_session_gap_semantics(spark):
    # FIXTURES.md session_gaps: +0, +10min, +50min, +60min at 30-min gap -> 2 sessions
    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 7, "click", 1.0, "{}"),
        (3, "2024-01-01 00:50:00", 7, "click", 1.0, "{}"),
        (4, "2024-01-01 01:00:00", 7, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).withColumn("ts", F.to_timestamp("ts"))
    from clusterindices_spark.operators.sessions import sessionize

    sess = sessionize(df).groupBy("session_id").count().collect()
    assert sorted((r["session_id"], r["count"]) for r in sess) == [(1, 2), (2, 2)]
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").json(tmp)
        got = run_to_completion(
            session_window_stream(events_file_stream(spark, tmp)),
            "t_gap", mode="complete",
        ).collect()
        assert sorted(r["n_events"] for r in got) == [2, 2]


def test_dedup_stream_drops_watermark_duplicates(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
        (1, "2024-01-01 00:01:00", 7, "click", 1.0, "{}"),  # dup within horizon
        (2, "2024-01-01 00:02:00", 7, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).withColumn("ts", F.to_timestamp("ts"))
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").json(tmp)
        got = run_to_completion(
            dedup_stream(events_file_stream(spark, tmp)), "t_dedup", mode="append"
        )
        assert sorted(r["event_id"] for r in got.collect()) == [1, 2]
