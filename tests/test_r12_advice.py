"""Regression guards for the r11 ADVICE items fixed in r12:

1. (medium) hourly_rollup_foreach_batch now shares the LOUD batch-twin
   quantizer (analytics._micros) — out-of-int64-envelope finite values
   raise in the streaming sink exactly like the batch rollup, instead of
   silently persisting ±Long.MAX-saturated sums.
2. (low) funnel_state_stream's old v=-1/0 sentinels conflated "viewed,
   time unknown" / "not reached" with legitimate epoch and pre-1970
   timestamps, permanently blocking progression the batch twin allows.
   Now: _T_UNSET = int64 MIN (pandas NaT bit pattern — unreachable as a
   real datetime64[ns]) + a separate vu boolean.
3. (low) anomaly_state_stream's envelope guard used a rounded 3.03e6
   bound, loud-rejecting values in (3.03e6, 3.037e6] that the batch twin
   computes; the exact bound sqrt((2^63-1)/1e6) now coincides with the
   batch ANSI overflow threshold.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

EV_SCHEMA = (
    "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _stream_from_rows(spark, tmp, rows):
    df = spark.createDataFrame(rows, EV_SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.coalesce(1).write.mode("overwrite").json(tmp)
    from clusterindices_spark.streaming.streams import events_file_stream

    return events_file_stream(spark, tmp)


def test_funnel_pre_epoch_view_progresses_like_batch(spark):
    """A view at or before the 1970 epoch must not block click/purchase
    progression — batch funnel_of (ts > t_view with non-positive t_view)
    progresses normally. The old v=-1/v>0 sentinel logic blocked both."""
    from clusterindices_spark.streaming.streams import (
        funnel_state_stream,
        run_to_completion,
    )

    rows = [
        # user 7: pre-epoch view, then click + purchase → full funnel
        (1, "1969-12-31 23:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 7, "click", 1.0, "{}"),
        (3, "2024-01-01 00:20:00", 7, "purchase", 1.0, "{}"),
        # user 8: view exactly at the epoch (ns == 0) → full funnel
        (4, "1970-01-01 00:00:00", 8, "view", 1.0, "{}"),
        (5, "2024-01-01 00:10:00", 8, "click", 1.0, "{}"),
        (6, "2024-01-01 00:20:00", 8, "purchase", 1.0, "{}"),
        # user 9: NULL-ts view only → stage 1, progression still blocked
        (7, None, 9, "view", 1.0, "{}"),
        (8, "2024-01-01 00:10:00", 9, "click", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        got = run_to_completion(
            funnel_state_stream(_stream_from_rows(spark, tmp, rows)),
            "t_r12_funnel_epoch",
            mode="update",
        ).collect()
    stages = {r["user_id"]: r["stage"] for r in got}
    assert stages[7] == 3
    assert stages[8] == 3
    assert stages[9] == 1
    times = {r["user_id"]: r for r in got}
    # pre-epoch view time is emitted faithfully (negative ms), not -1
    assert times[7]["t_view_ms"] == -3_600_000
    assert times[8]["t_view_ms"] == 0
    # unknown-time view → NULL time, matching batch's NULL t_view
    assert times[9]["t_view_ms"] is None
    assert times[9]["t_click_ms"] is None


def test_anomaly_envelope_edge_accepted_like_batch(spark):
    """Values in (3.03e6, sqrt((2^63-1)/1e6)] are INSIDE the batch twin's
    integer-micro² envelope; the stream must compute them, not reject."""
    from clusterindices_spark.streaming.streams import (
        _ANOMALY_ENVELOPE,
        anomaly_state_stream,
        run_to_completion,
    )

    edge = 3.035e6  # old guard rejected; batch computes
    assert 3.03e6 < edge < _ANOMALY_ENVELOPE
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", edge, "{}"),
        (2, "2024-01-01 00:01:00", 1, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        got = run_to_completion(
            anomaly_state_stream(_stream_from_rows(spark, tmp, rows)),
            "t_r12_anom_edge",
            mode="update",
        ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 2
    # exact integer-micro sums: floor(v*1e6 + 0.5)
    assert r["s1"] == int(edge * 1e6) + 1_000_000
    assert r["s2"] == int(edge * edge * 1e6 + 0.5) + 1_000_000


def test_anomaly_past_envelope_still_loud(spark):
    """Just past the exact bound the stream must still raise (batch twin's
    ANSI CAST_OVERFLOW regime), so the loudness contract survives the
    bound tightening."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from clusterindices_spark.streaming.streams import (
        _ANOMALY_ENVELOPE,
        anomaly_state_stream,
        run_to_completion,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", _ANOMALY_ENVELOPE * 1.01, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        with pytest.raises(StreamingQueryException, match="envelope"):
            run_to_completion(
                anomaly_state_stream(_stream_from_rows(spark, tmp, rows)),
                "t_r12_anom_past",
                mode="update",
            )


def test_rollup_sink_raises_loud_on_out_of_envelope_value(spark):
    """The foreachBatch rollup sink shares analytics._micros: a finite
    value past the int64-micro envelope must ABORT the stream (matching
    the batch twin's CAST_OVERFLOW), not persist a saturated sum."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from clusterindices_spark.streaming.streams import (
        events_file_stream,
        hourly_rollup_foreach_batch,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1e14, "{}"),  # > Long.MAX/1e6
    ]
    with tempfile.TemporaryDirectory() as tmp:
        replay = os.path.join(tmp, "replay")
        df = spark.createDataFrame(rows, EV_SCHEMA).withColumn(
            "ts", F.to_timestamp("ts")
        )
        df.coalesce(1).write.mode("overwrite").json(replay)
        q = hourly_rollup_foreach_batch(
            events_file_stream(spark, replay),
            os.path.join(tmp, "rollup"),
            os.path.join(tmp, "ckpt"),
        )
        with pytest.raises(StreamingQueryException, match="CAST|OVERFLOW|overflow"):
            q.awaitTermination()


def test_rollup_sink_in_envelope_unchanged(spark):
    """Sanity: the shared _micros quantizer produces the same delta sums
    the old local lambda did for in-envelope values."""
    from clusterindices_spark.sources.versioned import read_versioned
    from clusterindices_spark.streaming.streams import (
        events_file_stream,
        hourly_rollup_foreach_batch,
    )

    rows = [
        (1, "2024-01-01 00:10:00", 1, "view", 1.25, "{}"),
        (2, "2024-01-01 00:20:00", 1, "view", 2.5, "{}"),
        (3, "2024-01-01 01:05:00", 1, "click", -0.75, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        replay = os.path.join(tmp, "replay")
        df = spark.createDataFrame(rows, EV_SCHEMA).withColumn(
            "ts", F.to_timestamp("ts")
        )
        df.coalesce(1).write.mode("overwrite").json(replay)
        root = os.path.join(tmp, "rollup")
        q = hourly_rollup_foreach_batch(
            events_file_stream(spark, replay), root, os.path.join(tmp, "ckpt")
        )
        q.awaitTermination()
        got = {
            (r["event_type"], r["bucket_ms"]): (r["n"], r["svm"])
            for r in read_versioned(spark, root).collect()
        }
    h0 = 1704067200000  # 2024-01-01 00:00 UTC in ms
    assert got[("view", h0)] == (2, 3_750_000)
    assert got[("click", h0 + 3_600_000)] == (1, -750_000)  # floor(-749999.5)


def test_census_emits_zero_for_all_null_user_type(spark):
    """10M scale-gate finding (r12): an event type whose every user_id is
    NULL never reaches the pair state, so the census stream emitted no row
    for it while the batch twin emits (type, countDistinct=0). The
    NULL-user placeholder per observed type fixes it."""
    from clusterindices_spark.streaming.streams import (
        distinct_users_census_foreach_batch,
        events_file_stream,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:01:00", 2, "view", 1.0, "{}"),
        # purchases exist but only with NULL users
        (3, "2024-01-01 00:02:00", None, "purchase", 1.0, "{}"),
        (4, "2024-01-01 00:03:00", None, "purchase", 2.0, "{}"),
        # NULL event_type with a real user — NULL group key must census to 1
        (5, "2024-01-01 00:04:00", 3, None, 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        replay = os.path.join(tmp, "replay")
        df = spark.createDataFrame(rows, EV_SCHEMA).withColumn(
            "ts", F.to_timestamp("ts")
        )
        df.coalesce(1).write.mode("overwrite").json(replay)
        q = distinct_users_census_foreach_batch(
            events_file_stream(spark, replay),
            state_dir=os.path.join(tmp, "state"),
            out_dir=os.path.join(tmp, "out"),
            ckpt_dir=os.path.join(tmp, "ckpt"),
        )
        q.awaitTermination()
        got = {
            r["event_type"]: r["distinct_users"]
            for r in spark.read.parquet(os.path.join(tmp, "out")).collect()
        }
    assert got == {"view": 2, "purchase": 0, None: 1}
