"""Planted-input guards for the r11 streaming-processor hardening:
NaT / NULL-key / non-finite handling and the CUSUM beyond-horizon
late-row defense (the engine does NOT late-filter rows ahead of
applyInPandasWithState, so the processor must)."""

from __future__ import annotations

import json
import os
import tempfile

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


def test_funnel_null_ts_view_blocks_progression(spark):
    """A user whose only view has NULL ts counts as viewed (stage 1) but
    cannot progress — funnel_of's min(ts)-skips-NULL semantics."""
    from clusterindices_spark.streaming.streams import (
        funnel_state_stream,
        run_to_completion,
    )

    rows = [
        (1, None, 7, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 7, "click", 1.0, "{}"),
        (3, "2024-01-01 00:20:00", 7, "purchase", 1.0, "{}"),
        # control user: full funnel with real timestamps
        (4, "2024-01-01 00:00:00", 8, "view", 1.0, "{}"),
        (5, "2024-01-01 00:10:00", 8, "click", 1.0, "{}"),
        (6, "2024-01-01 00:20:00", 8, "purchase", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        got = run_to_completion(
            funnel_state_stream(_stream_from_rows(spark, tmp, rows)),
            "t_g_funnel_nats",
            mode="update",
        )
        stages = {r["user_id"]: r["stage"] for r in got.collect()}
    assert stages[7] == 1
    assert stages[8] == 3


def test_funnel_null_user_caps_at_stage_one(spark):
    """funnel_of's click equi-join on user_id never matches NULL — the
    stream's NULL-key group must cap at stage 1 too."""
    from clusterindices_spark.streaming.streams import (
        funnel_state_stream,
        run_to_completion,
    )

    rows = [
        (1, "2024-01-01 00:00:00", None, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", None, "click", 1.0, "{}"),
        (3, "2024-01-01 00:20:00", None, "purchase", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        got = run_to_completion(
            funnel_state_stream(_stream_from_rows(spark, tmp, rows)),
            "t_g_funnel_nullu",
            mode="update",
        )
        rows_out = got.collect()
    assert len(rows_out) == 1
    assert rows_out[0]["stage"] == 1


def test_anomaly_moments_ignore_non_finite_count_all(spark):
    """n counts every row; s1/s2 sum only finite values — the batch
    twin's COUNT(*) + finite_or_null micro sums."""
    from clusterindices_spark.streaming.streams import (
        anomaly_state_stream,
        run_to_completion,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "view", float("nan"), "{}"),
        (3, "2024-01-01 00:02:00", 1, "view", float("inf"), "{}"),
        (4, "2024-01-01 00:03:00", 1, "view", None, "{}"),
        (5, "2024-01-01 00:04:00", 1, "view", 2.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        got = run_to_completion(
            anomaly_state_stream(_stream_from_rows(spark, tmp, rows)),
            "t_g_anom_fin",
            mode="update",
        ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n"], r["s1"], r["s2"]) == (5, 3_000_000, 5_000_000)


def test_cusum_beyond_horizon_straggler_dropped_not_refinalized(spark):
    """A straggler for an hour already closed under the pre-batch cutoff
    must be DROPPED: re-buffering it would finalize the hour twice with
    partial counts (the repartitioned-replay corruption the r11 stream
    gate exposed)."""
    from clusterindices_spark.streaming.streams import (
        cusum_state_stream,
        events_file_stream,
        run_to_completion,
    )

    H = 3_600_000

    def line(eid, ms):
        import datetime

        iso = (
            datetime.datetime.fromtimestamp(
                ms / 1000, tz=datetime.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]
            + "+00:00"
        )
        return json.dumps(
            {
                "event_id": eid,
                "ts": iso,
                "user_id": 1,
                "event_type": "A",
                "value": 1.0,
                "props": "{}",
            }
        )

    t0 = 200 * H
    # batch 1: hours 200..205 (3 events each) — watermark closes ≤ 204
    batch1 = [
        line(100 + h * 10 + i, t0 + h * H + i * 60_000)
        for h in range(6)
        for i in range(3)
    ]
    # batch 2: a straggler for hour 200 (far beyond the 30-min horizon)
    # plus hour 206 rows
    batch2 = [line(900, t0 + 5 * 60_000)] + [
        line(910 + i, t0 + 6 * H + i * 60_000) for i in range(3)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        for i, lines in enumerate((batch1, batch2)):
            p = os.path.join(tmp, f"{i:02d}.json")
            with open(p, "w") as f:
                f.write("\n".join(lines) + "\n")
            os.utime(p, (1_000_000 + i * 1000,) * 2)
        mean = 3_000_000  # μ0 = 3 events/hour in micros
        got = run_to_completion(
            cusum_state_stream(
                events_file_stream(spark, tmp, max_files_per_trigger=1),
                {"A": mean},
            ),
            "t_g_cusum_late",
            mode="update",
        )
        final = (
            got.orderBy(F.col("hours_finalized").desc()).limit(1).collect()[0]
        )
    # batch-1 cutoff 204:32 closes 200..203; batch-2 cutoff 205:32 adds
    # hour 204 → exactly 5 closed hours, each finalized ONCE; the
    # straggler (dropped at the pre-batch horizon) changed nothing
    assert final["hours_finalized"] == 5
    # every closed hour had exactly n=3 = μ0 → both CUSUM sides stay at
    # the allowance drain floor (never negative, never alarmed)
    assert final["n_alarm_hours"] == 0
    assert final["pending_hour"] == 206


def test_cusum_null_ts_rows_ignored(spark):
    from clusterindices_spark.streaming.streams import (
        cusum_state_stream,
        run_to_completion,
    )

    rows = [
        (1, "2024-01-10 00:00:00", 1, "A", 1.0, "{}"),
        (2, None, 1, "A", 1.0, "{}"),
        (3, "2024-01-10 02:30:00", 1, "A", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        got = run_to_completion(
            cusum_state_stream(
                _stream_from_rows(spark, tmp, rows), {"A": 1_000_000}
            ),
            "t_g_cusum_nat",
            mode="update",
        ).collect()
    # hour 0 closes under the 02:30 watermark; the NULL-ts row is neither
    # bucketed nor crashing the datetime64 conversion
    assert len(got) == 1
    assert got[0]["hours_finalized"] == 1
    assert got[0]["pending_n"] == 1
