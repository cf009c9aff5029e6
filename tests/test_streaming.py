"""Streaming ≡ batch agreement on a bounded replay (SURVEY.md §5.2):
the events fixture is replayed through a file stream; windowed/stateful
results must match the oracle-checked batch queries."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import Window
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


def test_error_rate_stream_matches_batch(spark):
    """The hourly error-rate layer maintained incrementally must equal the
    batch key's per-hour slice (hour, n, n_err, err_rate)."""
    from clusterindices_spark.operators.analytics import q_events_error_rate
    from clusterindices_spark.streaming.streams import error_rate_stream

    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            error_rate_stream(stream), "t_errrate", mode="complete"
        )
        want = q_events_error_rate(spark, SF_SMOKE).select(
            (F.col("hour") * 3_600_000).alias("hour_ms"),
            "n",
            "n_err",
            "err_rate",
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_sliding_stream_matches_batch(spark):
    from clusterindices_spark.operators.sessions import q_stream_sliding_agg
    from clusterindices_spark.streaming.streams import sliding_agg_stream

    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            sliding_agg_stream(stream), "t_sliding", mode="complete"
        ).select("window_start_ms", "event_type", "n")
        want = q_stream_sliding_agg(spark, SF_SMOKE)
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


def test_stream_stream_join_matches_batch(spark):
    from clusterindices_spark.streaming.streams import click_purchase_join_stream

    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            click_purchase_join_stream(stream), "t_ssjoin", mode="append"
        )
        e = load_table(spark, SF_SMOKE, "events")
        c = e.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        p = e.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        want = c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 5 MINUTES")),
        ).select(
            "click_id",
            "purchase_id",
            F.col("c_user").alias("user_id"),
            F.unix_millis(F.col("p_ts")).alias("purchase_ts_ms"),
            F.round("p_value", 6).alias("p_value"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        assert got.count() > 0  # fixture must actually exercise the join


def test_stateful_user_stats_matches_batch(spark):
    from clusterindices_spark.streaming.streams import stateful_user_stats_stream

    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            stateful_user_stats_stream(stream), "t_state", mode="update"
        )
        # update mode re-emits a row per key per microbatch; the final state
        # per user is the row with the highest n_events
        final = {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in got.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
                ),
            )
            .where(F.col("rn") == 1)
            .collect()
        }
        want = {
            r["user_id"]: (r["n"], round(r["s"], 6))
            for r in load_table(spark, SF_SMOKE, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert set(final) == set(want)
        for u in want:
            assert final[u][0] == want[u][0]
            assert abs(final[u][1] - want[u][1]) < 1e-4


def test_foreach_batch_parquet_sink(spark):
    from clusterindices_spark.streaming.streams import write_foreach_batch_parquet

    with tempfile.TemporaryDirectory() as tmp, \
         tempfile.TemporaryDirectory() as out, \
         tempfile.TemporaryDirectory() as ckpt:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        q = write_foreach_batch_parquet(stream, out, ckpt)
        q.awaitTermination()
        written = spark.read.parquet(out)
        n_src = load_table(spark, SF_SMOKE, "events").count()
        assert written.count() == n_src
        assert "batch_id" in written.columns


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


def test_funnel_stream_matches_batch(spark):
    """The stateful streaming funnel's per-stage user counts must equal the
    batch funnel on a bounded replay."""
    from clusterindices_spark.operators.sessions import funnel_of
    from clusterindices_spark.streaming.streams import funnel_state_stream

    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            funnel_state_stream(stream), "t_funnel", mode="update"
        )
        stages = {r["user_id"]: r["stage"] for r in got.collect()}
        n_view = sum(1 for s in stages.values() if s >= 1)
        n_click = sum(1 for s in stages.values() if s >= 2)
        n_purchase = sum(1 for s in stages.values() if s >= 3)
        want = funnel_of(load_table(spark, SF_SMOKE, "events")).collect()[0]
        assert (n_view, n_click, n_purchase) == (
            want["n_view"], want["n_click"], want["n_purchase"],
        )


def test_sessionize_gap_boundary_matches_session_window(spark):
    """An event exactly SESSION_GAP_MIN after the previous one stays in the
    SAME session in BOTH forms: Spark's native session_window treats the
    per-event range [ts, ts+gap] as end-inclusive for the merge test
    (verified here against the engine), so the batch gaps-and-islands form
    must use strict > — a >= would split where the native twin merges."""
    import pandas as pd
    from pyspark.sql import functions as F

    from clusterindices_spark.operators.sessions import (
        SESSION_GAP_MIN,
        sessionize,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
    rows = [
        (1, 7, base.to_pydatetime(), "view", 1.0),
        (2, 7, (base + gap).to_pydatetime(), "view", 1.0),          # == gap
        (3, 7, (base + gap + gap / 2).to_pydatetime(), "view", 1.0),  # < gap
    ]
    e = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP,"
        " event_type STRING, value DOUBLE"
    )
    batch = sessionize(e).select("event_id", "session_id").collect()
    sess_of = {r["event_id"]: r["session_id"] for r in batch}
    assert sess_of[1] == sess_of[2], "exact-gap event merges (end-inclusive)"
    assert sess_of[2] == sess_of[3]
    native = (
        e.groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes"), "user_id")
        .count()
        .collect()
    )
    assert len(native) == len(set(sess_of.values())) == 1


def test_curation_funnel_foreach_batch_matches_batch(spark):
    """Incremental curation funnel (foreachBatch over a doc stream, sink =
    dedup state) must land exactly the batch funnel's retained set when
    docs arrive in doc_id order — VERDICT r3 streaming-depth item."""
    import json as _json
    import os
    import time

    from clusterindices_spark.operators.curation import (
        QUALITY_MIN,
        score_documents,
    )
    from clusterindices_spark.streaming.streams import (
        curation_funnel_foreach_batch,
        docs_file_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").orderBy("doc_id").collect()
    third = (len(docs) + 2) // 3
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as sink_root:
        # three arrival files in ascending doc_id ranges with ascending
        # mtimes, so the file source replays them in order
        for i in range(3):
            part = docs[i * third : (i + 1) * third]
            path = os.path.join(src, f"{i:02d}.json")
            with open(path, "w") as fh:
                for r in part:
                    fh.write(_json.dumps(r.asDict(), default=str) + "\n")
            t = time.time() - 300 + i * 30
            os.utime(path, (t, t))
        out_dir = os.path.join(sink_root, "out")
        ckpt = os.path.join(sink_root, "ckpt")
        stream = docs_file_stream(spark, src, max_files_per_trigger=1)
        q = curation_funnel_foreach_batch(stream, out_dir, ckpt)
        q.awaitTermination()

        sink = spark.read.parquet(out_dir)
        assert sink.select("batch_id").distinct().count() == 3  # incremental
        got = sorted(
            r["doc_id"] for r in sink.where("retained").collect()
        )

        # batch twin: canonical (min doc_id per hash) first, then filters
        scored = score_documents(load_table(spark, SF_SMOKE, "documents"))
        canon = scored.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        want = sorted(
            r["doc_id"]
            for r in scored.join(canon, ["h", "doc_id"])
            .where(
                (F.col("quality") >= QUALITY_MIN) & (F.col("marker_hits") >= 1)
            )
            .collect()
        )
        assert got == want and len(got) > 0


def test_anomaly_state_stream_matches_batch_outliers(spark):
    """Final state = the batch operator's integer-micro moments EXACTLY
    (order/batch-boundary-free integer sums), and on the single-batch
    bounded replay the online flags equal the batch outlier rows."""
    from clusterindices_spark.operators.analytics import q_events_outliers
    from clusterindices_spark.streaming.streams import anomaly_state_stream

    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            anomaly_state_stream(stream), "t_anom", mode="update"
        )
        w = Window.partitionBy("event_type").orderBy(F.col("n").desc())
        final = {
            r["event_type"]: (r["n"], r["s1"], r["s2"], r["n_anomalies"])
            for r in got.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .collect()
        }

        ev = load_table(spark, SF_SMOKE, "events")
        micros = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("bigint")  # noqa: E731
        want = {
            r["event_type"]: (r["n"], r["s1"], r["s2"])
            for r in ev.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(micros(F.col("value"))).alias("s1"),
                F.sum(micros(F.col("value") * F.col("value"))).alias("s2"),
            )
            .collect()
        }
        assert set(final) == set(want)
        for et, (n, s1, s2) in want.items():
            assert final[et][:3] == (n, s1, s2), et

        outliers = {
            r["event_type"]: r["cnt"]
            for r in q_events_outliers(spark, SF_SMOKE)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        for et in final:
            assert final[et][3] == outliers.get(et, 0), et


def test_distinct_users_tws_stream_matches_batch_count_distinct(spark):
    """transformWithStateInPandas census: the final per-type distinct_users
    equals batch countDistinct(user_id) exactly (set union is order- and
    batch-boundary-free), and new_users totals reconcile to the final
    count. The TWS runner speaks protobuf to its state server — skipped
    where google.protobuf is absent (this container; the processor logic
    is still covered by the fake-handle unit test below)."""
    pytest.importorskip("google.protobuf")
    from clusterindices_spark.streaming.streams import (
        distinct_users_tws_stream,
    )

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        _run_tws_case(spark)
    finally:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", prior
        )


def _run_tws_case(spark):
    with tempfile.TemporaryDirectory() as tmp:
        stream = events_file_stream(spark, _replay_dir(spark, tmp))
        got = run_to_completion(
            distinct_users_tws_stream(stream), "t_tws", mode="update"
        )
        w = Window.partitionBy("event_type").orderBy(
            F.col("distinct_users").desc()
        )
        final = {
            r["event_type"]: r["distinct_users"]
            for r in got.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .collect()
        }
        news = {
            r["event_type"]: r["s"]
            for r in got.groupBy("event_type")
            .agg(F.sum("new_users").alias("s"))
            .collect()
        }
        want = {
            r["event_type"]: r["d"]
            for r in load_table(spark, SF_SMOKE, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d"))
            .collect()
        }
        assert final == want
        assert news == want  # every user is new exactly once


def test_distinct_users_census_foreachbatch_matches_batch(spark):
    """Protobuf-free integration twin of the TWS census (VERDICT r3 item 5):
    the foreachBatch pipeline with parquet-externalized seen-user state,
    replayed as TWO microbatches (maxFilesPerTrigger=1 over a 2-file dir),
    must end at exactly batch countDistinct(user_id) per event type, with
    per-batch new_users summing to the final census — the same stream≡batch
    contract the TWS e2e asserts where it can run."""
    from clusterindices_spark.streaming.streams import (
        distinct_users_census_foreach_batch,
        events_file_stream,
    )

    with tempfile.TemporaryDirectory() as tmp:
        replay = os.path.join(tmp, "replay")
        # repartition (not coalesce — it cannot raise a 1-partition source)
        # so the dir really has 2 files → 2 microbatches under
        # maxFilesPerTrigger=1
        load_table(spark, SF_SMOKE, "events").repartition(2).write.mode(
            "overwrite"
        ).json(replay)
        stream = events_file_stream(spark, replay, max_files_per_trigger=1)
        q = distinct_users_census_foreach_batch(
            stream,
            state_dir=os.path.join(tmp, "state"),
            out_dir=os.path.join(tmp, "out"),
            ckpt_dir=os.path.join(tmp, "ckpt"),
        )
        q.awaitTermination()
        out = spark.read.parquet(os.path.join(tmp, "out"))
        assert out.select("batch_id").distinct().count() >= 2  # multi-batch
        w = Window.partitionBy("event_type").orderBy(F.col("batch_id").desc())
        final = {
            r["event_type"]: r["distinct_users"]
            for r in out.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .collect()
        }
        news = {
            r["event_type"]: r["s"]
            for r in out.groupBy("event_type")
            .agg(F.sum("new_users").alias("s"))
            .collect()
        }
        want = {
            r["event_type"]: r["d"]
            for r in load_table(spark, SF_SMOKE, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d"))
            .collect()
        }
        assert final == want
        assert news == want  # every user first-seen exactly once


def test_distinct_users_processor_logic_with_fake_state():
    """Unit-drive the StatefulProcessor against fake MapState/ValueState:
    dedup across batches, running count, per-batch new_users."""
    import pandas as pd

    from clusterindices_spark.streaming.streams import (
        make_distinct_users_processor,
    )

    class FakeValue:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeMap:
        def __init__(self):
            self._m = {}

        def containsKey(self, k):
            return k in self._m

        def updateValue(self, k, v):
            self._m[k] = v

    class FakeHandle:
        def __init__(self):
            self.value = FakeValue()
            self.map = FakeMap()

        def getMapState(self, *a, **kw):
            return self.map

        def getValueState(self, *a, **kw):
            return self.value

    proc = make_distinct_users_processor()
    proc.init(FakeHandle())
    b1 = list(
        proc.handleInputRows(
            ("view",), [pd.DataFrame({"user_id": [1, 2, 2, 3]})], None
        )
    )[0]
    assert (
        b1["distinct_users"][0] == 3 and b1["new_users"][0] == 3
    )
    b2 = list(
        proc.handleInputRows(
            ("view",), [pd.DataFrame({"user_id": [2, 3, 4]})], None
        )
    )[0]
    assert b2["distinct_users"][0] == 4 and b2["new_users"][0] == 1


def test_left_outer_stream_join_matches_batch(spark):
    """Stream-stream LEFT OUTER attribution ≡ the batch left join, once the
    watermark passes every purchase's join window. Outer rows only emit in
    a batch whose watermark has already advanced — so the replay appends
    TWO far-future sentinel click files (watermark for batch N is computed
    from batch N−1) and processes one file per trigger."""
    import time as _time

    from clusterindices_spark.streaming.streams import (
        EVENTS_STREAM_SCHEMA,
        purchase_click_left_join_stream,
    )

    with tempfile.TemporaryDirectory() as tmp:
        _replay_dir(spark, tmp)
        far = "2031-01-01 00:00:00"
        for i in range(2):
            _time.sleep(1.1)  # file source orders batches by modTime
            # sentinels on BOTH branches: the query watermark is the MIN
            # over both withWatermark operators, so a click-only sentinel
            # would leave the purchases-side watermark holding back the
            # final outer emissions
            spark.createDataFrame(
                [
                    (10_000_000 + 2 * i, far, -1, "click", 0.0, "{}"),
                    (10_000_001 + 2 * i, far, -1, "purchase", 0.0, "{}"),
                ],
                EVENTS_STREAM_SCHEMA.replace("ts TIMESTAMP", "ts STRING"),
            ).selectExpr(
                "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
                "event_type", "value", "props",
            ).coalesce(1).write.mode("append").json(tmp)
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).json(tmp)
        got = run_to_completion(
            purchase_click_left_join_stream(stream), "t_louter", mode="append"
        )
        got_rows = sorted(
            (r["purchase_id"], r["click_id"])
            for r in got.collect()
            if r["purchase_id"] < 10_000_000  # drop the sentinels
        )

        ev = load_table(spark, SF_SMOKE, "events")
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        want = sorted(
            (r["purchase_id"], r["click_id"])
            for r in purchases.join(
                clicks,
                (F.col("c_user") == F.col("p_user"))
                & (F.col("p_ts") > F.col("c_ts"))
                & (
                    F.col("p_ts")
                    <= F.col("c_ts") + F.expr("INTERVAL 5 MINUTES")
                ),
                "leftOuter",
            ).collect()
        )
        assert got_rows == want
        assert any(c is None for _, c in got_rows)  # unattributed exist


def test_checkpoint_restart_preserves_state(spark):
    """Operational contract: a stateful stream stopped and restarted from
    the SAME checkpoint resumes its state instead of reprocessing — the
    per-key totals after (run on file A) then (restart on A+B) equal one
    batch pass over A+B, and batch A's rows are not double-counted."""
    import tempfile as _tf

    from clusterindices_spark.streaming.streams import (
        stateful_user_stats_stream,
    )

    with _tf.TemporaryDirectory() as data, _tf.TemporaryDirectory() as ckpt:
        ev = load_table(spark, SF_SMOKE, "events")
        a = ev.where(F.col("user_id") % 2 == 0)
        b = ev.where(F.col("user_id") % 2 == 1)
        a.coalesce(1).write.mode("append").json(data)

        out_dir = ckpt + "_out"

        def run_once(run_label):
            # memory sink refuses checkpoint recovery; foreachBatch +
            # parquet append is the recoverable pattern
            stream = spark.readStream.schema(
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                "event_type STRING, value DOUBLE, props STRING"
            ).json(data)

            def sink(batch_df, batch_id):
                batch_df.withColumn("run", F.lit(run_label)).write.mode(
                    "append"
                ).parquet(out_dir)

            q = (
                stateful_user_stats_stream(stream)
                .writeStream.trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .foreachBatch(sink)
                .start()
            )
            q.awaitTermination()

        run_once(1)
        b.coalesce(1).write.mode("append").json(data)
        run_once(2)
        all_out = spark.read.parquet(out_dir)
        out2 = all_out.where(F.col("run") == 2).drop("run")
        combined = all_out.drop("run")
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        got = {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in combined.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .collect()
        }
        want = {
            r["user_id"]: (r["n"], r["s"])
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 6).alias("s"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for u, (n, _) in want.items():
            assert got[u][0] == n, u
        # restart did NOT reprocess file A: run 2 only emitted B-parity users
        assert all(r["user_id"] % 2 == 1 for r in out2.collect())


def test_hourly_rollup_incremental_matches_batch(spark):
    """Incremental materialized rollup: two microbatches of deltas into a
    versioned table, aggregating reader equals the batch hierarchical
    rollup's hourly grain exactly (associative integer-micro sums), and a
    REPLAYED batch id does not double-count."""
    from clusterindices_spark.operators.analytics import (
        q_events_rollup_hierarchy,
    )
    from clusterindices_spark.sources.fixtures import load_table
    from clusterindices_spark.sources.versioned import history
    from clusterindices_spark.streaming.streams import (
        events_file_stream,
        hourly_rollup_foreach_batch,
        read_hourly_rollup,
    )

    with tempfile.TemporaryDirectory() as tmp:
        replay = os.path.join(tmp, "replay")
        load_table(spark, SF_SMOKE, "events").repartition(2).write.mode(
            "overwrite"
        ).json(replay)
        root = os.path.join(tmp, "rollup")
        q = hourly_rollup_foreach_batch(
            events_file_stream(spark, replay, max_files_per_trigger=1),
            root,
            os.path.join(tmp, "ckpt"),
        )
        q.awaitTermination()
        assert (
            len([h for h in history(root) if h["op"] == "stream_append"]) >= 2
        )
        got = sorted(
            map(
                tuple,
                read_hourly_rollup(spark, root)
                .select(
                    "event_type",
                    "bucket_ms",
                    "n",
                    F.round("sum_value", 6).alias("s"),
                )
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                q_events_rollup_hierarchy(spark, SF_SMOKE)
                .where(F.col("grain") == "hour")
                .select(
                    "event_type",
                    "bucket_ms",
                    "n",
                    F.round("sum_value", 6).alias("s"),
                )
                .collect(),
            )
        )
        assert got == want
        # redelivery: replaying an already-committed batch id is a no-op
        from clusterindices_spark.sources.versioned import (
            append_stream_batch,
            read_versioned,
        )

        n_before = read_versioned(spark, root).count()
        assert (
            append_stream_batch(
                read_versioned(spark, root).limit(1), root, batch_id=0
            )
            is None
        )
        assert read_versioned(spark, root).count() == n_before


def _cusum_ref_means(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    hour = F.floor(F.unix_millis(F.col("ts")) / F.lit(3_600_000)).cast("bigint")
    h = ev.groupBy("event_type", hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return {
        r["event_type"]: int(r["m"])
        for r in h.groupBy("event_type")
        .agg(
            F.floor(
                F.sum("n") * F.lit(1_000_000.0) / F.count(F.lit(1))
            ).cast("bigint").alias("m")
        )
        .collect()
    }


def test_cusum_state_stream_matches_batch(spark):
    """Streaming CUSUM (reference μ0 from the batch stats, as in
    production) finalizes exactly the hours its per-type watermark has
    closed (hour end ≤ max_ts − δ); the final state must equal the batch
    chart's row at the last closed hour EXACTLY — integer state, both
    single-batch and one-file-per-trigger replays."""
    from clusterindices_spark.operators.analytics import q_events_cusum
    from clusterindices_spark.streaming.streams import (
        _duration_ms,
        cusum_state_stream,
    )

    batch = sorted(
        q_events_cusum(spark, SF_SMOKE).collect(),
        key=lambda r: (r["event_type"], r["hour"]),
    )
    by_type = {}
    for r in batch:
        by_type.setdefault(r["event_type"], []).append(r)
    ref = _cusum_ref_means(spark)
    delta_ms = _duration_ms("30 minutes")
    max_ts = {
        r["event_type"]: r["mt"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.max(F.unix_millis("ts")).alias("mt"))
        .collect()
    }

    for mfpt in (None, 1):
        with tempfile.TemporaryDirectory() as tmp:
            stream = events_file_stream(
                spark, _replay_dir(spark, tmp), max_files_per_trigger=mfpt
            )
            got = run_to_completion(
                cusum_state_stream(stream, ref),
                f"t_cusum_{mfpt}",
                mode="update",
            )
            w = Window.partitionBy("event_type").orderBy(
                F.col("hours_finalized").desc()
            )
            final = {
                r["event_type"]: r
                for r in got.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .collect()
            }
            assert set(final) == set(by_type)
            for et, rows in by_type.items():
                g = final[et]
                cutoff = max_ts[et] - delta_ms
                closed = [
                    r for r in rows if (r["hour"] + 1) * 3_600_000 <= cutoff
                ]
                assert closed, et  # fixture spans many hours
                assert g["hours_finalized"] == len(closed), et
                assert g["s_pos"] == closed[-1]["s_pos"], et
                assert g["s_neg"] == closed[-1]["s_neg"], et
                assert g["n_alarm_hours"] == sum(
                    r["is_alarm"] for r in closed
                ), et
                # pending buffer reports the latest (still-open) hour
                last = rows[-1]
                assert g["pending_hour"] == last["hour"], et
                assert g["pending_n"] == last["n"], et


def test_cusum_stream_handles_hour_disorder(spark):
    """Adversarial disorder: hour-100 stragglers arrive in the batch AFTER
    hour 101 opened (admitted by the 30-min watermark). The old contract
    ('events assumed hour-ordered') would have finalized hour 100 short
    and mis-sequenced the chart; the buffered stream must now match a
    big-int replay of the CUSUM recurrence over the TRUE hourly counts."""
    import json
    import os

    from clusterindices_spark.streaming.streams import (
        cusum_state_stream,
        events_file_stream,
        run_to_completion,
    )

    H = 3_600_000  # one hour in ms

    def line(eid, ms):
        import datetime

        iso = (
            datetime.datetime.fromtimestamp(
                ms / 1000, tz=datetime.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]
            + "+00:00"  # explicit offset so session tz can't shift hours
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

    # hour index 100..105 with planted counts; hour-100 has 3 early events
    # in batch 1 and 2 stragglers at :50+ that only arrive in batch 2
    t0 = 100 * H
    batch1 = [line(i, t0 + i * 60_000) for i in range(3)]  # hour 100 early
    batch1 += [line(10 + i, t0 + H + i * 60_000) for i in range(4)]  # hour 101
    # batch-1 max ts = hour 101 @ :03 → watermark hour 100:33; stragglers
    # at 100:50/100:55 are ADMITTED late data
    batch2 = [line(20, t0 + 50 * 60_000), line(21, t0 + 55 * 60_000)]
    batch2 += [line(30 + i, t0 + 2 * H + i * 60_000) for i in range(6)]  # h102
    batch3 = [line(40 + i, t0 + 3 * H + i * 60_000) for i in range(2)]  # h103
    batch3 += [line(50 + i, t0 + 4 * H + i * 60_000) for i in range(5)]  # h104
    true_counts = {100: 5, 101: 4, 102: 6, 103: 2, 104: 5}

    with tempfile.TemporaryDirectory() as tmp:
        for i, lines in enumerate((batch1, batch2, batch3)):
            p = os.path.join(tmp, f"{i:02d}.json")
            with open(p, "w") as f:
                f.write("\n".join(lines) + "\n")
            os.utime(p, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
        mean = 4_000_000  # μ0 = 4 events/hour in micros
        stream = events_file_stream(spark, tmp, max_files_per_trigger=1)
        got = run_to_completion(
            cusum_state_stream(stream, {"A": mean}),
            "t_cusum_disorder",
            mode="update",
        )
        final = (
            got.orderBy(F.col("hours_finalized").desc()).limit(1).collect()[0]
        )
        # replay the recurrence over the true counts for the closed hours:
        # final max_ts = hour 104 @ :04 → cutoff 103:34 → hours ≤ 102 closed
        k, h_thr = mean // 4, 3 * mean
        cp = cpm = cn = cnm = 0
        n_al = 0
        for hr in (100, 101, 102):
            n = true_counts[hr]
            cp += n * 1_000_000 - mean - k
            cpm = min(cpm, cp)
            cn += mean - n * 1_000_000 - k
            cnm = min(cnm, cn)
            sp, sn = cp - min(0, cpm), cn - min(0, cnm)
            n_al += 1 if (sp > h_thr or sn > h_thr) else 0
        assert final["hours_finalized"] == 3
        assert final["s_pos"] == (cp - min(0, cpm)) / 1e6
        assert final["s_neg"] == (cn - min(0, cnm)) / 1e6
        assert final["n_alarm_hours"] == n_al
        assert final["pending_hour"] == 104
        assert final["pending_n"] == true_counts[104]


def test_bootstrap_state_stream_matches_batch_ci(spark):
    """Poisson-bootstrap state is order/batch-boundary-free integer sums,
    so after a bounded replay the streaming CI must equal the batch
    operator's EXACTLY — single-batch and per-file-trigger replays."""
    from clusterindices_spark.operators.analytics import (
        q_events_bootstrap_ci,
    )
    from clusterindices_spark.streaming.streams import bootstrap_state_stream

    want = {
        r["event_type"]: (r["n"], r["mean_value"], r["ci_lo"], r["ci_hi"])
        for r in q_events_bootstrap_ci(spark, SF_SMOKE).collect()
    }
    for mfpt in (None, 1):
        with tempfile.TemporaryDirectory() as tmp:
            stream = events_file_stream(
                spark, _replay_dir(spark, tmp), max_files_per_trigger=mfpt
            )
            got = run_to_completion(
                bootstrap_state_stream(stream), f"t_boot_{mfpt}", mode="update"
            )
            w = Window.partitionBy("event_type").orderBy(
                F.col("n_seen").desc()
            )
            final = {
                r["event_type"]: (
                    r["n_seen"], r["mean_value"], r["ci_lo"], r["ci_hi"]
                )
                for r in got.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .collect()
            }
            assert final == want, mfpt


def test_cdc_mv_stream_matches_batch_incremental_mv(spark):
    """Retraction-stream MV: the merge_upsert_cdc change set replayed as
    a Debezium-shaped CDC stream (base snapshot file + change file, one
    microbatch each) must reproduce agg_incremental_mv's result
    BIT-EXACTLY — signed DECIMAL deltas are associative, so batch/file
    order cannot matter; fully-retracted groups must vanish."""
    from pyspark.sql import functions as F

    from clusterindices_spark.operators.relational_ext import (
        q_agg_incremental_mv,
    )
    from clusterindices_spark.sources.fixtures import load_table
    from clusterindices_spark.sources.versioned import history
    from clusterindices_spark.streaming.streams import (
        cdc_file_stream,
        cdc_mv_foreach_batch,
        read_cdc_mv,
    )

    with tempfile.TemporaryDirectory() as tmp:
        replay = os.path.join(tmp, "replay")
        o = load_table(spark, SF_SMOKE, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        base = o.select(
            F.lit("I").alias("op"),
            "o_orderkey",
            "o_orderstatus",
            F.lit(None).cast("string").alias("old_status"),
            "o_totalprice",
            F.lit(None).cast("double").alias("old_price"),
        )
        deletes = o.where(F.col("o_orderkey") % 23 == 3)
        upd = o.where(F.col("o_orderkey") % 10 == 0).join(
            deletes.select("o_orderkey"), "o_orderkey", "left_anti"
        )
        cdc = (
            deletes.select(
                F.lit("D").alias("op"),
                "o_orderkey",
                F.lit(None).cast("string").alias("o_orderstatus"),
                F.col("o_orderstatus").alias("old_status"),
                F.lit(None).cast("double").alias("o_totalprice"),
                F.col("o_totalprice").alias("old_price"),
            )
            .unionByName(
                upd.select(
                    F.lit("U").alias("op"),
                    "o_orderkey",
                    F.lit("U").alias("o_orderstatus"),
                    F.col("o_orderstatus").alias("old_status"),
                    F.round(F.col("o_totalprice") * 1.1, 6).alias(
                        "o_totalprice"
                    ),
                    F.col("o_totalprice").alias("old_price"),
                )
            )
            .unionByName(
                load_table(spark, SF_SMOKE, "customer")
                .where(F.col("c_custkey") % 100 == 0)
                .select(
                    F.lit("I").alias("op"),
                    (-F.col("c_custkey")).alias("o_orderkey"),
                    F.lit("N").alias("o_orderstatus"),
                    F.lit(None).cast("string").alias("old_status"),
                    F.lit(0.0).alias("o_totalprice"),
                    F.lit(None).cast("double").alias("old_price"),
                )
            )
        )
        base.coalesce(1).write.mode("overwrite").json(replay)
        cdc.coalesce(1).write.mode("append").json(replay)
        root = os.path.join(tmp, "mv")
        q = cdc_mv_foreach_batch(
            cdc_file_stream(spark, replay, max_files_per_trigger=1),
            root,
            os.path.join(tmp, "ckpt"),
        )
        q.awaitTermination()
        assert (
            len([h for h in history(root) if h["op"] == "stream_append"]) >= 2
        )
        got = sorted(map(tuple, read_cdc_mv(spark, root).collect()))
        want = sorted(map(tuple, q_agg_incremental_mv(spark, SF_SMOKE).collect()))
        assert got == want
