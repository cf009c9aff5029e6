"""Copy-on-write versioned table: snapshot isolation, time travel, CDC
merge semantics, and the optimistic-concurrency commit gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clusterindices_spark.sources.versioned import (
    _commit,
    append,
    create,
    history,
    latest_version,
    merge_cdc,
    overwrite,
    read_versioned,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, val STRING")


def test_create_append_overwrite_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    assert create(_df(spark, [(1, "a"), (2, "b")]), root) == 0
    assert append(_df(spark, [(3, "c")]), root) == 1
    assert overwrite(_df(spark, [(9, "z")]), root) == 2
    # time travel: every historical snapshot reads exactly as committed
    assert sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root, 0).collect()
    ) == [(1, "a"), (2, "b")]
    assert sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root, 1).collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    assert sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root).collect()
    ) == [(9, "z")]
    ops = [h["op"] for h in history(root)]
    assert ops == ["create", "append", "overwrite"]


def test_merge_cdc_upsert_insert_delete_and_delete_wins(spark, tmp_path):
    root = str(tmp_path / "t")
    create(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), root)
    changes = spark.createDataFrame(
        [
            (2, "U", "b2"),   # update existing
            (4, "U", "d"),    # insert new key
            (3, "D", None),   # delete existing
            (5, "U", "e"),    # same-batch U+D: delete wins
            (5, "D", None),
        ],
        "k BIGINT, op STRING, val STRING",
    ).select("k", "op", "val")
    v = merge_cdc(spark, root, changes, "k")
    assert v == 1
    got = sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root).collect()
    )
    assert got == [(1, "a"), (2, "b2"), (4, "d")]
    # the pre-merge snapshot is untouched (snapshot isolation)
    assert sorted(
        r["k"] for r in read_versioned(spark, root, 0).collect()
    ) == [1, 2, 3]


def test_concurrent_commit_loses(spark, tmp_path):
    """The OCC window is between snapshot-read and commit: a writer that
    planned v1 from the v0 snapshot must FAIL its commit (not clobber)
    when a racer lands v1 first — and the winner's manifest is intact."""
    from clusterindices_spark.sources.versioned import (
        _read_manifest,
        _write_data_group,
    )

    root = str(tmp_path / "t")
    create(_df(spark, [(1, "a")]), root)
    planned = latest_version(root) + 1  # our transaction reads v0, plans v1
    our_group = _write_data_group(_df(spark, [(2, "b")]), root)
    racer = _commit(root, 1, ["data/racer"], "append")  # racer wins v1
    assert racer == 1
    with pytest.raises(FileExistsError, match="concurrent commit"):
        _commit(root, planned, [our_group], "append")
    assert latest_version(root) == 1
    assert _read_manifest(root, 1)["groups"] == ["data/racer"]


def test_create_refuses_existing_table(spark, tmp_path):
    root = str(tmp_path / "t")
    create(_df(spark, [(1, "a")]), root)
    with pytest.raises(FileExistsError, match="already exists"):
        create(_df(spark, [(2, "b")]), root)


def test_reader_never_sees_partial_state(spark, tmp_path):
    """Mid-'transaction' (data written, manifest not committed) the table
    still reads as the previous version — the manifest is the only
    visibility gate."""
    from clusterindices_spark.sources.versioned import _write_data_group

    root = str(tmp_path / "t")
    create(_df(spark, [(1, "a")]), root)
    _write_data_group(_df(spark, [(99, "orphan")]), root)  # no commit
    got = [r["k"] for r in read_versioned(spark, root).collect()]
    assert got == [1]


def test_merge_cdc_distributed_shape(spark, tmp_path):
    """The merge is joins + union on DataFrames (no driver materialization
    of table rows) and scales row counts correctly on a larger batch."""
    root = str(tmp_path / "t")
    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    create(base, root)
    changes = (
        spark.range(0, 500)
        .select(
            (F.col("id") * 2).alias("k"),
            F.when(F.col("id") % 5 == 0, "D").otherwise("U").alias("op"),
            F.lit("new").alias("val"),
        )
    )
    merge_cdc(spark, root, changes, "k")
    out = read_versioned(spark, root)
    # 1000 base − 500 touched + 400 upserts (100 of the 500 are deletes)
    assert out.count() == 1000 - 500 + 400
    assert out.where("val = 'new'").count() == 400


def test_vacuum_drops_unreferenced_groups_keeps_latest(spark, tmp_path):
    import os

    from clusterindices_spark.sources.versioned import (
        _write_data_group,
        history,
        vacuum,
    )

    root = str(tmp_path / "t")
    create(_df(spark, [(1, "a")]), root)
    overwrite(_df(spark, [(2, "b")]), root)   # v0's group now unreferenced
    _write_data_group(_df(spark, [(9, "x")]), root)  # crashed-writer orphan
    # default min_age_seconds (1 h) treats the fresh orphan as a possibly
    # live writer's uncommitted group and leaves it (ADVICE r3 grace period)
    grace = vacuum(root, keep_last=1)
    assert grace["removed_groups"] == 0
    # recreate the dropped manifest state for the aggressive pass
    assert [h["version"] for h in history(root)] == [1]
    out = vacuum(root, keep_last=1, min_age_seconds=0)
    assert out == {"removed_versions": 0, "removed_groups": 2}
    # latest snapshot intact; history collapsed to the retained window
    assert [r["k"] for r in read_versioned(spark, root).collect()] == [2]
    assert [h["version"] for h in history(root)] == [1]
    # exactly one data group remains on disk
    assert len(os.listdir(os.path.join(root, "data"))) == 1
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, root, 0)


def test_stream_append_effectively_once(spark, tmp_path):
    """A versioned table as a streaming sink: one version per microbatch,
    and a REPLAYED batch id (post-crash redelivery) is skipped instead of
    double-appended — the effectively-once contract."""
    from clusterindices_spark.sources.versioned import (
        append_stream_batch,
        committed_batch_ids,
        history,
    )

    root = str(tmp_path / "t")
    create(_df(spark, [(0, "seed")]), root)
    assert append_stream_batch(_df(spark, [(1, "b0")]), root, batch_id=0) == 1
    assert append_stream_batch(_df(spark, [(2, "b1")]), root, batch_id=1) == 2
    # crash/retry: batch 1 is redelivered — must be a no-op
    assert append_stream_batch(_df(spark, [(2, "b1")]), root, batch_id=1) is None
    got = sorted(r["k"] for r in read_versioned(spark, root).collect())
    assert got == [0, 1, 2]
    assert committed_batch_ids(root) == {0, 1}
    assert [h["op"] for h in history(root)][1:] == [
        "stream_append", "stream_append",
    ]


def test_stream_writer_end_to_end(spark, tmp_path):
    """Drive a real bounded stream through the foreachBatch writer: the
    versioned table ends up holding exactly the streamed rows."""
    from clusterindices_spark.sources.versioned import stream_writer

    src = str(tmp_path / "src")
    root = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "k BIGINT, val STRING"
    ).coalesce(1).write.json(src)
    create(spark.createDataFrame([], "k BIGINT, val STRING"), root)
    stream = spark.readStream.schema("k BIGINT, val STRING").json(src)
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(stream_writer(root))
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root).collect()
    )
    assert got == [(1, "x"), (2, "y")]


def _cdc(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, op STRING, val STRING")


def test_merge_cdc_mor_matches_cow_and_compacts(spark, tmp_path):
    """MOR and COW merges produce the same snapshot; two stacked MOR merges
    resolve with seq-aware shadowing (merge-2 shadows merge-1's upsert of
    the same key but not its own row); compact_mor folds the deletes into
    a plain snapshot with identical content."""
    from clusterindices_spark.sources.versioned import (
        _read_manifest,
        compact_mor,
        merge_cdc_mor,
    )

    base = [(k, f"v{k}") for k in range(10)]
    c1 = [(1, "D", None), (2, "U", "two"), (3, "U", "three")]
    c2 = [(2, "U", "TWO"), (3, "D", None), (4, "U", "four")]

    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    for root in (cow, mor):
        create(_df(spark, base), root)
    merge_cdc(spark, cow, _cdc(spark, c1), "k")
    merge_cdc(spark, cow, _cdc(spark, c2), "k")
    merge_cdc_mor(spark, mor, _cdc(spark, c1), "k")
    merge_cdc_mor(spark, mor, _cdc(spark, c2), "k")

    want = sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, cow).collect()
    )
    got = sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, mor).collect()
    )
    assert got == want
    assert (2, "TWO") in got and (3, "three") not in got  # seq shadowing
    # MOR wrote only change-scale groups: 1 base + 2×(ups+delete) = 5
    assert len(_read_manifest(mor, 2)["groups"]) == 3  # data groups only
    assert len(_read_manifest(mor, 2)["deletes"]) == 2
    v = compact_mor(spark, mor)
    m = _read_manifest(mor, v)
    assert not m.get("deletes") and len(m["groups"]) == 1
    assert sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, mor).collect()
    ) == want
    # time travel still resolves the intermediate MOR version
    mid = sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, mor, 1).collect()
    )
    assert (1, "v1") not in mid and (2, "two") in mid


def test_mor_append_carries_deletes_and_key_mismatch_raises(spark, tmp_path):
    from clusterindices_spark.sources.versioned import merge_cdc_mor

    root = str(tmp_path / "t")
    create(_df(spark, [(1, "a"), (2, "b")]), root)
    merge_cdc_mor(spark, root, _cdc(spark, [(1, "D", None)]), "k")
    # append on a MOR table: new rows must NOT be shadowed by older deletes
    append(_df(spark, [(1, "back")]), root)
    assert sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root).collect()
    ) == [(1, "back"), (2, "b")]
    with pytest.raises(ValueError, match="MOR key mismatch"):
        merge_cdc_mor(spark, root, _cdc(spark, [(2, "D", None)]), "val")


def test_stream_append_carries_mor_deletes(spark, tmp_path):
    """ADVICE r4 (high): append_stream_batch wrote its manifest without the
    MOR carry, so a streaming append after merge_cdc_mor dropped the
    'deletes' list and read_versioned's no-deletes fast path resurrected
    previously deleted rows."""
    from clusterindices_spark.sources.versioned import (
        append_stream_batch,
        merge_cdc_mor,
    )

    root = str(tmp_path / "t")
    create(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), root)
    # MOR merge: delete k=1, upsert k=2
    merge_cdc_mor(spark, root, _cdc(spark, [(1, "D", None), (2, "U", "two")]), "k")
    # streaming append into the table with outstanding MOR deletes
    assert append_stream_batch(_df(spark, [(4, "d")]), root, batch_id=0) == 2
    got = sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root).collect()
    )
    # k=1 must STAY deleted, k=2 must stay upserted (no stale "b"), and the
    # streamed k=4 row (seq v+1 > any delete seq) must survive
    assert got == [(2, "two"), (3, "c"), (4, "d")]
    # replay of the same batch id is still idempotent on the MOR table
    assert append_stream_batch(_df(spark, [(4, "d")]), root, batch_id=0) is None
    assert sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root).collect()
    ) == [(2, "two"), (3, "c"), (4, "d")]


def test_vacuum_retains_mor_delete_files(spark, tmp_path):
    from clusterindices_spark.sources.versioned import merge_cdc_mor, vacuum

    root = str(tmp_path / "t")
    create(_df(spark, [(1, "a"), (2, "b")]), root)
    merge_cdc_mor(spark, root, _cdc(spark, [(1, "D", None)]), "k")
    out = vacuum(root, keep_last=1, min_age_seconds=0)
    # base group, upsert group, and the DELETE FILE are all referenced
    assert out["removed_groups"] == 0
    assert sorted(
        (r["k"], r["val"]) for r in read_versioned(spark, root).collect()
    ) == [(2, "b")]
