"""Minimal copy-on-write versioned table (the ACID boundary VERDICT r2
named: merge_upsert_cdc applies change images against a bare parquet
snapshot with no versioning). This module adds the smallest useful
transactional layer over plain parquet, built from public table-format
concepts (snapshot manifests, atomic commit by rename, optimistic
concurrency, time travel — the ideas Delta/Iceberg document publicly):

Layout:
    <root>/data/<uuid>/part-*.parquet      immutable data file groups
    <root>/_manifests/v{N}.json            snapshot = list of file groups

Commit protocol: a manifest is written to a temp name and hard-linked to
``v{N}.json`` — link() fails with EEXIST atomically where rename would
OVERWRITE an existing target, so of two writers racing to commit v{N}
exactly one wins and the loser's commit RAISES (optimistic concurrency —
retry on top of the new snapshot). Readers list
manifests and read the named file groups only; a crashed writer leaves an
orphaned data directory that no manifest references (invisible; vacuum is
a deliberate non-goal here).

Operations: create / append (old groups + new group) / overwrite (new
group only) / merge_cdc (copy-on-write: current snapshot ⟕ change batch,
upsert-wins + delete-drops, committed as a full new snapshot) / read at
any version / history.

Scale: manifests carry FILE GROUP paths, not rows — a commit is one
driver-side JSON write regardless of data size; merge_cdc's rewrite cost
is the standard copy-on-write trade documented by every COW table format
(fine for dimension-scale tables; an MOR delete-vector design is out of
scope by the public-knowledge ground rule).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifests")


def _versions(root: str) -> list[int]:
    d = _manifest_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(root: str) -> int | None:
    vs = _versions(root)
    return vs[-1] if vs else None


def _read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(root), f"v{version}.json")) as f:
        return json.load(f)


def _write_data_group(df: DataFrame, root: str) -> str:
    group = os.path.join("data", uuid.uuid4().hex)
    df.write.mode("errorifexists").parquet(os.path.join(root, group))
    return group


def _commit(root: str, version: int, groups: list[str], op: str) -> int:
    """Atomic manifest commit; raises FileExistsError when another writer
    already committed this version (optimistic concurrency)."""
    d = _manifest_dir(root)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"v{version}.json")
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"version": version, "op": op, "groups": groups}, f)
    if os.path.exists(final):  # cheap pre-check; rename below is the gate
        os.remove(tmp)
        raise FileExistsError(
            f"concurrent commit: {root} v{version} already exists"
        )
    try:
        # link+unlink instead of rename: rename OVERWRITES an existing
        # target on POSIX, which would let a racing writer clobber a
        # committed manifest; link() fails with EEXIST atomically
        os.link(tmp, final)
    except FileExistsError:
        raise FileExistsError(
            f"concurrent commit: {root} v{version} already exists"
        ) from None
    finally:
        os.remove(tmp)
    return version


def create(df: DataFrame, root: str) -> int:
    """Create the table at v0 (fails if the table already has versions)."""
    if _versions(root):
        raise FileExistsError(f"versioned table already exists at {root}")
    return _commit(root, 0, [_write_data_group(df, root)], "create")


def append(df: DataFrame, root: str) -> int:
    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no versioned table at {root}")
    groups = _read_manifest(root, v)["groups"] + [_write_data_group(df, root)]
    return _commit(root, v + 1, groups, "append")


def overwrite(df: DataFrame, root: str) -> int:
    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no versioned table at {root}")
    return _commit(root, v + 1, [_write_data_group(df, root)], "overwrite")


def read_versioned(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: the table exactly as of ``version`` (default latest).
    Old versions stay readable until their data groups are vacuumed —
    time travel is just reading an older manifest."""
    v = latest_version(root) if version is None else version
    if v is None or v not in _versions(root):
        raise FileNotFoundError(f"version {version} not found at {root}")
    groups = _read_manifest(root, v)["groups"]
    paths = [os.path.join(root, g) for g in groups]
    return spark.read.parquet(*paths)


def merge_cdc(
    spark: SparkSession, root: str, changes: DataFrame, key: str
) -> int:
    """Copy-on-write MERGE of a CDC batch into the latest snapshot.

    ``changes`` carries (key, op, <payload columns>) with op ∈ {'U','D'}:
    U upserts the row image, D deletes the key. Delete wins over a stale
    base row; an upsert replaces the whole row (the merge_upsert_cdc
    convention). The result commits as a FULL new snapshot — readers of
    older versions are untouched mid-rewrite, and the commit either
    happens entirely or not at all (the manifest is the only mutation).

    OCC ordering: the base version is captured FIRST and the snapshot read
    pinned to it explicitly. Resolving "latest" after the read would let a
    writer commit v+1 in between, making this merge commit v+2 from the
    stale v snapshot and silently dropping the interleaved commit (the
    version numbers no longer collide, so the FileExistsError gate never
    fires). Capturing v first means any racing commit at v+1 surfaces as
    FileExistsError here, as documented. (ADVICE r3, medium.)
    """
    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no versioned table at {root}")
    base = read_versioned(spark, root, v)
    dead = changes.where(F.col("op") == "D").select(key)
    ups = changes.where(F.col("op") == "U").drop("op")
    merged = (
        base.join(changes.select(key).distinct(), key, "left_anti")
        .unionByName(ups)
        .join(dead, key, "left_anti")
    )
    group = _write_data_group(merged, root)
    return _commit(root, v + 1, [group], "merge_cdc")


def history(root: str) -> list[dict]:
    return [_read_manifest(root, v) for v in _versions(root)]


def committed_batch_ids(root: str) -> set[int]:
    """Streaming batch ids already committed to this table (see
    append_stream_batch)."""
    return {
        m["batch_id"]
        for m in history(root)
        if m.get("batch_id") is not None
    }


def append_stream_batch(df: DataFrame, root: str, batch_id: int) -> int | None:
    """Effectively-once streaming append: the foreachBatch body for writing
    a stream into a versioned table. Structured Streaming re-delivers a
    microbatch after a failure with the SAME batch_id; recording the id in
    the manifest makes the append idempotent — a replayed batch is skipped
    instead of double-appended, and a commit race with a concurrent writer
    surfaces as FileExistsError for the stream to retry. Returns the new
    version, or None when the batch was already committed."""
    if batch_id in committed_batch_ids(root):
        return None
    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no versioned table at {root}")
    groups = _read_manifest(root, v)["groups"] + [_write_data_group(df, root)]
    d = _manifest_dir(root)
    final = os.path.join(d, f"v{v + 1}.json")
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": v + 1,
                "op": "stream_append",
                "groups": groups,
                "batch_id": batch_id,
            },
            f,
        )
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise FileExistsError(
            f"concurrent commit: {root} v{v + 1} already exists"
        ) from None
    finally:
        os.remove(tmp)
    return v + 1


def stream_writer(root: str):
    """foreachBatch callback: stream.writeStream.foreachBatch(
    stream_writer(root))."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        append_stream_batch(batch_df, root, batch_id)

    return _write


def vacuum(root: str, keep_last: int = 1, min_age_seconds: float = 3600.0) -> dict:
    """Drop manifests older than the last ``keep_last`` versions and delete
    data groups no retained manifest references (orphans from crashed
    writers). Time travel shrinks to the retained window; the latest
    snapshot is never touched. Returns {removed_versions, removed_groups}.

    Concurrency (ADVICE r3): an unreferenced data directory is ambiguous —
    it is either a crashed writer's orphan OR a live writer's freshly
    written, not-yet-committed group (data is written before the manifest
    commit). Deleting the latter makes the writer's subsequent commit
    reference missing files. The Delta/Iceberg retention pattern resolves
    this with an age threshold: groups younger than ``min_age_seconds``
    (default 1 h, far above any commit latency) are skipped. Pass
    ``min_age_seconds=0`` only when no writer can be active.

    Note also that removing old manifests shrinks committed_batch_ids, so
    append_stream_batch's replay-idempotence covers only batch ids in
    retained manifests — keep ``keep_last`` larger than the stream's
    maximum replay window, or rely on the stream checkpoint (which Spark
    uses first) and treat the manifest ids as a second line of defense.
    """
    import shutil
    import time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _versions(root)
    drop, keep = vs[:-keep_last], vs[-keep_last:]
    referenced = {
        g for v in keep for g in _read_manifest(root, v)["groups"]
    }
    data_dir = os.path.join(root, "data")
    removed_groups = 0
    now = time.time()
    for name in os.listdir(data_dir) if os.path.isdir(data_dir) else []:
        if os.path.join("data", name) in referenced:
            continue
        path = os.path.join(data_dir, name)
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue
        if age < min_age_seconds:
            continue  # possibly a live writer's uncommitted group
        shutil.rmtree(path, ignore_errors=True)
        removed_groups += 1
    for v in drop:
        os.remove(os.path.join(_manifest_dir(root), f"v{v}.json"))
    return {"removed_versions": len(drop), "removed_groups": removed_groups}


# --- registry surface -------------------------------------------------------


def q_versioned_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ACID path INSIDE the correctness gate: create a versioned
    table from a deterministic orders slice, merge a deterministic CDC
    batch (deletes ∪ repriced upserts ∪ inserts), and return the final
    snapshot — every step is a pure function of the fixture, so the DuckDB
    oracle replays the same algebra relationally and the value hash checks
    the entire create→write→commit→merge→time-travel-read machinery."""
    import tempfile

    from clusterindices_spark.sources.fixtures import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    # floor-based 2dp reprice: ROUND(price*1.1, 2) lands on .xx5
    # half-boundaries constantly (2dp inputs × 1.1) and Spark HALF_UP vs
    # DuckDB diverge there — same boundary class round6_stable pins
    r2 = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)  # noqa: E731
    base = o.where(F.col("k") % 4 != 0)
    changes = (
        o.where(F.col("k") % 5 == 0)
        .select(
            "k",
            F.when(F.col("k") % 3 == 0, "D").otherwise("U").alias("op"),
            F.col("status"),
            r2(F.col("price") * 1.1).alias("price"),
        )
    )
    root = tempfile.mkdtemp(prefix="ci-versioned-")
    create(base, root)
    merge_cdc(spark, root, changes, "k")
    snap = read_versioned(spark, root)
    return snap.select(
        "k", "status", (F.floor(F.col("price") * 100.0 + 0.5) / 100.0).alias("price")
    )


QUERIES = {"versioned_merge_snapshot": q_versioned_merge_snapshot}

ORACLES = {
    "versioned_merge_snapshot": """
WITH o AS (
  SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS price
  FROM orders
),
base AS (SELECT * FROM o WHERE k % 4 <> 0),
changes AS (
  SELECT k,
         CASE WHEN k % 3 = 0 THEN 'D' ELSE 'U' END AS op,
         status,
         floor(price * 1.1 * 100.0 + 0.5) / 100.0 AS price
  FROM o WHERE k % 5 = 0
),
kept AS (
  SELECT b.* FROM base b
  WHERE b.k NOT IN (SELECT k FROM changes)
),
ups AS (
  SELECT k, status, price FROM changes WHERE op = 'U'
)
SELECT k, status, floor(price * 100.0 + 0.5) / 100.0 AS price FROM kept
UNION ALL
SELECT k, status, floor(price * 100.0 + 0.5) / 100.0 AS price FROM ups
""",
}
