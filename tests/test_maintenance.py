from __future__ import annotations

from pyspark.sql import functions as F

from clusterindices_spark.sources.fixtures import load_table
from clusterindices_spark.sources.maintenance import (
    compact_path,
    data_files,
    plan_compaction,
)

from tests.conftest import SF_SMOKE


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "shattered")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    ev.repartition(64).write.parquet(path)
    assert len(data_files(path)) == 64
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    _, total, _ = plan_compaction(path)
    # size the target so the whole dataset lands in exactly 2 files
    n_after = compact_path(spark, path, target_file_bytes=(total + 1) // 2)
    assert n_after == len(data_files(path)) == 2
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_compaction_noops_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "compact")
    spark.range(100).select(F.col("id")).coalesce(1).write.parquet(path)
    files_before = data_files(path)
    assert compact_path(spark, path) == 1
    assert data_files(path) == files_before  # untouched, not rewritten


def test_compaction_preserves_hive_partitioning(spark, tmp_path):
    path = str(tmp_path / "part_shatter")
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "value", F.to_date("ts").alias("event_date"))
    )
    ev.repartition(16).write.partitionBy("event_date").parquet(path)
    n_days = ev.select("event_date").distinct().count()
    assert len(data_files(path)) > n_days  # genuinely shattered
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    n_after = compact_path(spark, path, target_file_bytes=1 << 40)
    # layout intact: hive dirs survive, one file per day
    import pathlib

    dirs = sorted(p.name for p in pathlib.Path(path).glob("event_date=*"))
    assert len(dirs) == n_days
    assert n_after == n_days
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on a growing dataset: a later writer adds a column;
    mergeSchema reads the union schema with NULLs for pre-evolution rows,
    and predicate pushdown still reaches the merged scan."""
    path = str(tmp_path / "evolving")
    v1 = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    v1.write.parquet(path)
    v2 = (
        load_table(spark, SF_SMOKE, "orders")
        .select(
            (F.col("o_orderkey") + 1_000_000).alias("o_orderkey"),
            "o_totalprice",
            F.lit("batch2").alias("ingest_tag"),
        )
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "ingest_tag"}
    n1 = v1.count()
    # pre-evolution rows surface NULL in the new column
    assert merged.where(F.col("ingest_tag").isNull()).count() == n1
    assert merged.where(F.col("ingest_tag") == "batch2").count() == n1
    # pushdown still reaches the merged scan
    q = merged.where(F.col("o_orderkey") == 42).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan, plan


def test_read_text_lines_and_wholetext(spark, tmp_path):
    from clusterindices_spark.sources.readers import read_text_lines

    p = tmp_path / "t"
    p.mkdir()
    (p / "a.txt").write_text("l1\nl2\n")
    (p / "b.txt").write_text("l3\n")
    lines = read_text_lines(spark, str(p))
    assert sorted(r["value"] for r in lines.collect()) == ["l1", "l2", "l3"]
    whole = read_text_lines(spark, str(p), whole=True)
    got = sorted(r["value"] for r in whole.collect())
    assert got == ["l1\nl2\n", "l3\n"]


def test_read_binary_files_glob_and_length_pushdown(spark, tmp_path):
    from clusterindices_spark.sources.readers import read_binary_files

    p = tmp_path / "b"
    p.mkdir()
    (p / "x.bin").write_bytes(b"\x00\x01\x02")
    (p / "y.bin").write_bytes(b"\xff" * 10)
    (p / "skip.dat").write_bytes(b"zz")
    df = read_binary_files(spark, str(p), glob="*.bin")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"x.bin", "y.bin"}
    assert bytes(rows["x.bin"]["content"]) == b"\x00\x01\x02"
    assert rows["y.bin"]["length"] == 10
    # length predicate prunes before content read (listing-level filter)
    small = df.where("length < 5")
    assert [bytes(r["content"]) for r in small.collect()] == [b"\x00\x01\x02"]
