"""Partitioned-layout properties: directory pruning reaches the scan (and is
physically real), and dynamic partition overwrite touches only the
partitions it carries."""

from __future__ import annotations

import contextlib
import io
import pathlib
import shutil

import pytest
from pyspark.sql import functions as F

from clusterindices_spark.sources.fixtures import load_table
from clusterindices_spark.sources.partitioned import (
    overwrite_partitions,
    read_partitioned,
    write_partitioned,
)

from tests.conftest import SF_SMOKE


def _events_with_day(spark):
    return load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )


def test_partition_filter_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = _events_with_day(spark)
    write_partitioned(ev, path, ["event_date"])

    full = read_partitioned(spark, path)
    days = sorted(r["event_date"] for r in full.select("event_date").distinct().collect())
    assert len(days) > 1
    target = days[0]
    one_day = full.where(F.col("event_date") == F.lit(str(target)).cast("date"))
    expected = one_day.count()
    assert expected > 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_date" in plan

    # physical proof: with every OTHER partition's files deleted out from
    # under the already-listed FileIndex, the pruned query still answers
    # (it never opens those files) while an unpruned scan must fail trying
    for d in pathlib.Path(path).glob("event_date=*"):
        if d.name != f"event_date={target}":
            shutil.rmtree(d)
    assert one_day.count() == expected
    with pytest.raises(Exception):
        full.where(F.col("value") >= -1e18).count()


def test_dynamic_overwrite_touches_only_carried_partitions(spark, tmp_path):
    path = str(tmp_path / "events_dyn")
    ev = _events_with_day(spark).select("event_id", "value", "event_date")
    write_partitioned(ev, path, ["event_date"])

    days = sorted(
        r["event_date"] for r in ev.select("event_date").distinct().collect()
    )
    target, untouched = days[0], days[1]
    before_untouched = sorted(
        map(
            tuple,
            read_partitioned(spark, path)
            .where(F.col("event_date") == untouched)
            .collect(),
        )
    )

    replacement = (
        ev.where(F.col("event_date") == target)
        .limit(3)
        .withColumn("value", F.lit(-1.0))
    )
    overwrite_partitions(replacement, path, ["event_date"])

    after = read_partitioned(spark, path)
    got_target = after.where(F.col("event_date") == target).collect()
    assert len(got_target) == 3  # fully replaced, not appended
    assert all(r["value"] == -1.0 for r in got_target)
    after_untouched = sorted(
        map(tuple, after.where(F.col("event_date") == untouched).collect())
    )
    assert after_untouched == before_untouched


def test_range_clustered_files_are_disjoint(spark, tmp_path):
    """write_range_clustered must produce files whose parquet footer
    min/max ranges on the cluster key are pairwise DISJOINT (that is the
    skipping guarantee); a plain write leaves every file spanning nearly
    the full key range."""
    import pathlib

    import pyarrow.parquet as pq

    from clusterindices_spark.sources.fixtures import load_table
    from clusterindices_spark.sources.partitioned import write_range_clustered

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")

    def file_ranges(path):
        out = []
        for f in pathlib.Path(path).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index("event_id")
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return sorted(out)

    clustered = str(tmp_path / "clustered")
    write_range_clustered(ev, clustered, ["event_id"], n_files=4)
    ranges = file_ranges(clustered)
    assert len(ranges) == 4
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, ranges  # disjoint, ordered slices

    plain = str(tmp_path / "plain")
    ev.repartition(4).write.parquet(plain)
    overlapping = file_ranges(plain)
    n_total = ev.count()
    span = max(h for _, h in overlapping) - min(lo for lo, _ in overlapping)
    # round-robin files each span ~the whole key range
    assert all((h - lo) > span // 2 for lo, h in overlapping), overlapping

    # and the clustered layout reads back complete + filter-correct
    got = (
        spark.read.parquet(clustered)
        .where(F.col("event_id") < 100)
        .count()
    )
    want = ev.where(F.col("event_id") < 100).count()
    assert got == want
    assert spark.read.parquet(clustered).count() == n_total


def test_zorder_skips_files_on_both_dimensions(spark, tmp_path):
    """Z-order layout must let a box predicate on EITHER clustered column
    skip files via footer min/max stats, where a single-column range
    clustering is tight only on its leading column. Verified by counting
    files whose stats intersect the predicate range."""
    import pathlib

    import pyarrow.parquet as pq

    from clusterindices_spark.sources.fixtures import load_table
    from clusterindices_spark.sources.partitioned import write_zorder_clustered

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )

    def file_stats(path, col):
        out = []
        for f in pathlib.Path(path).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return out

    def files_matching(path, col, lo, hi):
        return sum(
            1 for flo, fhi in file_stats(path, col) if fhi >= lo and flo <= hi
        )

    zpath = str(tmp_path / "zorder")
    write_zorder_clustered(ev, zpath, ["user_id", "value"], n_files=16)
    n_files = len(list(pathlib.Path(zpath).glob("*.parquet")))
    assert n_files == 16

    # selective (decile-mass) predicates on each dimension independently:
    # each must skip at least half the files. Mass-based, not range-based —
    # `value` is heavy-tailed, so a quarter of its RANGE holds ~3/4 of the
    # rows and legitimately touches most files in any layout. A random
    # layout matches all 16 on both; a 1-D layout is tight on its leading
    # column only.
    u_lo, u_q = (
        ev.approxQuantile("user_id", [0.0, 0.1], 0.001)
    )
    assert files_matching(zpath, "user_id", u_lo, u_q) <= n_files // 2

    v_lo, v_q = ev.approxQuantile("value", [0.0, 0.1], 0.001)
    assert files_matching(zpath, "value", v_lo, v_q) <= n_files // 2

    # control: round-robin matches (nearly) everything on both columns
    plain = str(tmp_path / "plainz")
    ev.repartition(16).write.parquet(plain)
    assert files_matching(plain, "user_id", u_lo, u_q) >= n_files - 2
    assert files_matching(plain, "value", v_lo, v_q) >= n_files - 2

    # and the layout is lossless + filter-correct
    got = (
        spark.read.parquet(zpath)
        .where((F.col("user_id") <= u_q) & (F.col("value") <= v_q))
        .count()
    )
    want = ev.where((F.col("user_id") <= u_q) & (F.col("value") <= v_q)).count()
    assert got == want
    assert spark.read.parquet(zpath).count() == ev.count()


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """partitionOverwriteMode=dynamic: an overwrite whose input holds only
    some partition values must replace exactly those partitions and leave
    the rest intact (static mode would truncate the whole table) — the
    incremental-backfill contract for a partitioned 100 TB lake table."""
    path = str(tmp_path / "dpo")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "v INT, p STRING"
    )
    base.write.partitionBy("p").mode("overwrite").parquet(path)
    patch = spark.createDataFrame([(20, "b")], "v INT, p STRING")
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.partitionBy("p").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    got = sorted((r["v"], r["p"]) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a"), (3, "c"), (20, "b")]
