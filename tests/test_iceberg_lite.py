"""Iceberg-lite: atomic partition commits, lineage, idempotent resume
(kill/rerun → identical committed output — north_rule)."""

import os

from pyspark.sql import functions as F

from osm_read_enhanced_spark.sources import iceberg_lite as il


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"), (F.col("id") * 2).alias("v")
    )


def test_write_read_roundtrip(spark, tmp_path):
    table = str(tmp_path / "t1")
    recs = il.write_partitioned(_df(spark, 0, 100), table, "bucket")
    assert len(recs) == 4
    assert sorted(il.committed_partition_ids(table)) == ["0", "1", "2", "3"]
    back = il.read_table(spark, table)
    assert back.count() == 100
    assert back.agg(F.sum("v")).collect()[0][0] == sum(i * 2 for i in range(100))


def test_resume_skips_committed(spark, tmp_path):
    table = str(tmp_path / "t2")
    df = _df(spark, 0, 40)
    # simulate a mid-run kill: only partitions 0,1 committed
    il.write_partition(df.filter("bucket = 0").drop("bucket"), table, "0")
    il.write_partition(df.filter("bucket = 1").drop("bucket"), table, "1")
    manifest_before = il.read_manifest(table)
    # rerun the full job with resume
    recs = il.write_partitioned(df, table, "bucket", resume=True)
    assert sorted(r["partition"] for r in recs) == ["2", "3"]  # only the missing two
    manifest_after = il.read_manifest(table)
    # previously committed partitions untouched (same files, same counts)
    for pid in ("0", "1"):
        assert manifest_after["partitions"][pid] == manifest_before["partitions"][pid]
    assert il.read_table(spark, table).count() == 40


def test_write_partition_idempotent(spark, tmp_path):
    table = str(tmp_path / "t3")
    df = _df(spark, 0, 10).drop("bucket")
    r1 = il.write_partition(df, table, "p0")
    r2 = il.write_partition(df, table, "p0")  # no-op
    assert r1 == r2
    assert len(il.read_manifest(table)["snapshots"]) == 1


def test_lineage_metrics(spark, tmp_path):
    table = str(tmp_path / "t4")
    il.write_partitioned(_df(spark, 0, 100), table, "bucket")
    lin = il.lineage_df(spark, table)
    rows = {r.partition: r.row_count for r in lin.collect()}
    assert rows == {"0": 25, "1": 25, "2": 25, "3": 25}
    assert all(r.wall_ms >= 0 for r in lin.collect())
    # df.observe lineage (SURVEY §2.6 A4): the rows observed flowing
    # through the write plan must equal the rows on disk
    assert all(r.observed_rows == r.row_count for r in lin.collect())


def test_uncommitted_tmp_invisible(spark, tmp_path):
    table = str(tmp_path / "t5")
    il.write_partition(_df(spark, 0, 10).drop("bucket"), table, "a")
    # a crashed writer leaves a tmp dir behind — reader must ignore it
    os.makedirs(os.path.join(table, "_tmp-b-deadbeef"))
    assert il.read_table(spark, table).count() == 10


def test_snapshot_time_travel(spark, tmp_path):
    """as_of_snapshot reads the table as committed through that
    snapshot id; later commits are invisible; unknown ids raise."""
    import pytest

    table = str(tmp_path / "t6")
    il.write_partition(_df(spark, 0, 10).drop("bucket"), table, "a")
    il.write_partition(_df(spark, 100, 120).drop("bucket"), table, "b")
    il.write_partition(_df(spark, 200, 230).drop("bucket"), table, "c")
    assert il.read_table(spark, table).count() == 60
    assert il.read_table(spark, table, as_of_snapshot=1).count() == 10
    assert il.read_table(spark, table, as_of_snapshot=2).count() == 30
    assert il.read_table(spark, table, as_of_snapshot=3).count() == 60
    snap2_ids = {
        r.id for r in il.read_table(spark, table, as_of_snapshot=2).collect()
    }
    assert snap2_ids == set(range(0, 10)) | set(range(100, 120))
    with pytest.raises(ValueError, match="unknown snapshot"):
        il.read_table(spark, table, as_of_snapshot=99)
