"""Snapshots + compaction: pinned versions are immutable under appends
AND compaction; compaction reduces file count without changing data."""

from pyspark.sql import functions as F

from rassengine_spark.pipeline.maintenance import (compact_parquet,
                                                   list_snapshots,
                                                   publish_snapshot,
                                                   read_snapshot)


def test_snapshot_pins_through_appends_and_compaction(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # many tiny appends -> many small files
    for i in range(6):
        (spark.range(i * 10, (i + 1) * 10).toDF("id")
         .repartition(1).write.mode("append").parquet(path))
    v1 = publish_snapshot(spark, path)
    assert list_snapshots(path) == [v1]
    v1_rows = set(range(60))
    assert {r.id for r in read_snapshot(spark, path, v1).collect()} \
        == v1_rows

    # append after publish: snapshot unchanged, live table grows
    (spark.range(60, 70).toDF("id")
     .repartition(1).write.mode("append").parquet(path))
    assert {r.id for r in read_snapshot(spark, path, v1).collect()} \
        == v1_rows
    assert spark.read.parquet(path).count() == 70

    # compaction: fewer files, same live data, v1 still resolves
    import glob
    before = len(glob.glob(path + "/*.parquet"))
    after = compact_parquet(spark, path, target_file_mb=1024)
    assert after < before and after >= 1
    assert {r.id for r in spark.read.parquet(path).collect()} \
        == set(range(70))
    assert {r.id for r in read_snapshot(spark, path, v1).collect()} \
        == v1_rows

    v2 = publish_snapshot(spark, path)
    assert {r.id for r in read_snapshot(spark, path, v2).collect()} \
        == set(range(70))


def test_prune_versions_respects_manifests(spark, tmp_path):
    import glob
    import os

    from rassengine_spark.pipeline.maintenance import (drop_snapshot,
                                                       prune_versions)
    path = str(tmp_path / "tbl2")
    for i in range(4):
        (spark.range(i * 5, (i + 1) * 5).toDF("id")
         .repartition(1).write.mode("append").parquet(path))
    v1 = publish_snapshot(spark, path)
    compact_parquet(spark, path, target_file_mb=1024)
    # v1 still references the retained files -> nothing prunable
    assert prune_versions(path) == 0
    assert {r.id for r in read_snapshot(spark, path, v1).collect()} \
        == set(range(20))
    # once the snapshot is dropped, retention reclaims the old files
    drop_snapshot(path, v1)
    assert prune_versions(path) > 0
    assert glob.glob(path + "/.versions/*/*") == []
    assert {r.id for r in spark.read.parquet(path).collect()} \
        == set(range(20))


def test_snapshot_diff_returns_only_appended_rows(spark, tmp_path):
    from rassengine_spark.pipeline.maintenance import (publish_snapshot,
                                                       read_snapshot_diff)

    path = str(tmp_path / "t")
    spark.range(10).write.parquet(path)
    v1 = publish_snapshot(spark, path)
    spark.range(10, 25).write.mode("append").parquet(path)
    v2 = publish_snapshot(spark, path)
    got = sorted(r.id for r in read_snapshot_diff(spark, path, v1, v2)
                 .collect())
    assert got == list(range(10, 25))
    # no appends between snapshots -> empty frame, no crash
    v3 = publish_snapshot(spark, path)
    assert read_snapshot_diff(spark, path, v2, v3).count() == 0


def test_snapshot_diff_empty_keeps_schema(spark, tmp_path):
    from rassengine_spark.pipeline.maintenance import (publish_snapshot,
                                                       read_snapshot_diff)

    path = str(tmp_path / "t")
    spark.range(5).write.parquet(path)
    v1 = publish_snapshot(spark, path)
    v2 = publish_snapshot(spark, path)
    diff = read_snapshot_diff(spark, path, v1, v2)
    assert diff.select("id").count() == 0   # column exists, no rows
