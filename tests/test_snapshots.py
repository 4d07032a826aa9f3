"""Snapshot-table contract: time travel, CDC reads, rollback, expiry,
crash invisibility."""

import os

import pytest


def _tbl(tmp_path):
    from pyproj_spark.operators.snapshots import SnapshotTable
    return SnapshotTable(str(tmp_path / "tbl"))


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_time_travel_and_incremental(spark, tmp_path):
    t = _tbl(tmp_path)
    s1 = t.commit(spark.range(0, 3).selectExpr("id"))
    s2 = t.commit(spark.range(3, 5).selectExpr("id"))
    s3 = t.commit(spark.range(5, 9).selectExpr("id"))
    assert (s1, s2, s3) == (1, 2, 3)
    assert _ids(t.read(spark)) == list(range(9))
    assert _ids(t.read(spark, as_of=s1)) == [0, 1, 2]
    assert _ids(t.read(spark, as_of=s2)) == [0, 1, 2, 3, 4]
    assert _ids(t.incremental(spark, from_id=s1)) == [3, 4, 5, 6, 7, 8]
    assert _ids(t.incremental(spark, s1, s2)) == [3, 4]
    assert _ids(t.incremental(spark, s3, s3)) == []
    log = t.snapshots(spark).collect()
    assert [r.snapshot_id for r in log] == [1, 2, 3]
    assert [r.parent_id for r in log] == [None, 1, 2]


def test_overwrite_blocks_incremental_and_resets(spark, tmp_path):
    t = _tbl(tmp_path)
    s1 = t.commit(spark.range(0, 4).selectExpr("id"))
    s2 = t.commit(spark.range(10, 12).selectExpr("id"),
                  operation="overwrite")
    assert _ids(t.read(spark)) == [10, 11]
    assert _ids(t.read(spark, as_of=s1)) == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="overwrite"):
        t.incremental(spark, s1, s2)


def test_rollback_branches_history(spark, tmp_path):
    t = _tbl(tmp_path)
    s1 = t.commit(spark.range(0, 2).selectExpr("id"))
    s2 = t.commit(spark.range(2, 4).selectExpr("id"))
    t.rollback(s1)
    assert _ids(t.read(spark)) == [0, 1]
    s3 = t.commit(spark.range(9, 10).selectExpr("id"))
    # the new snapshot's parent is the rollback target, not s2
    m = {r.snapshot_id: r.parent_id for r in t.snapshots(spark).collect()}
    assert m[s3] == s1
    assert _ids(t.read(spark)) == [0, 1, 9]
    assert _ids(t.read(spark, as_of=s2)) == [0, 1, 2, 3]  # still readable


def test_crashed_commit_is_invisible_and_expired(spark, tmp_path):
    t = _tbl(tmp_path)
    t.commit(spark.range(0, 2).selectExpr("id"))
    # simulate a crash AFTER the data write, BEFORE the manifest swap
    orphan = os.path.join(t.dir, "data", "snap=99")
    spark.range(50, 60).selectExpr("id").write.parquet(orphan)
    assert _ids(t.read(spark)) == [0, 1]          # reader never lists
    deleted = t.expire_snapshots(keep=t.snapshot_ids())
    assert orphan in deleted and not os.path.exists(orphan)
    assert _ids(t.read(spark)) == [0, 1]


def test_expire_drops_unreferenced_data(spark, tmp_path):
    t = _tbl(tmp_path)
    s1 = t.commit(spark.range(0, 2).selectExpr("id"))
    s2 = t.commit(spark.range(2, 4).selectExpr("id"),
                  operation="overwrite")
    deleted = t.expire_snapshots(keep=[s2])
    assert any(f"snap={s1}" in d for d in deleted)
    assert _ids(t.read(spark)) == [2, 3]
    with pytest.raises(FileNotFoundError):
        t.read(spark, as_of=s1)
