"""Versioned-snapshot (time travel) semantics: immutable versions,
latest-pointer reads, MERGE-into-next-version, and history isolation
(sources/snapshots.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_mapreduce_spark.sources.snapshots import (
    apply_changes,
    list_versions,
    read_snapshot,
    write_snapshot,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "name", "val"],
    )


def test_write_read_roundtrip_and_latest(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = write_snapshot(_base(spark), root)
    assert v1 == 1 and list_versions(root) == [1]
    v2 = write_snapshot(_base(spark).withColumn("val", F.col("val") + 1), root)
    assert v2 == 2
    latest = {r.k: r.val for r in read_snapshot(spark, root).collect()}
    assert latest == {1: 11.0, 2: 21.0, 3: 31.0}
    pinned = {r.k: r.val for r in read_snapshot(spark, root, version=1).collect()}
    assert pinned == {1: 10.0, 2: 20.0, 3: 30.0}


def test_versions_are_immutable(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_snapshot(_base(spark), root)
    with pytest.raises(ValueError, match="immutable"):
        write_snapshot(_base(spark), root, version=1)


def test_read_missing_version_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root)
    write_snapshot(_base(spark), root)
    with pytest.raises(FileNotFoundError, match="version 7"):
        read_snapshot(spark, root, version=7)


def test_apply_changes_commits_next_version_history_intact(spark, tmp_path):
    """MERGE produces v2 with insert/update/delete applied; v1 still
    reads back the original snapshot (time travel across a mutation)."""
    root = str(tmp_path / "tbl")
    write_snapshot(_base(spark), root)
    changes = spark.createDataFrame(
        [(2, "b2", 22.0, "U"), (3, None, None, "D"), (9, "i", 90.0, "I")],
        ["k", "name", "val", "op"],
    )
    v = apply_changes(spark, root, changes, "k")
    assert v == 2
    now = {r.k: (r.name, r.val) for r in read_snapshot(spark, root).collect()}
    assert now == {1: ("a", 10.0), 2: ("b2", 22.0), 9: ("i", 90.0)}
    before = {r.k: (r.name, r.val)
              for r in read_snapshot(spark, root, version=1).collect()}
    assert before == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0)}


def test_apply_changes_chain_three_versions(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_snapshot(_base(spark), root)
    schema = "k long, name string, val double, op string"
    apply_changes(spark, root, spark.createDataFrame(
        [(1, "a", 100.0, "U")], schema), "k")
    apply_changes(spark, root, spark.createDataFrame(
        [(2, None, None, "D")], schema), "k")
    assert list_versions(root) == [1, 2, 3]
    assert {r.k for r in read_snapshot(spark, root).collect()} == {1, 3}
    assert {r.k for r in read_snapshot(spark, root, 2).collect()} == {1, 2, 3}
    v2 = {r.k: r.val for r in read_snapshot(spark, root, 2).collect()}
    assert v2[1] == 100.0


def test_streaming_changes_fold_into_versions(spark, tmp_path):
    """A file-source change stream MERGEs micro-batch-by-micro-batch into
    the versioned table: one new version per non-empty batch, final state
    equals the sequential application, and every intermediate version
    remains readable (time travel across the stream's history)."""
    import json as _json

    from hadoop_mapreduce_spark.streaming.windows import (
        stream_changes_into_snapshots,
    )

    root = str(tmp_path / "tbl")
    write_snapshot(_base(spark), root)

    feed = tmp_path / "changes"
    feed.mkdir()
    rows1 = [{"k": 1, "name": "a2", "val": 100.0, "op": "U"},
             {"k": 9, "name": "i", "val": 90.0, "op": "I"}]
    rows2 = [{"k": 2, "name": None, "val": None, "op": "D"}]
    with open(feed / "b1.json", "w") as fh:
        fh.writelines(_json.dumps(r) + "\n" for r in rows1)
    with open(feed / "b2.json", "w") as fh:
        fh.writelines(_json.dumps(r) + "\n" for r in rows2)

    stream = (
        spark.readStream.schema("k long, name string, val double, op string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = stream_changes_into_snapshots(stream, root, "k")
    q.awaitTermination(120)

    assert list_versions(root) == [1, 2, 3]
    final = {r.k: (r.name, r.val) for r in read_snapshot(spark, root).collect()}
    assert final == {1: ("a2", 100.0), 3: ("c", 30.0), 9: ("i", 90.0)}
    # intermediate history: after batch 1 both changes applied, 2 not yet deleted
    mid = {r.k: r.val for r in read_snapshot(spark, root, version=2).collect()}
    assert mid == {1: 100.0, 2: 20.0, 3: 30.0, 9: 90.0}
    orig = {r.k: r.val for r in read_snapshot(spark, root, version=1).collect()}
    assert orig == {1: 10.0, 2: 20.0, 3: 30.0}


def test_vacuum_retention_and_debris_sweep(spark, tmp_path):
    """vacuum keeps the newest keep_last committed versions, never the
    current one's predecessor count below 1, deletes crashed-write
    debris, and time travel to a vacuumed version raises."""
    import os

    import pytest

    from hadoop_mapreduce_spark.sources.snapshots import (
        list_versions,
        read_snapshot,
        vacuum,
        write_snapshot,
    )

    root = str(tmp_path / "tbl")
    for i in range(4):
        df = spark.range(10 + i).withColumnRenamed("id", "k")
        write_snapshot(df, root)
    assert list_versions(root) == [1, 2, 3, 4]
    # fake a crashed write: version dir without _SUCCESS
    os.makedirs(os.path.join(root, "v=9"))
    with open(os.path.join(root, "v=9", "part-0.parquet"), "wb") as f:
        f.write(b"garbage")
    assert list_versions(root) == [1, 2, 3, 4]  # debris invisible

    deleted = vacuum(root, keep_last=2)
    assert deleted == [1, 2]
    assert list_versions(root) == [3, 4]
    assert not os.path.isdir(os.path.join(root, "v=9"))  # debris swept
    assert read_snapshot(spark, root).count() == 13  # latest intact
    assert read_snapshot(spark, root, version=3).count() == 12
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=1)
    # keep_last clamps to 1: current version survives any argument
    vacuum(root, keep_last=0)
    assert list_versions(root) == [4]


def test_compact_snapshot_preserves_rows_and_history(spark, tmp_path):
    import glob

    from hadoop_mapreduce_spark.sources.snapshots import (
        compact_snapshot,
        list_versions,
        read_snapshot,
        write_snapshot,
    )

    root = str(tmp_path / "tbl")
    df = spark.range(100).withColumnRenamed("id", "k").repartition(8)
    v1 = write_snapshot(df, root)
    assert len(glob.glob(f"{root}/v={v1}/part-*")) == 8  # fragmented
    v2 = compact_snapshot(spark, root, target_files=1)
    assert v2 == v1 + 1
    assert len(glob.glob(f"{root}/v={v2}/part-*")) == 1  # compacted
    # identical content, history intact
    a = sorted(r.k for r in read_snapshot(spark, root, version=v1).collect())
    b = sorted(r.k for r in read_snapshot(spark, root, version=v2).collect())
    assert a == b == list(range(100))
    assert list_versions(root) == [v1, v2]
