"""Atomic snapshot commits: crash injection, reader isolation,
single-winner concurrency, partition-granular carry-forward, GC."""

from __future__ import annotations

import json
import os

import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    ConcurrentCommit, latest_version, read_snapshot, snapshot_delete,
    snapshot_prune, snapshot_upsert, snapshot_write,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import snapshots as snapmod


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_snapshot_upsert_delete_semantics(spark, tmp_path):
    """Same merge semantics as the in-place path: highest order_col
    wins, stale replays lose, deletes drop rows and emptied partitions
    vanish from the manifest (no directory-drop step to crash in)."""
    path = str(tmp_path / "tbl")
    v0 = snapshot_write(
        spark, path,
        spark.createDataFrame(
            [(1, "d1", "a", 1), (2, "d1", "b", 1), (3, "d2", "c", 1)],
            "id long, day string, val string, ver int"),
        partition_cols=["day"])
    assert v0 == 0

    ups = spark.createDataFrame([(1, "d1", "a2", 2), (4, "d2", "d", 2)],
                                "id long, day string, val string, ver int")
    v1 = snapshot_upsert(spark, path, ups, ["id"],
                         partition_cols=["day"], order_col="ver")
    assert v1 == 1
    got = _rows(read_snapshot(spark, path).select("id", "day", "val"))
    assert got == {(1, "d1", "a2"), (2, "d1", "b"),
                   (3, "d2", "c"), (4, "d2", "d")}

    # stale replay loses to the newer rows already committed
    stale = spark.createDataFrame([(1, "d1", "old", 1)],
                                  "id long, day string, val string, ver int")
    snapshot_upsert(spark, path, stale, ["id"],
                    partition_cols=["day"], order_col="ver")
    assert _rows(read_snapshot(spark, path)
                 .where("id = 1").select("val")) == {("a2",)}

    # delete all of d2 -> partition disappears entirely
    dels = spark.createDataFrame([(3,), (4,)], "id long")
    snapshot_delete(spark, path, dels, ["id"], partition_cols=["day"])
    got = _rows(read_snapshot(spark, path).select("id", "day"))
    assert got == {(1, "d1"), (2, "d1")}
    m = snapmod._load_manifest(spark, path,
                               latest_version(spark, path))
    assert all(e["partition"] != "day=d2" for e in m["files"])

    # deleting absent keys is a version-preserving no-op
    v_before = latest_version(spark, path)
    assert snapshot_delete(spark, path,
                           spark.createDataFrame([(99,)], "id long"),
                           ["id"], partition_cols=["day"]) == v_before


def test_snapshot_untouched_partitions_carried_by_reference(spark,
                                                            tmp_path):
    """An upsert touching d1 must carry d2's file entries forward
    verbatim — commit cost is the affected partitions only."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "a"), (2, "d2", "b")],
                              "id long, day string, val string"),
        partition_cols=["day"])
    m0 = snapmod._load_manifest(spark, path, 0)
    d2_files = sorted(e["path"] for e in m0["files"]
                      if e["partition"] == "day=d2")
    snapshot_upsert(spark, path,
                    spark.createDataFrame([(1, "d1", "a2")],
                                          "id long, day string, val string"),
                    ["id"], partition_cols=["day"])
    m1 = snapmod._load_manifest(spark, path, 1)
    assert sorted(e["path"] for e in m1["files"]
                  if e["partition"] == "day=d2") == d2_files
    assert sorted(e["path"] for e in m1["files"]
                  if e["partition"] == "day=d1") != \
        sorted(e["path"] for e in m0["files"]
               if e["partition"] == "day=d1")


def test_snapshot_crash_between_write_and_publish(spark, tmp_path,
                                                  monkeypatch):
    """Kill the writer after data files land but before the manifest
    rename: readers still resolve the old consistent snapshot, and a
    retry commits cleanly."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "a")],
                              "id long, day string, val string"),
        partition_cols=["day"])

    real_commit = snapmod._commit_manifest

    def crash(*a, **k):
        raise RuntimeError("injected crash before publish")

    monkeypatch.setattr(snapmod, "_commit_manifest", crash)
    ups = spark.createDataFrame([(1, "d1", "a2")],
                                "id long, day string, val string")
    with pytest.raises(RuntimeError, match="injected"):
        snapshot_upsert(spark, path, ups, ["id"],
                        partition_cols=["day"])
    # old snapshot untouched and fully readable
    assert latest_version(spark, path) == 0
    assert _rows(read_snapshot(spark, path).select("val")) == {("a",)}

    # retry succeeds; the crashed attempt's orphan files are invisible
    monkeypatch.setattr(snapmod, "_commit_manifest", real_commit)
    v = snapshot_upsert(spark, path, ups, ["id"],
                        partition_cols=["day"])
    assert v == 1
    assert _rows(read_snapshot(spark, path).select("val")) == {("a2",)}
    # ... and GC collects them
    stats = snapshot_prune(spark, path, keep_latest=1,
                           orphan_grace_seconds=0)
    assert stats["files_deleted"] >= 1
    assert _rows(read_snapshot(spark, path).select("val")) == {("a2",)}


def test_snapshot_concurrent_reader_sees_pinned_version(spark, tmp_path):
    """A reader that resolved version N keeps reading N's files even
    after a newer version commits mid-query (files are immutable and
    survive until pruned past retention)."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "a"), (2, "d1", "b")],
                              "id long, day string, val string"),
        partition_cols=["day"])
    reader = read_snapshot(spark, path)        # pins version 0's files
    snapshot_upsert(spark, path,
                    spark.createDataFrame([(1, "d1", "changed")],
                                          "id long, day string, val string"),
                    ["id"], partition_cols=["day"])
    assert _rows(reader.select("id", "val")) == {(1, "a"), (2, "b")}
    assert _rows(read_snapshot(spark, path).select("id", "val")) == \
        {(1, "changed"), (2, "b")}


def test_snapshot_concurrent_commit_single_winner(spark, tmp_path):
    """Two writers racing to publish the same version: the second
    rename hits an existing manifest and raises ConcurrentCommit
    instead of interleaving state."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "a")],
                              "id long, day string, val string"),
        partition_cols=["day"])
    snapshot_upsert(spark, path,
                    spark.createDataFrame([(1, "d1", "w1")],
                                          "id long, day string, val string"),
                    ["id"], partition_cols=["day"])   # publishes v1
    with pytest.raises(ConcurrentCommit):
        snapmod._commit_manifest(spark, path, 1, {"version": 1,
                                                  "partition_cols": ["day"],
                                                  "files": []})
    # winner's state intact
    assert _rows(read_snapshot(spark, path).select("val")) == {("w1",)}


def test_snapshot_prune_retention_and_gc(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "v0")],
                              "id long, day string, val string"),
        partition_cols=["day"])
    for k in range(1, 4):
        snapshot_upsert(
            spark, path,
            spark.createDataFrame([(1, "d1", f"v{k}")],
                                  "id long, day string, val string"),
            ["id"], partition_cols=["day"])
    assert latest_version(spark, path) == 3
    stats = snapshot_prune(spark, path, keep_latest=2,
                           orphan_grace_seconds=0)
    assert stats["manifests_dropped"] == 2
    assert stats["files_deleted"] >= 2
    # retained versions still read
    assert _rows(read_snapshot(spark, path).select("val")) == {("v3",)}
    assert _rows(read_snapshot(spark, path, version=2)
                 .select("val")) == {("v2",)}
    with pytest.raises(Exception):
        read_snapshot(spark, path, version=0).collect()
    # only retained files remain under data/
    m2 = snapmod._load_manifest(spark, path, 2)
    m3 = snapmod._load_manifest(spark, path, 3)
    kept = {e["path"] for e in m2["files"]} | \
        {e["path"] for e in m3["files"]}
    on_disk = set()
    for root, _, names in os.walk(str(tmp_path / "tbl" / "data")):
        for n in names:
            if not n.startswith(("_", ".")):
                rel = os.path.relpath(os.path.join(root, n),
                                      str(tmp_path / "tbl" / "data"))
                on_disk.add(rel)
    assert on_disk == kept


def test_snapshot_schema_evolution(spark, tmp_path):
    """Snapshot tables evolve without the in-place path's mergeSchema
    caveat: the manifest carries the evolved schema, so carried-forward
    partitions (whose files predate the new column) read it as NULL."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "a"), (2, "d2", "b")],
                              "id long, day string, val string"),
        partition_cols=["day"])
    with_new = spark.createDataFrame(
        [(1, "d1", "a2", 9.5)],
        "id long, day string, val string, score double")
    with pytest.raises(ValueError, match="score"):
        snapshot_upsert(spark, path, with_new, ["id"],
                        partition_cols=["day"])
    snapshot_upsert(spark, path, with_new, ["id"],
                    partition_cols=["day"], schema_evolution=True)
    # d2 was untouched (carried by reference) yet exposes the new
    # column as NULL — no mergeSchema option anywhere
    got = _rows(read_snapshot(spark, path).select("id", "val", "score"))
    assert got == {(1, "a2", 9.5), (2, "b", None)}

    # a later batch missing the evolved column still merges (rows win
    # with NULL), and the schema keeps the column
    older = spark.createDataFrame([(2, "d2", "b2")],
                                  "id long, day string, val string")
    snapshot_upsert(spark, path, older, ["id"], partition_cols=["day"],
                    schema_evolution=True)
    got = _rows(read_snapshot(spark, path).select("id", "val", "score"))
    assert got == {(1, "a2", 9.5), (2, "b2", None)}


def test_snapshot_mutable_partition_key_and_null_partition(spark,
                                                           tmp_path):
    """immutable_partitions=False merges away a moved key's stale copy;
    NULL partition values round-trip through the hive dir naming."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "a", 1), (2, None, "b", 1)],
                              "id long, day string, val string, ver int"),
        partition_cols=["day"])
    moved = spark.createDataFrame([(1, "d2", "a2", 2)],
                                  "id long, day string, val string, ver int")
    snapshot_upsert(spark, path, moved, ["id"], partition_cols=["day"],
                    order_col="ver", immutable_partitions=False)
    got = _rows(read_snapshot(spark, path).select("id", "day", "val"))
    assert got == {(1, "d2", "a2"), (2, None, "b")}


def test_snapshot_rollback_publishes_forward_copy(spark, tmp_path):
    """Rollback = a NEW version with the old version's file list —
    history stays linear and auditable; the bad version remains
    readable inside the retention window."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "good")],
                              "id long, day string, val string"),
        partition_cols=["day"])
    snapshot_upsert(spark, path,
                    spark.createDataFrame([(1, "d1", "poisoned")],
                                          "id long, day string, val string"),
                    ["id"], partition_cols=["day"])
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_rollback,
    )
    v = snapshot_rollback(spark, path, to_version=0)
    assert v == 2 and latest_version(spark, path) == 2
    assert _rows(read_snapshot(spark, path).select("val")) == {("good",)}
    # the mistake is still auditable
    assert _rows(read_snapshot(spark, path, version=1)
                 .select("val")) == {("poisoned",)}
    m = snapmod._load_manifest(spark, path, 2)
    assert m["rolled_back_from"] == 0


def test_snapshot_compact_merges_fragments(spark, tmp_path):
    """Repeated upserts fragment a partition into per-commit files;
    compaction rewrites affected partitions into few files in ONE new
    version, carrying untouched partitions by reference."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_compact,
    )

    path = str(tmp_path / "tbl")
    # fragment d1 at write time: 6 writer tasks each hold d1 rows, so
    # the commit lands ~6 small files in that partition dir (the same
    # sprawl a wide-parallelism job or streaming sink produces)
    frag = spark.createDataFrame(
        [(i, "d1", f"v{i}") for i in range(60)] + [(1000, "d2", "w")],
        "id long, day string, val string").repartition(6)
    snapshot_write(spark, path, frag, partition_cols=["day"])
    before = snapmod._load_manifest(spark, path,
                                    latest_version(spark, path))
    d1_before = [e for e in before["files"] if e["partition"] == "day=d1"]
    d2_before = [e for e in before["files"] if e["partition"] == "day=d2"]
    rows_before = _rows(read_snapshot(spark, path))

    v = snapshot_compact(spark, path, partitions=["day=d1"])
    after = snapmod._load_manifest(spark, path, v)
    d1_after = [e for e in after["files"] if e["partition"] == "day=d1"]
    d2_after = [e for e in after["files"] if e["partition"] == "day=d2"]
    assert len(d1_after) < len(d1_before) and len(d1_after) >= 1
    # d2 carried by reference, data identical
    assert sorted(e["path"] for e in d2_after) == \
        sorted(e["path"] for e in d2_before)
    assert _rows(read_snapshot(spark, path)) == rows_before

    import pytest
    with pytest.raises(ValueError, match="unknown partitions"):
        snapshot_compact(spark, path, partitions=["day=nope"])


def test_snapshot_prune_grace_protects_inflight_commit(spark, tmp_path,
                                                       monkeypatch):
    """A prune racing a writer mid-commit must NOT delete the writer's
    freshly-written (not-yet-referenced) data files: young orphans are
    protected by the grace window; with grace 0 they are collected."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "a")],
                              "id long, day string, val string"),
        partition_cols=["day"])
    # simulate mid-commit: data files written, manifest not yet
    monkeypatch.setattr(snapmod, "_commit_manifest",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("pause before publish")))
    with pytest.raises(RuntimeError):
        snapshot_upsert(spark, path,
                        spark.createDataFrame([(1, "d1", "a2")],
                                              "id long, day string,"
                                              " val string"),
                        ["id"], partition_cols=["day"])
    # default grace: the in-flight files survive the prune
    stats = snapshot_prune(spark, path, keep_latest=1)
    assert stats["files_deleted"] == 0
    # grace 0 (explicit "no writers running"): they are collected
    stats = snapshot_prune(spark, path, keep_latest=1,
                           orphan_grace_seconds=0)
    assert stats["files_deleted"] >= 1
    assert _rows(read_snapshot(spark, path).select("val")) == {("a",)}


def test_snapshot_delete_preserves_evolved_schema(spark, tmp_path):
    """r7 regression (ADVICE r6, high): snapshot_delete must read the
    affected partitions with the MANIFEST schema. After a schema
    evolution, a delete spanning an old-schema and an evolved
    partition used to infer the schema from one footer and silently
    null the evolved column's surviving values in the rewrite."""
    path = str(tmp_path / "tbl")
    snapshot_write(
        spark, path,
        spark.createDataFrame([(1, "d1", "a"), (2, "d2", "b")],
                              "id long, day string, val string"),
        partition_cols=["day"])
    # evolve: new column `extra`, written only into d2
    snapshot_upsert(
        spark, path,
        spark.createDataFrame([(3, "d2", "c", "KEEP")],
                              "id long, day string, val string, extra string"),
        ["id"], partition_cols=["day"], schema_evolution=True)
    # delete one key from EACH partition: the rewrite now spans an
    # old-schema partition (d1) and an evolved one (d2)
    snapshot_delete(spark, path,
                    spark.createDataFrame([(1,), (2,)], "id long"),
                    ["id"], partition_cols=["day"])
    got = _rows(read_snapshot(spark, path).select("id", "extra"))
    assert got == {(3, "KEEP")}
