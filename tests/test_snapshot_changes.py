"""Change data feed over snapshot tables: multiset-exact
insert/delete reconstruction, key-paired updates, compaction
neutrality, per-commit attribution, operation audit."""

from __future__ import annotations

import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    snapshot_append, snapshot_changes, snapshot_changes_log,
    snapshot_compact, snapshot_delete, snapshot_history,
    snapshot_rollback, snapshot_upsert, snapshot_write,
)

SCHEMA = "id long, day string, val string, ver int"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _base(spark, path):
    """v0: three rows over two partitions."""
    return snapshot_write(
        spark, path,
        spark.createDataFrame(
            [(1, "d1", "a", 1), (2, "d1", "b", 1), (3, "d2", "c", 1)],
            SCHEMA),
        partition_cols=["day"])


def test_append_changes_are_inserts(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    v1 = snapshot_append(
        spark, path,
        spark.createDataFrame([(4, "d2", "d", 1), (5, "d3", "e", 1)],
                              SCHEMA))
    got = _rows(snapshot_changes(spark, path, v0, v1))
    assert got == {(4, "d2", "d", 1, "insert"),
                   (5, "d3", "e", 1, "insert")}


def test_delete_changes_are_deletes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    v1 = snapshot_delete(spark, path,
                         spark.createDataFrame([(1,), (3,)], "id long"),
                         ["id"], partition_cols=["day"])
    got = _rows(snapshot_changes(spark, path, v0, v1))
    assert got == {(1, "d1", "a", 1, "delete"),
                   (3, "d2", "c", 1, "delete")}


def test_upsert_unchanged_rewritten_rows_cancel(spark, tmp_path):
    """The upsert rewrites all of d1, but row 2 is carried unchanged —
    the feed must NOT report it."""
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    ups = spark.createDataFrame([(1, "d1", "a2", 2), (6, "d1", "f", 2)],
                                SCHEMA)
    v1 = snapshot_upsert(spark, path, ups, ["id"],
                         partition_cols=["day"], order_col="ver")
    got = _rows(snapshot_changes(spark, path, v0, v1)
                .select("id", "day", "val", "ver", "_change_type"))
    assert got == {(1, "d1", "a", 1, "delete"),
                   (1, "d1", "a2", 2, "insert"),
                   (6, "d1", "f", 2, "insert")}


def test_key_cols_pair_updates(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    ups = spark.createDataFrame([(1, "d1", "a2", 2), (6, "d1", "f", 2)],
                                SCHEMA)
    v1 = snapshot_upsert(spark, path, ups, ["id"],
                         partition_cols=["day"], order_col="ver")
    got = _rows(snapshot_changes(spark, path, v0, v1, key_cols=["id"])
                .select("id", "day", "val", "ver", "_change_type"))
    assert got == {(1, "d1", "a", 1, "update_pre"),
                   (1, "d1", "a2", 2, "update_post"),
                   (6, "d1", "f", 2, "insert")}


def test_compaction_yields_empty_feed(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    v1 = snapshot_append(
        spark, path,
        spark.createDataFrame([(4, "d1", "d", 1)], SCHEMA))
    v2 = snapshot_compact(spark, path, target_file_bytes=1 << 30)
    assert snapshot_changes(spark, path, v1, v2).count() == 0
    # across the compaction: only the append's row
    got = _rows(snapshot_changes(spark, path, v0, v2))
    assert got == {(4, "d1", "d", 1, "insert")}


def test_duplicate_rows_diff_as_multiset(spark, tmp_path):
    """Two identical appended rows produce TWO insert rows — the feed
    is a multiset diff, not a set diff."""
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    v1 = snapshot_append(
        spark, path,
        spark.createDataFrame([(9, "d1", "x", 1), (9, "d1", "x", 1)],
                              SCHEMA))
    rows = snapshot_changes(spark, path, v0, v1).collect()
    assert len(rows) == 2
    assert {tuple(r) for r in rows} == {(9, "d1", "x", 1, "insert")}


def test_changes_log_attributes_commits_and_skips_compact(spark,
                                                          tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    v1 = snapshot_append(
        spark, path,
        spark.createDataFrame([(4, "d2", "d", 1)], SCHEMA))
    v2 = snapshot_compact(spark, path, target_file_bytes=1 << 30)
    v3 = snapshot_delete(spark, path,
                         spark.createDataFrame([(2,)], "id long"),
                         ["id"], partition_cols=["day"])
    log = snapshot_changes_log(spark, path, v0, v3)
    got = _rows(log)
    assert got == {(4, "d2", "d", 1, "insert", v1),
                   (2, "d1", "b", 1, "delete", v3)}
    assert v2 not in {r["_commit_version"] for r in log.collect()}


def test_rollback_feed_inverts_the_bad_commit(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    v1 = snapshot_append(
        spark, path,
        spark.createDataFrame([(4, "d2", "bad", 1)], SCHEMA))
    v2 = snapshot_rollback(spark, path, v0)
    got = _rows(snapshot_changes(spark, path, v1, v2))
    assert got == {(4, "d2", "bad", 1, "delete")}
    # endpoint across the mistake and its undo: no net change
    assert snapshot_changes(spark, path, v0, v2).count() == 0


def test_schema_evolution_changes_in_target_schema(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    evolved = spark.createDataFrame([(7, "d1", "g", 1, 0.5)],
                                    SCHEMA + ", score double")
    v1 = snapshot_append(spark, path, evolved, schema_evolution=True)
    df = snapshot_changes(spark, path, v0, v1)
    assert "score" in df.columns
    assert _rows(df) == {(7, "d1", "g", 1, 0.5, "insert")}


def test_same_version_feed_is_empty_with_schema(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    df = snapshot_changes(spark, path, v0, v0)
    assert df.count() == 0
    assert "_change_type" in df.columns and "id" in df.columns


def test_backward_span_raises(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    v1 = snapshot_append(
        spark, path,
        spark.createDataFrame([(4, "d2", "d", 1)], SCHEMA))
    with pytest.raises(ValueError, match="forward-only"):
        snapshot_changes(spark, path, v1, v0)


def test_history_records_operations(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _base(spark, path)
    snapshot_append(spark, path,
                    spark.createDataFrame([(4, "d2", "d", 1)], SCHEMA))
    snapshot_compact(spark, path, target_file_bytes=1 << 30)
    snapshot_delete(spark, path,
                    spark.createDataFrame([(2,)], "id long"),
                    ["id"], partition_cols=["day"])
    ops = [h["operation"] for h in snapshot_history(spark, path)]
    assert ops == ["write", "append", "compact", "delete"]


# -- named refs: tags (r8) --------------------------------------------------

def test_tags_pin_read_and_survive_prune(spark, tmp_path):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        read_snapshot, snapshot_prune, snapshot_tag, snapshot_tags,
        snapshot_untag,
    )

    path = str(tmp_path / "tbl")
    v0 = _base(spark, path)
    snapshot_tag(spark, path, "release-1")          # pins head = v0
    for i in range(4):
        snapshot_append(
            spark, path,
            spark.createDataFrame([(100 + i, "d1", "x", 1)], SCHEMA))
    assert snapshot_tags(spark, path) == {"release-1": v0}

    # read by name = the pinned version's exact content
    got = _rows(read_snapshot(spark, path, tag="release-1")
                .select("id", "val"))
    assert got == {(1, "a"), (2, "b"), (3, "c")}

    # retention would drop v0 (keep_latest=2 of 5 versions) — the tag
    # keeps its manifest AND files alive
    snapshot_prune(spark, path, keep_latest=2, orphan_grace_seconds=0)
    assert _rows(read_snapshot(spark, path, tag="release-1")
                 .select("id", "val")) == got
    # an untagged mid-history version IS gone
    with pytest.raises(Exception):
        read_snapshot(spark, path, version=1).collect()

    # re-point requires overwrite; untag re-exposes to retention
    with pytest.raises(ValueError, match="overwrite"):
        snapshot_tag(spark, path, "release-1")
    snapshot_tag(spark, path, "release-1", overwrite=True)
    assert snapshot_tags(spark, path)["release-1"] == 4
    snapshot_untag(spark, path, "release-1")
    assert snapshot_tags(spark, path) == {}
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, tag="release-1")

    # with the tag gone, retention reclaims v0 — and tagging a pruned
    # version refuses
    snapshot_prune(spark, path, keep_latest=2, orphan_grace_seconds=0)
    with pytest.raises(FileNotFoundError, match="pruned"):
        snapshot_tag(spark, path, "old", version=0)


def test_tag_name_validation_and_exclusivity(spark, tmp_path):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        read_snapshot, snapshot_tag,
    )

    path = str(tmp_path / "tbl")
    _base(spark, path)
    with pytest.raises(ValueError, match="invalid tag name"):
        snapshot_tag(spark, path, "../escape")
    snapshot_tag(spark, path, "ok-1")
    with pytest.raises(ValueError, match="at most one"):
        read_snapshot(spark, path, version=0, tag="ok-1")


def test_changes_read_only_changed_files(spark, tmp_path):
    """The 100 TB contract: the feed's scans touch ONLY files that
    differ between the two manifests. A one-partition upsert against a
    ten-partition table must read that partition's old + new files and
    nothing else, however large the rest of the table is."""
    path = str(tmp_path / "tbl")
    rows = [(i, f"d{i % 10}", f"v{i}", 1) for i in range(200)]
    snapshot_write(spark, path, spark.createDataFrame(rows, SCHEMA),
                   partition_cols=["day"])
    up = spark.createDataFrame([(0, "d0", "CHANGED", 2)], SCHEMA)
    v1 = snapshot_upsert(spark, path, up, ["id"],
                         partition_cols=["day"], order_col="ver")
    feed = snapshot_changes(spark, path, 0, v1, key_cols=["id"])
    files = feed.inputFiles()
    assert files, "expected real file scans under the feed"
    assert all("day=d0" in f for f in files), files
    got = {(r["id"], r["_change_type"]) for r in feed.collect()}
    assert got == {(0, "update_pre"), (0, "update_post")}


def test_unchanged_null_valued_rows_cancel(spark, tmp_path):
    """A rewritten-but-unchanged row carrying NULL in a data column
    must cancel in the multiset diff: the full_outer cancellation
    join is built with eqNullSafe per column — a null-unsafe
    USING-column join would surface the row as a phantom
    insert+delete pair (r8 advisor finding)."""
    path = str(tmp_path / "tbl")
    v0 = snapshot_write(
        spark, path,
        spark.createDataFrame(
            [(1, "d1", None, 1), (2, "d1", "b", 1)], SCHEMA),
        partition_cols=["day"])
    # rewrite all of d1: row 2 updated, row 1 (NULL val) carried
    # through the rewrite unchanged
    ups = spark.createDataFrame([(2, "d1", "b2", 2)], SCHEMA)
    v1 = snapshot_upsert(spark, path, ups, ["id"],
                         partition_cols=["day"], order_col="ver")
    got = _rows(snapshot_changes(spark, path, v0, v1,
                                 key_cols=["id"])
                .select("id", "day", "val", "ver", "_change_type"))
    assert got == {(2, "d1", "b", 1, "update_pre"),
                   (2, "d1", "b2", 2, "update_post")}, \
        "the NULL-valued unchanged row must not appear in the feed"
