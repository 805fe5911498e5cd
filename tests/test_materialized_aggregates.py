"""Atomic CDC changeset apply + incrementally-maintained aggregate
views: one-commit MERGE semantics, replay-marker exactly-once, and
the IVM contract — after a sync the view equals a from-scratch
groupBy, while the additive path provably never re-reads the base
table."""

from __future__ import annotations

import glob
import math
import os

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    latest_version, read_snapshot, snapshot_append,
    snapshot_apply_changes, snapshot_compact, snapshot_delete,
    snapshot_history, snapshot_upsert, snapshot_write,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
    aggregate_sync_snapshot,
)

SCHEMA = "id long, day string, val string"
CH_SCHEMA = SCHEMA + ", _op string"


def _rows(spark, path):
    return {(r["id"], r["day"], r["val"]) for r in
            read_snapshot(spark, path).collect()}


def _base(spark, path):
    return snapshot_write(
        spark, path,
        spark.createDataFrame(
            [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")], SCHEMA),
        partition_cols=["day"])


# ---------------------------------------------------------------- #
# snapshot_apply_changes                                            #
# ---------------------------------------------------------------- #

def test_apply_changes_mixed_changeset_is_one_commit(spark, tmp_path):
    """Upserts and deletes land together in ONE version, and the
    result equals the sequential upsert-then-delete composition."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _base(spark, a)
    _base(spark, b)
    ch = spark.createDataFrame(
        [(2, "d1", "B", "upsert"), (4, "d2", "d", "upsert"),
         (3, "d2", None, "delete")], CH_SCHEMA)
    v = snapshot_apply_changes(spark, a, ch, ["id"],
                               partition_cols=["day"])
    assert v == 1 and latest_version(spark, a) == 1
    assert snapshot_history(spark, a)[-1]["operation"] \
        == "apply_changes"
    snapshot_upsert(spark, b, spark.createDataFrame(
        [(2, "d1", "B"), (4, "d2", "d")], SCHEMA), ["id"],
        partition_cols=["day"])
    snapshot_delete(spark, b, spark.createDataFrame([(3,)], "id long"),
                    ["id"], partition_cols=["day"])
    assert _rows(spark, a) == _rows(spark, b) \
        == {(1, "d1", "a"), (2, "d1", "B"), (4, "d2", "d")}


def test_apply_changes_replay_marker_is_exactly_once(spark, tmp_path):
    """A replayed source_batch is a version-preserving no-op — the
    whole changeset is covered by one marker riding the commit."""
    path = str(tmp_path / "tbl")
    # create-from-changeset records the marker too
    ch0 = spark.createDataFrame([(1, "d1", "a", "upsert")], CH_SCHEMA)
    assert snapshot_apply_changes(
        spark, path, ch0, ["id"], partition_cols=["day"],
        source_batch=("cdc", 0)) == 0
    ch1 = spark.createDataFrame(
        [(1, "d1", None, "delete"), (2, "d1", "b", "upsert")],
        CH_SCHEMA)
    v = snapshot_apply_changes(spark, path, ch1, ["id"],
                               partition_cols=["day"],
                               source_batch=("cdc", 1))
    before = _rows(spark, path)
    for replayed in (0, 1):
        assert snapshot_apply_changes(
            spark, path, ch1, ["id"], partition_cols=["day"],
            source_batch=("cdc", replayed)) == v
    assert latest_version(spark, path) == v
    assert _rows(spark, path) == before == {(2, "d1", "b")}


def test_apply_changes_untouched_partitions_carry_by_reference(
        spark, tmp_path):
    """A changeset confined to one partition leaves the other
    partitions' data FILES untouched (same physical paths), so the
    commit cost is O(affected partitions)."""
    path = str(tmp_path / "tbl")
    rows = [(i, f"d{i % 8}", f"v{i}") for i in range(80)]
    snapshot_write(spark, path, spark.createDataFrame(rows, SCHEMA),
                   partition_cols=["day"])
    before = {f for f in read_snapshot(spark, path).inputFiles()
              if "day=d0" not in f}
    snapshot_apply_changes(
        spark, path,
        spark.createDataFrame([(0, "d0", "NEW", "upsert"),
                               (8, "d0", None, "delete")], CH_SCHEMA),
        ["id"], partition_cols=["day"])
    after = {f for f in read_snapshot(spark, path).inputFiles()
             if "day=d0" not in f}
    assert before == after
    got = {r["id"]: r["val"] for r in
           read_snapshot(spark, path).where("day = 'd0'").collect()}
    assert got[0] == "NEW" and 8 not in got


def test_apply_changes_contracts(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _base(spark, path)
    with pytest.raises(ValueError, match="unknown '_op'"):
        snapshot_apply_changes(
            spark, path,
            spark.createDataFrame([(9, "d1", "x", "del")], CH_SCHEMA),
            ["id"], partition_cols=["day"])
    with pytest.raises(ValueError, match="partition_cols"):
        snapshot_apply_changes(
            spark, path,
            spark.createDataFrame([(9, "d1", "x", "upsert")],
                                  CH_SCHEMA),
            ["id"], partition_cols=["val"])
    # empty changeset: current version, no commit
    empty = spark.createDataFrame([], CH_SCHEMA)
    assert snapshot_apply_changes(
        spark, path, empty, ["id"], partition_cols=["day"]) \
        == latest_version(spark, path) == 0
    # a delete-only changeset against no table CREATES it empty
    # (schema from the changeset) — an initial sync from an empty
    # source must yield an empty replica, not an error
    nope = str(tmp_path / "nope")
    assert snapshot_apply_changes(
        spark, nope,
        spark.createDataFrame([(1, "d1", None, "delete")], CH_SCHEMA),
        ["id"], partition_cols=["day"]) == 0
    assert read_snapshot(spark, nope).count() == 0


# ---------------------------------------------------------------- #
# aggregate_sync_snapshot                                           #
# ---------------------------------------------------------------- #

MEAS = {"n": ("count", None), "nn": ("count", "val"),
        "s": ("sum", "val")}
AGG_SCHEMA = "id long, g string, p string, val double"


def _full(df):
    return {(r["g"], r["p"]): (r["n"], r["nn"], r["s"]) for r in
            df.groupBy("g", "p").agg(
                F.count("*").alias("n"), F.count("val").alias("nn"),
                F.sum("val").alias("s")).collect()}


def _view(spark, vp):
    return {(r["g"], r["p"]): (r["n"], r["nn"], r["s"]) for r in
            read_snapshot(spark, vp).collect()}


def _assert_match(got, want):
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in want:
        for a, b in zip(got[k], want[k]):
            assert (a is None) == (b is None), (k, got[k], want[k])
            if a is not None:
                assert math.isclose(a, b, rel_tol=1e-12), \
                    (k, got[k], want[k])


def test_additive_view_tracks_every_commit_kind(spark, tmp_path):
    """After each sync the view equals a from-scratch groupBy:
    through append, upsert, delete (groups vanishing when their last
    row goes), a sum reverting to NULL when its last non-null
    contributor is deleted, and a compact commit (skipped unread)."""
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    rows = [(i, f"g{i % 3}", f"p{i % 2}",
             float(i) if i % 5 else None) for i in range(40)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    out = aggregate_sync_snapshot(spark, tbl, vw,
                                  group_by=["g", "p"], measures=MEAS,
                                  view_partition_cols=["p"])
    assert out["steps"] == 1
    _assert_match(_view(spark, vw), _full(read_snapshot(spark, tbl)))

    # multi-commit catch-up in one call
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(100, "g0", "p0", 7.0), (101, "g9", "p1", None)],
        AGG_SCHEMA))
    snapshot_upsert(spark, tbl, spark.createDataFrame(
        [(0, "g0", "p0", 55.0)], AGG_SCHEMA), ["id"],
        partition_cols=["p"])
    # deleting ids 1..39 wipes most groups entirely and leaves g9/p1
    # with a single NULL contributor (its sum must read NULL)
    snapshot_delete(spark, tbl,
                    spark.createDataFrame([(i,) for i in range(1, 40)],
                                          "id long"),
                    ["id"], partition_cols=["p"])
    snapshot_compact(spark, tbl, target_file_bytes=1 << 30)
    out = aggregate_sync_snapshot(spark, tbl, vw,
                                  group_by=["g", "p"], measures=MEAS,
                                  view_partition_cols=["p"])
    assert out["steps"] == 3          # compact skipped, not a step
    want = _full(read_snapshot(spark, tbl))
    _assert_match(_view(spark, vw), want)
    assert want[("g9", "p1")] == (1, 0, None)   # NULL-sum group
    assert ("g1", "p0") not in want             # vanished group


def test_additive_sync_never_rereads_the_base_table(spark, tmp_path):
    """The 100 TB contract, proven destructively: after the initial
    load, the base table's OLD data files are physically deleted —
    and the sync still applies the next commit, because the additive
    path reads only the change feed (the commit's own files) and the
    view."""
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    rows = [(i, f"g{i % 3}", "p0", float(i)) for i in range(30)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=MEAS)
    want = _full(read_snapshot(spark, tbl)
                 .unionByName(spark.createDataFrame(
                     [(200, "g0", "p0", 9.0)], AGG_SCHEMA)))
    old_files = set(read_snapshot(spark, tbl).inputFiles())
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(200, "g0", "p0", 9.0)], AGG_SCHEMA))
    for f in old_files:
        os.remove(f.removeprefix("file:"))
    out = aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                                  measures=MEAS)
    assert out["steps"] == 1
    got = {r["g"]: (r["n"], r["nn"], r["s"]) for r in
           read_snapshot(spark, vw).collect()}
    assert got == {g: v for (g, _), v in want.items()}


def test_additive_crash_replay_is_version_preserving(spark, tmp_path):
    """Crash between the view commit and the sync marker: the re-run
    step no-ops on the replay marker — same view version, same
    values, no double-applied delta."""
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    rows = [(i, f"g{i % 3}", f"p{i % 2}", float(i)) for i in range(30)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g", "p"],
                            measures=MEAS, view_partition_cols=["p"])
    snapshot_delete(spark, tbl,
                    spark.createDataFrame([(i,) for i in range(5)],
                                          "id long"),
                    ["id"], partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g", "p"],
                            measures=MEAS, view_partition_cols=["p"])
    state, head = _view(spark, vw), latest_version(spark, vw)
    # simulate the crash: the delete step's marker never landed
    os.remove(sorted(glob.glob(f"{vw}/_snapshot_sync/*"))[-1])
    out = aggregate_sync_snapshot(spark, tbl, vw,
                                  group_by=["g", "p"], measures=MEAS,
                                  view_partition_cols=["p"])
    assert out["steps"] == 1          # the step re-ran...
    assert latest_version(spark, vw) == head    # ...as a no-op
    _assert_match(_view(spark, vw), state)


def test_recompute_path_handles_nonadditive_measures(spark, tmp_path):
    """min/max/avg/count_distinct can't unwind deletes — the sync
    re-aggregates only the touched groups and still matches a full
    recompute, including a group vanishing."""
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    meas = {"mn": ("min", "val"), "mx": ("max", "val"),
            "av": ("avg", "val"), "cd": ("count_distinct", "g")}
    rows = [(i, f"g{i % 4}", f"p{i % 2}", float(i % 7)) for i in
            range(40)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["p"],
                            measures=meas)

    def check():
        want = {r["p"]: (r["mn"], r["mx"], r["av"], r["cd"]) for r in
                read_snapshot(spark, tbl).groupBy("p").agg(
                    F.min("val").alias("mn"), F.max("val").alias("mx"),
                    F.avg("val").alias("av"),
                    F.count_distinct("g").alias("cd")).collect()}
        got = {r["p"]: (r["mn"], r["mx"], r["av"], r["cd"]) for r in
               read_snapshot(spark, vw).collect()}
        assert got == want, (got, want)
        return want

    check()
    # delete the current max contributors + every p1 row
    doomed = [(i,) for i in range(40) if i % 7 == 6 or i % 2 == 1]
    snapshot_delete(spark, tbl,
                    spark.createDataFrame(doomed, "id long"),
                    ["id"], partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["p"],
                            measures=meas)
    want = check()
    assert "p1" not in want           # group vanished from the view


def test_measure_spec_validation(spark, tmp_path):
    tbl = str(tmp_path / "t")
    snapshot_write(spark, tbl, spark.createDataFrame(
        [(1, "g", "p", 1.0)], AGG_SCHEMA), partition_cols=["p"])
    bad = [({"x": ("median", "val")}, "unknown op"),
           ({"x": ("sum", None)}, "needs a source column"),
           ({"g": ("count", None)}, "collide"),
           ({"__x": ("count", None)}, "collide"),
           ({}, "at least one")]
    for meas, msg in bad:
        with pytest.raises(ValueError, match=msg):
            aggregate_sync_snapshot(spark, tbl, str(tmp_path / "v"),
                                    group_by=["g"], measures=meas)
    with pytest.raises(ValueError, match="subset"):
        aggregate_sync_snapshot(spark, tbl, str(tmp_path / "v"),
                                group_by=["g"],
                                measures={"n": ("count", None)},
                                view_partition_cols=["p"])


# ---------------------------------------------------------------- #
# snapshot_replicate                                                #
# ---------------------------------------------------------------- #

def _content(spark, path, cols=("id", "day", "val")):
    return {tuple(r[c] for c in cols) for r in
            read_snapshot(spark, path).collect()}


def test_replicate_mirrors_every_commit_kind(spark, tmp_path):
    """The replica equals the source after each sync — through
    append, upsert, delete and a (skipped) compaction — while
    choosing its OWN partition layout, and each source commit lands
    as exactly one replica commit."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        snapshot_replicate,
    )
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    rows = [(i, f"d{i % 4}", f"v{i}") for i in range(40)]
    snapshot_write(spark, src, spark.createDataFrame(rows, SCHEMA),
                   partition_cols=["day"])
    out = snapshot_replicate(spark, src, dst, keys=["id"],
                             partition_cols=["val"])  # re-layout
    assert out["steps"] == 1
    assert _content(spark, dst) == _content(spark, src)
    assert "val=v0" in " ".join(read_snapshot(spark, dst).inputFiles())

    snapshot_append(spark, src, spark.createDataFrame(
        [(100, "d0", "new")], SCHEMA))
    snapshot_upsert(spark, src, spark.createDataFrame(
        [(1, "d1", "CHANGED")], SCHEMA), ["id"],
        partition_cols=["day"])
    snapshot_delete(spark, src,
                    spark.createDataFrame([(2,), (3,)], "id long"),
                    ["id"], partition_cols=["day"])
    snapshot_compact(spark, src, target_file_bytes=1 << 30)
    dst_head = latest_version(spark, dst)
    out = snapshot_replicate(spark, src, dst, keys=["id"],
                             partition_cols=["val"])
    assert out["steps"] == 3                    # compact skipped
    assert latest_version(spark, dst) == dst_head + 3
    assert _content(spark, dst) == _content(spark, src)

    # replay: marker makes re-running the last step a no-op
    os.remove(sorted(glob.glob(f"{dst}/_snapshot_sync/*"))[-1])
    head = latest_version(spark, dst)
    snapshot_replicate(spark, src, dst, keys=["id"],
                       partition_cols=["val"])
    assert latest_version(spark, dst) == head
    assert _content(spark, dst) == _content(spark, src)


def test_replicate_projected_columns(spark, tmp_path):
    """A projected replica mirrors only the requested columns, and
    commits that touch other columns net to empty feeds (no replica
    commit, no data read beyond the diffed files)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        snapshot_replicate,
    )
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    snapshot_write(spark, src, spark.createDataFrame(
        [(1, "d1", "a"), (2, "d2", "b")], SCHEMA),
        partition_cols=["day"])
    snapshot_replicate(spark, src, dst, keys=["id"],
                       columns=["id", "day"])
    assert _content(spark, dst, ("id", "day")) == {(1, "d1"),
                                                   (2, "d2")}
    # a val-only change: the projected feed is empty; the replica
    # step runs but applies an empty changeset (no new version)
    snapshot_upsert(spark, src, spark.createDataFrame(
        [(1, "d1", "CHANGED")], SCHEMA), ["id"],
        partition_cols=["day"])
    head = latest_version(spark, dst)
    out = snapshot_replicate(spark, src, dst, keys=["id"],
                             columns=["id", "day"])
    assert out["steps"] == 1
    assert latest_version(spark, dst) == head
    assert _content(spark, dst, ("id", "day")) == {(1, "d1"),
                                                   (2, "d2")}


# ---------------------------------------------------------------- #
# join_sync_snapshot                                                #
# ---------------------------------------------------------------- #

L_SCHEMA = "ck long, seg string, lp string"          # dim side
R_SCHEMA = "ok long, ck long, amt long, rp string"   # fact side


def _join_view(spark, vw):
    return {(r["ck"], r["ok"]): (r["seg"], r["amt"]) for r in
            read_snapshot(spark, vw).collect()}


def _join_full(spark, lt, rt):
    return {(r["ck"], r["ok"]): (r["seg"], r["amt"]) for r in
            read_snapshot(spark, lt)
            .join(read_snapshot(spark, rt), "ck").collect()}


def test_join_view_tracks_both_sides(spark, tmp_path):
    """The view equals a from-scratch inner join through commits on
    EITHER side: right appends (matched and dangling), a left
    attribute update fanning out to every pairing, a right row
    re-keyed to another left key, and a left delete erasing its
    pairings."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a"), (2, "base", "a"), (3, "gold", "b")],
        L_SCHEMA), partition_cols=["lp"])
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, 100, "x"), (11, 1, 110, "x"), (12, 2, 120, "y"),
         (13, 9, 999, "y")],                     # 13 dangles (ck=9)
        R_SCHEMA), partition_cols=["rp"])
    kw = dict(on=["ck"], left_keys=["ck"], right_keys=["ok"])
    out = join_sync_snapshot(spark, lt, rt, vw, **kw)
    assert out["left"]["steps"] == 1 and out["right"]["steps"] == 0
    assert _join_view(spark, vw) == _join_full(spark, lt, rt) == {
        (1, 10): ("gold", 100), (1, 11): ("gold", 110),
        (2, 12): ("base", 120)}

    # right append: one matching, one dangling
    snapshot_append(spark, rt, spark.createDataFrame(
        [(14, 3, 140, "x"), (15, 8, 150, "y")], R_SCHEMA))
    # left attribute update fans out to ck=1's two pairings
    snapshot_upsert(spark, lt, spark.createDataFrame(
        [(1, "plat", "a")], L_SCHEMA), ["ck"], partition_cols=["lp"])
    # right re-key: order 12 moves from ck=2 to ck=3
    snapshot_upsert(spark, rt, spark.createDataFrame(
        [(12, 3, 120, "y")], R_SCHEMA), ["ok"], partition_cols=["rp"])
    # left delete: ck=3 and both its pairings must go
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    assert _join_view(spark, vw) == _join_full(spark, lt, rt)
    snapshot_delete(spark, lt, spark.createDataFrame([(3,)],
                                                     "ck long"),
                    ["ck"], partition_cols=["lp"])
    out = join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = _join_view(spark, vw)
    assert got == _join_full(spark, lt, rt)
    assert (1, 10) in got and got[(1, 10)] == ("plat", 100)
    assert all(ck != 3 for ck, _ in got)


def test_join_view_zero_match_start_and_replay(spark, tmp_path):
    """A join that starts with zero matches still creates a readable
    (empty) view; matches appear when either side catches up; a
    crash-lost follower marker replays as a version-preserving
    no-op."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a")], L_SCHEMA), partition_cols=["lp"])
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 99, 100, "x")], R_SCHEMA), partition_cols=["rp"])
    kw = dict(on=["ck"], left_keys=["ck"], right_keys=["ok"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    assert read_snapshot(spark, vw).count() == 0

    snapshot_append(spark, rt, spark.createDataFrame(
        [(11, 1, 111, "x")], R_SCHEMA))
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    assert _join_view(spark, vw) == {(1, 11): ("gold", 111)}

    head = latest_version(spark, vw)
    os.remove(sorted(glob.glob(f"{vw}/_sync_right/_snapshot_sync/*"))
              [-1])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    assert latest_version(spark, vw) == head
    assert _join_view(spark, vw) == {(1, 11): ("gold", 111)}


def test_join_view_contracts(spark, tmp_path):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt = str(tmp_path / "l"), str(tmp_path / "r")
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a")], L_SCHEMA), partition_cols=["lp"])
    # colliding non-join column name on both sides
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, "gold")], "ok long, ck long, seg string"),
        partition_cols=[])
    with pytest.raises(ValueError, match="both sides"):
        join_sync_snapshot(spark, lt, rt, str(tmp_path / "v"),
                           on=["ck"], left_keys=["ck"],
                           right_keys=["ok"])
    with pytest.raises(ValueError, match="not present"):
        join_sync_snapshot(spark, lt, rt, str(tmp_path / "v"),
                           on=["nope"], left_keys=["ck"],
                           right_keys=["ok"])


def test_ivm_dataflow_composes_join_then_aggregate(spark, tmp_path):
    """The IVM stages CHAIN: a join view is itself a snapshot table,
    so its own change feed drives an aggregate view — base commits
    ripple through two incremental stages (never a recompute of
    either view) and the final rollup equals the from-scratch
    join+groupBy."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot, join_sync_snapshot,
    )
    lt, rt, jv, av = (str(tmp_path / n) for n in ("l", "r", "jv",
                                                  "av"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a"), (2, "base", "a")], L_SCHEMA),
        partition_cols=["lp"])
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, 100, "x"), (11, 1, 110, "x"), (12, 2, 120, "y")],
        R_SCHEMA), partition_cols=["rp"])
    jkw = dict(on=["ck"], left_keys=["ck"], right_keys=["ok"])
    meas = {"n_orders": ("count", None), "rev": ("sum", "amt")}

    def pump():
        join_sync_snapshot(spark, lt, rt, jv, **jkw)
        aggregate_sync_snapshot(spark, jv, av, group_by=["seg"],
                                measures=meas)

    def check():
        want = {r["seg"]: (r["n_orders"], r["rev"]) for r in
                read_snapshot(spark, lt)
                .join(read_snapshot(spark, rt), "ck")
                .groupBy("seg")
                .agg(F.count("*").alias("n_orders"),
                     F.sum("amt").alias("rev")).collect()}
        got = {r["seg"]: (r["n_orders"], r["rev"]) for r in
               read_snapshot(spark, av).collect()}
        assert got == want, (got, want)
        return got

    pump()
    assert check() == {"gold": (2, 210), "base": (1, 120)}
    # fact append + dim segment move + fact delete, one pump each
    snapshot_append(spark, rt, spark.createDataFrame(
        [(13, 2, 130, "x")], R_SCHEMA))
    pump()
    check()
    snapshot_upsert(spark, lt, spark.createDataFrame(
        [(1, "base", "a")], L_SCHEMA), ["ck"], partition_cols=["lp"])
    pump()
    assert check() == {"base": (4, 460)}     # gold group vanished
    snapshot_delete(spark, rt, spark.createDataFrame(
        [(10,), (11,)], "ok long"), ["ok"], partition_cols=["rp"])
    pump()
    assert check() == {"base": (2, 250)}


def test_avg_is_additive_and_minmax_merges_on_append_steps(
        spark, tmp_path):
    """avg is maintained as internal sum+count (fully additive) and
    min/max merge via least/greatest on delete-free steps — proven
    destructively: after the initial load the base table's old data
    files are DELETED, and an append commit still syncs all three
    measure kinds without touching the base."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot,
    )
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    meas = {"av": ("avg", "val"), "mx": ("max", "val"),
            "s": ("sum", "val")}
    rows = [(i, f"g{i % 2}", "p0", float(i)) for i in range(20)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    old_files = set(read_snapshot(spark, tbl).inputFiles())
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(100, "g0", "p0", 99.0), (101, "g1", "p0", None)],
        AGG_SCHEMA))
    for f in old_files:
        os.remove(f.removeprefix("file:"))
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    got = {r["g"]: (r["av"], r["mx"], r["s"]) for r in
           read_snapshot(spark, vw).collect()}
    g0 = [float(i) for i in range(20) if i % 2 == 0] + [99.0]
    g1 = [float(i) for i in range(20) if i % 2 == 1]  # None skipped
    assert got["g0"][1] == 99.0 and got["g1"][1] == 19.0
    assert math.isclose(got["g0"][0], sum(g0) / len(g0))
    assert math.isclose(got["g1"][0], sum(g1) / len(g1))
    assert math.isclose(got["g0"][2], sum(g0))


def test_minmax_delete_step_recomputes_then_merges_again(
        spark, tmp_path):
    """Semi-additive alternation: append steps merge, a delete of
    the current max recomputes only the touched groups, and the
    NEXT append merges again on the recomputed state — the stored
    schema is identical under both disciplines."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot,
    )
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    meas = {"mx": ("max", "val"), "s": ("sum", "val"),
            "av": ("avg", "val")}

    def check():
        want = {r["g"]: (r["mx"], r["s"], r["av"]) for r in
                read_snapshot(spark, tbl).groupBy("g").agg(
                    F.max("val").alias("mx"), F.sum("val").alias("s"),
                    F.avg("val").alias("av")).collect()}
        got = {r["g"]: (r["mx"], r["s"], r["av"]) for r in
               read_snapshot(spark, vw).collect()}
        assert set(got) == set(want)
        for k in want:
            for a, b in zip(got[k], want[k]):
                assert (a is None) == (b is None)
                assert a is None or math.isclose(a, b, rel_tol=1e-12)

    rows = [(i, f"g{i % 2}", "p0", float(i % 11)) for i in range(30)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    check()
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(100, "g0", "p0", 50.0)], AGG_SCHEMA))
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    check()
    # delete the max contributor -> recompute step must LOWER mx
    snapshot_delete(spark, tbl,
                    spark.createDataFrame([(100,)], "id long"),
                    ["id"], partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    check()
    assert {r["g"]: r["mx"] for r in
            read_snapshot(spark, vw).collect()}["g0"] == 10.0
    # and a further append merges on the recomputed state
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(101, "g1", "p0", 77.0)], AGG_SCHEMA))
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    check()


def test_apply_changes_schema_evolution(spark, tmp_path):
    """With schema_evolution=True an evolved changeset upgrades the
    manifest schema (carried partitions read the new column as
    NULL); without it, drift raises — the upsert contract."""
    path = str(tmp_path / "tbl")
    rows = [(i, f"d{i % 3}", f"v{i}") for i in range(9)]
    snapshot_write(spark, path, spark.createDataFrame(rows, SCHEMA),
                   partition_cols=["day"])
    ch = spark.createDataFrame(
        [(0, "d0", "NEW", 7, "upsert"), (3, "d0", None, None,
                                         "delete")],
        SCHEMA + ", extra int, _op string")
    with pytest.raises(ValueError):
        snapshot_apply_changes(spark, path, ch, ["id"],
                               partition_cols=["day"])
    snapshot_apply_changes(spark, path, ch, ["id"],
                           partition_cols=["day"],
                           schema_evolution=True)
    got = {r["id"]: r["extra"] for r in
           read_snapshot(spark, path).collect()}
    assert got[0] == 7 and 3 not in got
    # carried partitions (d1/d2) read NULL for the evolved column
    assert all(got[i] is None for i in got if i != 0)


def test_replicate_follows_source_schema_evolution(spark, tmp_path):
    """A source schema evolution flows through replication instead
    of stalling it: the replica evolves on the step that carries the
    new column, and untouched replica rows read NULL for it."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        snapshot_replicate,
    )
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    snapshot_write(spark, src, spark.createDataFrame(
        [(1, "d1", "a"), (2, "d2", "b")], SCHEMA),
        partition_cols=["day"])
    snapshot_replicate(spark, src, dst, keys=["id"])
    snapshot_upsert(spark, src, spark.createDataFrame(
        [(1, "d1", "a2", 42)], SCHEMA + ", extra int"), ["id"],
        partition_cols=["day"], schema_evolution=True)
    snapshot_replicate(spark, src, dst, keys=["id"])
    got = {r["id"]: (r["val"], r["extra"]) for r in
           read_snapshot(spark, dst).collect()}
    assert got == {1: ("a2", 42), 2: ("b", None)}


def test_snapshot_maintain_policy(spark, tmp_path):
    """Manifest-only policy maintenance: fragmented partitions are
    compacted (only those), a within-policy table publishes nothing,
    and retention applies when asked."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_maintain,
    )
    path = str(tmp_path / "tbl")
    snapshot_write(spark, path, spark.createDataFrame(
        [(0, "d0", "v0"), (1, "d1", "v1")], SCHEMA),
        partition_cols=["day"])
    # fragment d0 with several single-row appends
    for i in range(2, 7):
        snapshot_append(spark, path, spark.createDataFrame(
            [(i, "d0", f"v{i}")], SCHEMA))
    before = _rows(spark, path)
    out = snapshot_maintain(spark, path, max_files_per_partition=3,
                            keep_latest=2,
                            orphan_grace_seconds=0.0)
    assert out["compacted_partitions"] == ["day=d0"]
    assert out["files_after"] < out["files_before"]
    assert out["pruned"]["manifests_dropped"] > 0
    assert _rows(spark, path) == before
    head = latest_version(spark, path)
    # within policy now: nothing published
    out = snapshot_maintain(spark, path, max_files_per_partition=3)
    assert out["compacted_partitions"] == [] \
        and out["compact_version"] is None
    assert latest_version(spark, path) == head


def test_join_view_prunes_other_side_to_touched_join_values(
        spark, tmp_path):
    """When the other table is partitioned on the join column, a
    step's pinned read prunes to the join values the delta touches —
    proven destructively: every OTHER partition's data files are
    deleted and the step still lands."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(k, f"s{k}", "a") for k in range(6)], L_SCHEMA),
        partition_cols=["lp"])
    # right table partitioned ON the join column ck
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10 * k + j, k, 100 + k, "x") for k in range(6)
         for j in range(2)],
        "ok long, ck long, amt long, rp string").drop("rp"),
        partition_cols=["ck"])
    kw = dict(on=["ck"], left_keys=["ck"], right_keys=["ok"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)

    # a left step touching ONLY ck=2: destroy every other ck's files
    doomed = [f for f in read_snapshot(spark, rt).inputFiles()
              if "ck=2" not in f]
    for f in doomed:
        os.remove(f.removeprefix("file:"))
    snapshot_upsert(spark, lt, spark.createDataFrame(
        [(2, "SEG", "a")], L_SCHEMA), ["ck"], partition_cols=["lp"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = {(r["ck"], r["ok"]): r["seg"] for r in
           read_snapshot(spark, vw).collect()}
    assert got[(2, 20)] == "SEG" and got[(2, 21)] == "SEG"
    assert got[(3, 30)] == "s3"          # untouched pairing intact


def test_version_for_source_pins_consistent_view_reads(spark,
                                                       tmp_path):
    """Map a base-table commit to the view version that incorporates
    it — pinned reads reproduce the view exactly as of that base
    version, across several base commits; uncovered batches raise."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_version_for_source,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot,
    )
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    meas = {"n": ("count", None)}
    snapshot_write(spark, tbl, spark.createDataFrame(
        [(i, f"g{i % 2}", "p0", 1.0) for i in range(10)], AGG_SCHEMA),
        partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(10, "g0", "p0", 1.0)], AGG_SCHEMA))
    snapshot_delete(spark, tbl,
                    spark.createDataFrame([(i,) for i in range(5)],
                                          "id long"),
                    ["id"], partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    src = f"aggregate_sync:{tbl}"
    expect = {0: {"g0": 5, "g1": 5}, 1: {"g0": 6, "g1": 5},
              2: {"g0": 3, "g1": 3}}
    for base_v, want in expect.items():
        vv = snapshot_version_for_source(spark, vw, src, base_v)
        got = {r["g"]: r["n"] for r in
               read_snapshot(spark, vw, vv).collect()}
        assert got == want, (base_v, vv, got)
    with pytest.raises(LookupError, match="hasn't applied"):
        snapshot_version_for_source(spark, vw, src, 99)


def test_derived_group_columns_time_bucket_rollup(spark, tmp_path):
    """Continuous time-bucketed rollups on the IVM engine: a derived
    day bucket groups the view, stays correct through appends and
    deletes, and an explicit feed projection keeps the column
    pruning."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot,
    )
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    rows = [(i, "p0", 1000.0 * i) for i in range(200)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows,
                                         "id long, p string, t double"),
                   partition_cols=["p"])
    kw = dict(group_by=["day"],
              measures={"n": ("count", None), "last_t": ("max", "t")},
              derive={"day": "floor(t / 86400)"},
              columns=["id", "t"])

    def check():
        want = {r["day"]: (r["n"], r["last_t"]) for r in
                read_snapshot(spark, tbl)
                .selectExpr("floor(t / 86400) as day", "t")
                .groupBy("day")
                .agg(F.count("*").alias("n"),
                     F.max("t").alias("last_t")).collect()}
        got = {r["day"]: (r["n"], r["last_t"]) for r in
               read_snapshot(spark, vw).collect()}
        assert got == want, (got, want)

    aggregate_sync_snapshot(spark, tbl, vw, **kw)
    check()
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(500, "p0", 999999.0)], "id long, p string, t double"))
    aggregate_sync_snapshot(spark, tbl, vw, **kw)
    check()
    snapshot_delete(spark, tbl,
                    spark.createDataFrame([(i,) for i in range(100)],
                                          "id long"),
                    ["id"], partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, **kw)
    check()


def _left_join_state(spark, vw):
    return {(r["ck"], r["ok"]): (r["seg"], r["amt"]) for r in
            read_snapshot(spark, vw).collect()}


def _left_join_want(spark, lt, rt):
    return {(r["ck"], r["ok"]): (r["seg"], r["amt"]) for r in
            read_snapshot(spark, lt)
            .join(read_snapshot(spark, rt), "ck", "left").collect()}


def test_left_outer_join_view_flips_null_extension(spark, tmp_path):
    """how='left': unmatched left rows live null-extended; a right
    insert granting a FIRST match sheds the null-extended form, a
    right delete removing the LAST match restores it, a right
    re-key flips both sides at once, and left deletes sweep matched
    and unmatched forms — each state equal to a from-scratch left
    join."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a"), (2, "base", "a"), (3, "gold", "b")],
        L_SCHEMA), partition_cols=["lp"])
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, 100, "x")], R_SCHEMA), partition_cols=["rp"])
    kw = dict(on=["ck"], left_keys=["ck"], right_keys=["ok"],
              how="left")

    def check():
        got, want = _left_join_state(spark, vw), \
            _left_join_want(spark, lt, rt)
        assert got == want, (got, want)
        return got

    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(2, None)] == ("base", None)       # null-extended
    assert got[(1, 10)] == ("gold", 100)

    # first match for ck=2 -> null-extension shed
    snapshot_append(spark, rt, spark.createDataFrame(
        [(11, 2, 110, "x"), (12, 1, 120, "y")], R_SCHEMA))
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert (2, None) not in got and got[(2, 11)] == ("base", 110)

    # delete ck=1's matches one at a time: last removal restores
    # the null-extended row
    snapshot_delete(spark, rt, spark.createDataFrame([(10,)],
                                                     "ok long"),
                    ["ok"], partition_cols=["rp"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert (1, None) not in got and (1, 12) in got
    snapshot_delete(spark, rt, spark.createDataFrame([(12,)],
                                                     "ok long"),
                    ["ok"], partition_cols=["rp"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(1, None)] == ("gold", None)

    # right re-key: order 11 moves ck2 -> ck3 in ONE commit; ck=2
    # reverts to null-extended, ck=3 sheds it
    snapshot_upsert(spark, rt, spark.createDataFrame(
        [(11, 3, 110, "x")], R_SCHEMA), ["ok"], partition_cols=["rp"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(2, None)] == ("base", None)
    assert got[(3, 11)] == ("gold", 110) and (3, None) not in got

    # left delete sweeps both forms; left attr update fans out
    snapshot_delete(spark, lt, spark.createDataFrame([(2,)],
                                                     "ck long"),
                    ["ck"], partition_cols=["lp"])
    snapshot_upsert(spark, lt, spark.createDataFrame(
        [(1, "plat", "a")], L_SCHEMA), ["ck"], partition_cols=["lp"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(1, None)] == ("plat", None)
    assert all(ck != 2 for ck, _ in got)


def test_right_join_view_is_the_mirrored_left(spark, tmp_path):
    """how='right' runs as the mirrored left join: dangling right
    rows live null-extended and flip when the dim side catches up."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a")], L_SCHEMA), partition_cols=["lp"])
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, 100, "x"), (11, 9, 110, "x")], R_SCHEMA),
        partition_cols=["rp"])
    kw = dict(on=["ck"], left_keys=["ck"], right_keys=["ok"],
              how="right")

    def check():
        want = {(r["ok"], r["ck"]): (r["seg"], r["amt"]) for r in
                read_snapshot(spark, lt)
                .join(read_snapshot(spark, rt), "ck", "right")
                .collect()}
        got = {(r["ok"], r["ck"]): (r["seg"], r["amt"]) for r in
               read_snapshot(spark, vw)
               .select("ok", "ck", "seg", "amt").collect()}
        assert got == want, (got, want)
        return got

    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(11, 9)] == (None, 110)        # dangling fact kept
    # the missing dim arrives: the null-extended row flips
    snapshot_append(spark, lt, spark.createDataFrame(
        [(9, "late", "b")], L_SCHEMA))
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(11, 9)] == ("late", 110)


def test_null_group_keys_are_real_groups(spark, tmp_path):
    """A NULL group-by value is a legitimate group: it merges on the
    additive path, recomputes on the semi-additive path, and never
    duplicates or lingers — the null-safe key plumbing down through
    snapshot_apply_changes."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot,
    )
    for suffix, meas in (("add", {"n": ("count", None),
                                  "s": ("sum", "val")}),
                         ("mm", {"n": ("count", None),
                                 "mx": ("max", "val")})):
        tbl = str(tmp_path / f"t_{suffix}")
        vw = str(tmp_path / f"v_{suffix}")
        rows = [(i, None if i % 3 == 0 else f"g{i % 2}", "p0",
                 float(i)) for i in range(20)]
        snapshot_write(spark, tbl,
                       spark.createDataFrame(rows, AGG_SCHEMA),
                       partition_cols=["p"])
        aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                                measures=meas)

        def check():
            want = {r["g"]: r["n"] for r in
                    read_snapshot(spark, tbl).groupBy("g")
                    .agg(F.count("*").alias("n")).collect()}
            got_rows = read_snapshot(spark, vw).collect()
            got = {r["g"]: r["n"] for r in got_rows}
            assert len(got_rows) == len(got), \
                "duplicate group rows in the view"
            assert got == want, (got, want)

        check()
        # touch the null group from both directions
        snapshot_append(spark, tbl, spark.createDataFrame(
            [(100, None, "p0", 50.0)], AGG_SCHEMA))
        aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                                measures=meas)
        check()
        doomed = [(i,) for i in range(20) if i % 3 == 0]
        snapshot_delete(spark, tbl,
                        spark.createDataFrame(doomed, "id long"),
                        ["id"], partition_cols=["p"])
        aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                                measures=meas)
        check()
        # drain the null group entirely: its row must vanish
        snapshot_delete(spark, tbl,
                        spark.createDataFrame([(100,)], "id long"),
                        ["id"], partition_cols=["p"])
        aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                                measures=meas)
        check()
        assert None not in {r["g"] for r in
                            read_snapshot(spark, vw).collect()}


def test_empty_source_initial_sync_creates_empty_consumers(
        spark, tmp_path):
    """Replication and aggregate views of an EMPTY source table come
    up as empty, readable consumers — and fill in on later syncs."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot, snapshot_replicate,
    )
    tbl = str(tmp_path / "t")
    snapshot_write(spark, tbl,
                   spark.createDataFrame([], AGG_SCHEMA),
                   partition_cols=["p"])
    dst, vw = str(tmp_path / "d"), str(tmp_path / "v")
    snapshot_replicate(spark, tbl, dst, keys=["id"])
    assert read_snapshot(spark, dst).count() == 0
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures={"n": ("count", None)})
    assert read_snapshot(spark, vw).count() == 0
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(1, "g0", "p0", 1.0)], AGG_SCHEMA))
    snapshot_replicate(spark, tbl, dst, keys=["id"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures={"n": ("count", None)})
    assert read_snapshot(spark, dst).count() == 1
    assert {r["g"]: r["n"] for r in
            read_snapshot(spark, vw).collect()} == {"g0": 1}


def test_derive_collision_with_table_column_raises(spark, tmp_path):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot,
    )
    tbl = str(tmp_path / "t")
    snapshot_write(spark, tbl, spark.createDataFrame(
        [(1, "g", "p", 1.0)], AGG_SCHEMA), partition_cols=["p"])
    with pytest.raises(ValueError, match="collides with a table"):
        aggregate_sync_snapshot(
            spark, tbl, str(tmp_path / "v"), group_by=["g"],
            measures={"n": ("count", None)},
            derive={"val": "val * 2"})


def test_join_view_prunes_unpartitioned_zone_mapped_other_side(
        spark, tmp_path):
    """r9 (VERDICT item 4): the other-side pruning also routes through
    the zone-map predicate language, so a stats-sorted but
    UNPARTITIONED other table prunes too — proven destructively
    (every file whose ck range excludes the touched value is deleted,
    the step still lands) and observably (the returned ``pruning``
    stats report the skipped files; no silent caps)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(k, f"s{k}", "a") for k in range(6)], L_SCHEMA),
        partition_cols=["lp"])
    # right table UNPARTITIONED, range-sorted on the join column ck
    # with per-file min/max zone maps — one file per ck value
    rdf = (spark.createDataFrame(
        [(10 * k + j, k, 100 + k) for k in range(6) for j in range(2)],
        "ok long, ck long, amt long")
        .repartitionByRange(6, "ck").sortWithinPartitions("ck"))
    snapshot_write(spark, rt, rdf, partition_cols=[],
                   stats_cols=["ck"])
    assert len(read_snapshot(spark, rt).inputFiles()) == 6
    kw = dict(on=["ck"], left_keys=["ck"], right_keys=["ok"])
    out0 = join_sync_snapshot(spark, lt, rt, vw, **kw)

    # a left step touching ONLY ck=2: destroy every file whose range
    # can't contain it
    import duckdb as _d
    keep = set()
    for f in read_snapshot(spark, rt).inputFiles():
        p = f.removeprefix("file:")
        lo, hi = _d.sql(
            f"select min(ck), max(ck) from '{p}'").fetchone()
        if lo <= 2 <= hi:
            keep.add(f)
    doomed = [f for f in read_snapshot(spark, rt).inputFiles()
              if f not in keep]
    assert doomed, "need >0 prunable files for a destructive proof"
    for f in doomed:
        os.remove(f.removeprefix("file:"))
    snapshot_upsert(spark, lt, spark.createDataFrame(
        [(2, "SEG", "a")], L_SCHEMA), ["ck"], partition_cols=["lp"])
    out = join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = {(r["ck"], r["ok"]): r["seg"] for r in
           read_snapshot(spark, vw).collect()}
    assert got[(2, 20)] == "SEG" and got[(2, 21)] == "SEG"
    assert got[(3, 30)] == "s3"          # untouched pairing intact
    # stats report: the left step pruned the other side's files
    steps = [p for p in out["pruning"] if p["side"] == "left"]
    assert steps and steps[-1]["mode"] == "pruned"
    assert steps[-1]["files_pruned"] == len(doomed)
    assert steps[-1]["files_read"] == 6 - len(doomed)


def _full_join_want(spark, lt, rt):
    return {(r["ck"], r["ok"]): (r["seg"], r["amt"]) for r in
            read_snapshot(spark, lt)
            .join(read_snapshot(spark, rt), "ck", "full").collect()}


def _full_join_state(spark, vw):
    return {(r["ck"], r["ok"]): (r["seg"], r["amt"]) for r in
            read_snapshot(spark, vw)
            .select("ck", "ok", "seg", "amt").collect()}


def test_full_outer_join_view_flips_both_directions(spark, tmp_path):
    """how='full' (r9): BOTH sides live null-extended when unmatched.
    The flip matrix in both directions — first match sheds either
    side's null-extended form, last-match removal restores it, a
    re-key flips two rows at once, and a side's delete sweeps its
    matched and null-extended forms — each state equal to a
    from-scratch full join."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a"), (2, "base", "a")], L_SCHEMA),
        partition_cols=["lp"])
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, 100, "x"), (11, 9, 110, "x")], R_SCHEMA),
        partition_cols=["rp"])
    kw = dict(on=["ck"], left_keys=["ck"], right_keys=["ok"],
              how="full")

    def check():
        got, want = _full_join_state(spark, vw), \
            _full_join_want(spark, lt, rt)
        assert got == want, (got, want)
        return got

    # initial: matched (1,10), left-only (2,None), right-only (9,11)
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(1, 10)] == ("gold", 100)
    assert got[(2, None)] == ("base", None)
    assert got[(9, 11)] == (None, 110)

    # right-only row gains its dim: left append flips (9,11)
    snapshot_append(spark, lt, spark.createDataFrame(
        [(9, "late", "b")], L_SCHEMA))
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(9, 11)] == ("late", 110) and (9, None) not in got

    # left-only row gains a fact: right append flips (2,None)
    snapshot_append(spark, rt, spark.createDataFrame(
        [(12, 2, 120, "y")], R_SCHEMA))
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(2, 12)] == ("base", 120) and (2, None) not in got

    # right delete removes ck=2's last match: left row reverts;
    # a NEW dangling right row lands null-extended in the same round
    snapshot_delete(spark, rt, spark.createDataFrame([(12,)],
                                                     "ok long"),
                    ["ok"], partition_cols=["rp"])
    snapshot_append(spark, rt, spark.createDataFrame(
        [(13, 77, 130, "y")], R_SCHEMA))
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(2, None)] == ("base", None)
    assert got[(77, 13)] == (None, 130)

    # left delete removes ok=10's dim: right row reverts to dangling
    snapshot_delete(spark, lt, spark.createDataFrame([(1,)],
                                                     "ck long"),
                    ["ck"], partition_cols=["lp"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(1, 10)] == (None, 100) and all(
        seg is None for (ck, ok), (seg, _) in got.items() if ck == 1)

    # right re-key: order 13 moves ck77 -> ck2 in one commit; ck=2's
    # left row sheds null-extension, ck=77 vanishes entirely (it was
    # only ever a borrowed join value)
    snapshot_upsert(spark, rt, spark.createDataFrame(
        [(13, 2, 130, "y")], R_SCHEMA), ["ok"], partition_cols=["rp"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(2, 13)] == ("base", 130)
    assert all(ck != 77 for ck, _ in got)

    # left attr update fans out to matched rows only
    snapshot_upsert(spark, lt, spark.createDataFrame(
        [(2, "plat", "a")], L_SCHEMA), ["ck"], partition_cols=["lp"])
    join_sync_snapshot(spark, lt, rt, vw, **kw)
    got = check()
    assert got[(2, 13)] == ("plat", 130)


def test_read_session_pins_mutually_consistent_state(spark,
                                                     tmp_path):
    """r9 (VERDICT item 8): snapshot_read_session pins a base table
    and N derived consumers to the max common synced base. A lagging
    consumer drags the session back to the version it has applied;
    commits landing and syncs running DURING the session never
    change what the session reads; and the session's frames are
    mutually consistent (the view equals a from-scratch aggregate of
    the session's own base frame)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_read_session,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot, snapshot_replicate,
    )
    tbl, vw, rep = (str(tmp_path / n) for n in ("t", "v", "r"))
    meas = {"n": ("count", None)}
    snapshot_write(spark, tbl, spark.createDataFrame(
        [(i, f"g{i % 2}", "p0", 1.0) for i in range(10)], AGG_SCHEMA),
        partition_cols=["p"])                                   # v0
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    snapshot_replicate(spark, tbl, rep, keys=["id"])
    # base advances; ONLY the replica catches up — the view lags at 0
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(10, "g0", "p0", 1.0)], AGG_SCHEMA))                   # v1
    snapshot_replicate(spark, tbl, rep, keys=["id"])

    sess = snapshot_read_session(spark, tbl, {
        "view": (vw, f"aggregate_sync:{tbl}"),
        "replica": (rep, f"replicate:{tbl}"),
    })
    assert sess["base_version"] == 0      # view is the laggard
    base_rows = sess["base"].count()
    view_got = {r["g"]: r["n"] for r in
                sess["frames"]["view"].select("g", "n").collect()}
    rep_rows = sess["frames"]["replica"].count()

    # concurrent activity DURING the session: base commits land,
    # both consumers sync past the pinned state
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(11, "g1", "p0", 1.0), (12, "g1", "p0", 1.0)], AGG_SCHEMA))
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    snapshot_replicate(spark, tbl, rep, keys=["id"])

    # the session still reads exactly the pinned state
    assert sess["base"].count() == base_rows == 10
    assert {r["g"]: r["n"] for r in
            sess["frames"]["view"].select("g", "n").collect()} \
        == view_got
    assert sess["frames"]["replica"].count() == rep_rows == 10

    # mutual consistency: the pinned view == from-scratch aggregate
    # of the pinned base; the pinned replica == the pinned base
    want = {r["g"]: r["cnt"] for r in
            sess["base"].groupBy("g").agg(
                F.count(F.lit(1)).alias("cnt")).collect()}
    assert view_got == want
    assert {r["id"] for r in sess["frames"]["replica"]
            .select("id").collect()} \
        == {r["id"] for r in sess["base"].select("id").collect()}

    # a fresh session after the syncs sees the new common base (2)
    sess2 = snapshot_read_session(spark, tbl, {
        "view": (vw, f"aggregate_sync:{tbl}"),
        "replica": (rep, f"replicate:{tbl}"),
    })
    assert sess2["base_version"] == 2
    assert sess2["frames"]["replica"].count() == 13


def test_read_session_skips_compact_only_gap(spark, tmp_path):
    """A consumer whose marker sits below B only because it skipped a
    row-neutral compact commit is still consistent — the session
    accepts its newest marker-<=B version."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_read_session,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot, snapshot_replicate,
    )
    tbl, vw, rep = (str(tmp_path / n) for n in ("t", "v", "r"))
    meas = {"n": ("count", None)}
    snapshot_write(spark, tbl, spark.createDataFrame(
        [(i, f"g{i % 2}", "p0", 1.0) for i in range(6)], AGG_SCHEMA),
        partition_cols=["p"])                                   # v0
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)          # view marker: 0
    snapshot_compact(spark, tbl, target_file_bytes=1 << 30)     # v1
    snapshot_replicate(spark, tbl, rep, keys=["id"])
    # the replica's FIRST version carries marker 1 — past the view's
    # 0, but the (0, 1] gap is one compaction: content-consistent
    sess = snapshot_read_session(spark, tbl, {
        "view": (vw, f"aggregate_sync:{tbl}"),
        "replica": (rep, f"replicate:{tbl}"),
    })
    assert sess["base_version"] == 0
    want = {r["g"]: r["cnt"] for r in
            sess["base"].groupBy("g").agg(
                F.count(F.lit(1)).alias("cnt")).collect()}
    got = {r["g"]: r["n"] for r in
           sess["frames"]["view"].select("g", "n").collect()}
    assert got == want
    assert sess["frames"]["replica"].count() == 6

    # a NON-neutral gap refuses: fresh replica first-syncs only
    # after a real append beyond the view's marker
    rep2 = str(tmp_path / "r2")
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(6, "g0", "p0", 1.0)], AGG_SCHEMA))                    # v2
    snapshot_replicate(spark, tbl, rep2, keys=["id"])  # marker 2
    with pytest.raises(LookupError, match="not compaction-only"):
        snapshot_read_session(spark, tbl, {
            "view": (vw, f"aggregate_sync:{tbl}"),
            "replica": (rep2, f"replicate:{tbl}"),
        })


def test_read_session_general_branch_checks_marker_gap(spark,
                                                      tmp_path):
    """r9 advisor finding: in the GENERAL branch (not just the
    first-marker bootstrap case), when the selected consumer version's
    marker sits below B, the base commits in (marker, B] must be
    compaction-only — a consumer that jumped markers 0 -> 2 over a
    real append has NO retained state consistent with base@1."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_read_session,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot, snapshot_replicate,
    )
    meas = {"n": ("count", None)}

    # NON-neutral gap: per-commit syncs give the view a version at
    # EVERY marker, so the gap only opens when snapshot_prune drops
    # the intermediate consumer version — tag v0 so retention keeps
    # {v0 (marker 0), v2 (marker 2)} and drops the marker-1 state,
    # then B=1 has no consistent retained view state
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_prune, snapshot_tag,
    )
    tbl, vw, rep = (str(tmp_path / n) for n in ("t", "v", "r"))
    snapshot_write(spark, tbl, spark.createDataFrame(
        [(i, f"g{i % 2}", "p0", 1.0) for i in range(4)], AGG_SCHEMA),
        partition_cols=["p"])                                   # v0
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)          # view marker 0
    snapshot_tag(spark, vw, "keep0")
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(4, "g0", "p0", 1.0)], AGG_SCHEMA))                    # v1
    snapshot_replicate(spark, tbl, rep, keys=["id"])  # rep marker 1
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(5, "g1", "p0", 1.0)], AGG_SCHEMA))                    # v2
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)          # view marker 2
    snapshot_prune(spark, vw, keep_latest=1,
                   orphan_grace_seconds=0)  # drops the marker-1 state
    with pytest.raises(LookupError, match="compaction-only"):
        snapshot_read_session(spark, tbl, {
            "view": (vw, f"aggregate_sync:{tbl}"),
            "replica": (rep, f"replicate:{tbl}"),
        })

    # row-neutral gap: identical shape but base commit 1 is a
    # compaction -> view@marker-0 IS consistent with base@1
    tbl2, vw2, rep2 = (str(tmp_path / n) for n in ("t2", "v2", "r2"))
    snapshot_write(spark, tbl2, spark.createDataFrame(
        [(i, f"g{i % 2}", "p0", 1.0) for i in range(4)], AGG_SCHEMA),
        partition_cols=["p"])                                   # v0
    aggregate_sync_snapshot(spark, tbl2, vw2, group_by=["g"],
                            measures=meas)          # view marker 0
    snapshot_compact(spark, tbl2, target_file_bytes=1 << 30)    # v1
    snapshot_replicate(spark, tbl2, rep2, keys=["id"])  # marker 1
    snapshot_append(spark, tbl2, spark.createDataFrame(
        [(5, "g1", "p0", 1.0)], AGG_SCHEMA))                    # v2
    aggregate_sync_snapshot(spark, tbl2, vw2, group_by=["g"],
                            measures=meas)          # view marker 2
    sess = snapshot_read_session(spark, tbl2, {
        "view": (vw2, f"aggregate_sync:{tbl2}"),
        "replica": (rep2, f"replicate:{tbl2}"),
    })
    assert sess["base_version"] == 1
    want = {r["g"]: r["cnt"] for r in
            sess["base"].groupBy("g").agg(
                F.count(F.lit(1)).alias("cnt")).collect()}
    got = {r["g"]: r["n"] for r in
           sess["frames"]["view"].select("g", "n").collect()}
    assert got == want


def test_read_session_contracts(spark, tmp_path):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_read_session,
    )
    tbl = str(tmp_path / "t")
    snapshot_write(spark, tbl, spark.createDataFrame(
        [(1, "g0", "p0", 1.0)], AGG_SCHEMA), partition_cols=["p"])
    with pytest.raises(ValueError, match="at least one"):
        snapshot_read_session(spark, tbl, {})
    with pytest.raises(LookupError, match="no marker"):
        snapshot_read_session(
            spark, tbl, {"self": (tbl, "aggregate_sync:nope")})


def test_full_outer_initial_sync_with_prunable_other_side(
        spark, tmp_path):
    """Regression (r9): the initial full-outer step's other-anti rows
    must come from the FULL pinned read — the pruned read keeps only
    rows matching the delta's join values, the exact complement of
    what the anti-join needs. With the other table partitioned ON the
    join column (pruning engaged), never-matched right rows must
    still land null-extended."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a")], L_SCHEMA), partition_cols=["lp"])
    # right table partitioned on the join column ck: ck=9 never
    # matches any left row
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, 100), (11, 9, 110)], "ok long, ck long, amt long"),
        partition_cols=["ck"])
    out = join_sync_snapshot(spark, lt, rt, vw, on=["ck"],
                             left_keys=["ck"], right_keys=["ok"],
                             how="full")
    got = _full_join_state(spark, vw)
    want = _full_join_want(spark, lt, rt)
    assert got == want, (got, want)
    assert got[(9, 11)] == (None, 110), \
        "never-matched right row must survive the pruned initial sync"


def test_read_session_never_returns_unmarked_bootstrap(spark,
                                                       tmp_path):
    """r9 review finding: a version predating the consumer's first
    sync (a join view's empty bootstrap) is NOT consistent with any
    base version — the session must run the compaction-gap check
    against the first MARKED version and raise on a real-data gap,
    never hand back the bootstrap as 'consistent'."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_read_session,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot, join_sync_snapshot,
    )
    lt, rt, vw, agg = (str(tmp_path / n) for n in ("l", "r", "v",
                                                   "a"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a")], L_SCHEMA), partition_cols=["lp"])   # v0
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, 100, "x")], R_SCHEMA), partition_cols=["rp"])
    aggregate_sync_snapshot(spark, lt, agg, group_by=["seg"],
                            measures={"n": ("count", None)})
    # real data lands on lt BEFORE the join view first syncs
    snapshot_append(spark, lt, spark.createDataFrame(
        [(2, "base", "a")], L_SCHEMA))                          # v1
    join_sync_snapshot(spark, lt, rt, vw, on=["ck"],
                       left_keys=["ck"], right_keys=["ok"])
    # B = min(agg marker 0, join marker 1) = 0; the join view's only
    # marker-<=0 candidate is its UNMARKED bootstrap — refuse
    with pytest.raises(LookupError, match="not compaction-only"):
        snapshot_read_session(spark, lt, {
            "agg": (agg, f"aggregate_sync:{lt}"),
            "join": (vw, f"join_sync:left:{lt}"),
        })

    # compaction-only gap: accepted via the first MARKED version,
    # which must NOT be the empty bootstrap
    lt2, vw2, agg2 = (str(tmp_path / n) for n in ("l2", "v2", "a2"))
    snapshot_write(spark, lt2, spark.createDataFrame(
        [(1, "gold", "a")], L_SCHEMA), partition_cols=["lp"])   # v0
    aggregate_sync_snapshot(spark, lt2, agg2, group_by=["seg"],
                            measures={"n": ("count", None)})
    snapshot_compact(spark, lt2, target_file_bytes=1 << 30)     # v1
    join_sync_snapshot(spark, lt2, rt, vw2, on=["ck"],
                       left_keys=["ck"], right_keys=["ok"])
    sess = snapshot_read_session(spark, lt2, {
        "agg": (agg2, f"aggregate_sync:{lt2}"),
        "join": (vw2, f"join_sync:left:{lt2}"),
    })
    assert sess["base_version"] == 0
    assert sess["frames"]["join"].count() == 1, \
        "must pin the first SYNCED join-view version, not the " \
        "empty bootstrap"


def test_right_join_mirror_returns_pruning_stats(spark, tmp_path):
    """r9 review finding: the how='right' mirror must return the
    documented 'pruning' key with the side labels swapped back."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        join_sync_snapshot,
    )
    lt, rt, vw = (str(tmp_path / n) for n in ("l", "r", "v"))
    snapshot_write(spark, lt, spark.createDataFrame(
        [(1, "gold", "a")], L_SCHEMA), partition_cols=["lp"])
    snapshot_write(spark, rt, spark.createDataFrame(
        [(10, 1, 100, "x")], R_SCHEMA), partition_cols=["rp"])
    out = join_sync_snapshot(spark, lt, rt, vw, on=["ck"],
                             left_keys=["ck"], right_keys=["ok"],
                             how="right")
    assert "pruning" in out
    assert {p["side"] for p in out["pruning"]} <= {"left", "right"}


# ---------------------------------------------------------------- #
# approx_count_distinct (sketch-backed, r10)                       #
# ---------------------------------------------------------------- #

ACD_MEAS = {"nd": ("approx_count_distinct", "val"),
            "n": ("count", None)}


def _acd_exact(spark, tbl):
    return {r["g"]: (r["nd"], r["n"]) for r in
            read_snapshot(spark, tbl).groupBy("g").agg(
                F.countDistinct("val").alias("nd"),
                F.count(F.lit(1)).alias("n")).collect()}


def _acd_view(spark, vw):
    return {r["g"]: (r["nd"], r["n"]) for r in
            read_snapshot(spark, vw).select("g", "nd", "n")
            .collect()}


def test_approx_count_distinct_tracks_commit_matrix(spark,
                                                    tmp_path):
    """r9 VERDICT item 3: the sketch-backed distinct count tracks
    inserts, upserts, and deletes through the commit matrix; at
    small cardinality HLL is exact, so the view must EQUAL the
    from-scratch countDistinct after every step — including a group
    vanishing and the null group."""
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    rows = [(i, f"g{i % 2}" if i % 10 else None, "p0",
             float(i % 7)) for i in range(40)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=ACD_MEAS)
    assert _acd_view(spark, vw) == _acd_exact(spark, tbl)
    # insert-only (merge path)
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(100, "g0", "p0", 50.0), (101, "g9", "p0", 1.0),
         (102, None, "p0", 9.0)], AGG_SCHEMA))
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=ACD_MEAS)
    assert _acd_view(spark, vw) == _acd_exact(spark, tbl)
    # upsert changing values (delete half -> recompute path)
    snapshot_upsert(spark, tbl, spark.createDataFrame(
        [(0, "g0", "p0", 123.0), (101, "g9", "p0", 2.0)],
        AGG_SCHEMA), ["id"], partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=ACD_MEAS)
    assert _acd_view(spark, vw) == _acd_exact(spark, tbl)
    # deletes, including a vanishing group
    snapshot_delete(spark, tbl, spark.createDataFrame(
        [(101,)] + [(i,) for i in range(0, 40, 2)], "id long"),
        ["id"], partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=ACD_MEAS)
    got, want = _acd_view(spark, vw), _acd_exact(spark, tbl)
    assert got == want
    assert "g9" not in got, "vanished group must leave the view"


def test_approx_count_distinct_insert_only_never_rereads_base(
        spark, tmp_path):
    """The additive contract exact count_distinct forfeits, proven
    destructively: after the initial sync the base table's old data
    files are DELETED — and insert-only steps still sync, because
    the stored HLL sketch merges the commit's own sketch without
    touching the base."""
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    rows = [(i, f"g{i % 3}", "p0", float(i % 11)) for i in range(30)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=ACD_MEAS)
    want = {r["g"]: (r["nd"], r["n"]) for r in
            read_snapshot(spark, tbl).unionByName(
                spark.createDataFrame(
                    [(200, "g0", "p0", 99.0)], AGG_SCHEMA))
            .groupBy("g").agg(
                F.countDistinct("val").alias("nd"),
                F.count(F.lit(1)).alias("n")).collect()}
    old_files = set(read_snapshot(spark, tbl).inputFiles())
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(200, "g0", "p0", 99.0)], AGG_SCHEMA))
    for f in old_files:
        os.remove(f.removeprefix("file:"))
    out = aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                                  measures=ACD_MEAS)
    assert out["steps"] == 1
    assert _acd_view(spark, vw) == want


def test_approx_count_distinct_error_envelope(spark, tmp_path):
    """At real cardinality the estimate must sit inside the
    documented 3-sigma HLL envelope (±2.5% at lg_k=14) of the exact
    count — after an initial sync AND after a sketch-merging
    insert-only step."""
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    rows = [(i, "g0", "p0", float(i)) for i in range(20_000)]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(rows, AGG_SCHEMA),
                   partition_cols=["p"])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=ACD_MEAS)
    est = _acd_view(spark, vw)["g0"][0]
    assert abs(est - 20_000) <= 0.025 * 20_000, est
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(i, "g0", "p0", float(i)) for i in
         range(20_000, 30_000)], AGG_SCHEMA))
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=ACD_MEAS)
    est2 = _acd_view(spark, vw)["g0"][0]
    assert abs(est2 - 30_000) <= 0.025 * 30_000, est2
