"""Batch orchestration parity tests: manifest → sync run → catalog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.pipeline.batch import (
    BatchManifest, register_table, run_sync_batch,
)


@pytest.fixture()
def topic_data(spark, tmp_path):
    """Two bags × two topics written as per-topic parquet dirs, plus a
    manifest covering batch 1."""
    base = tmp_path / "lake"
    rows_speed = [("bagA", 10.0, 1.0), ("bagA", 10.4, 2.0),
                  ("bagB", 20.0, 5.0), ("bagB", 20.4, 6.0)]
    rows_gear = [("bagA", 10.1, 1), ("bagB", 20.1, 3)]
    speed = spark.createDataFrame(rows_speed, "bag_file string, t double, speed double")
    gear = spark.createDataFrame(rows_gear, "bag_file string, t double, gear int")
    speed.write.parquet(str(base / "speed"))
    gear.write.parquet(str(base / "gear"))

    manifest = BatchManifest(spark, str(tmp_path / "manifest"))
    manifest.append([
        (1, "bagA", "speed", str(base / "speed")),
        (1, "bagA", "gear", str(base / "gear")),
        (1, "bagB", "speed", str(base / "speed")),
        (1, "bagB", "gear", str(base / "gear")),
        (2, "bagC", "speed", str(base / "speed")),
    ])
    return manifest


def test_manifest_read_prunes_batch(spark, topic_data):
    assert topic_data.topics(1) == ["gear", "speed"]
    assert topic_data.topics(2) == ["speed"]
    assert topic_data.read(1).count() == 4


def test_run_sync_batch_end_to_end(spark, topic_data, tmp_path):
    out = str(tmp_path / "synchronized")
    run_sync_batch(spark, topic_data, 1, ["bag_file"], "t", 0.1, out)
    back = spark.read.option("basePath", out).parquet(out)
    rows = {(r.bag_file, round(r.t, 1)): r for r in back.collect()}
    # bagA grid: 10.0..10.4 at 0.1 → 5 ticks; bagB likewise
    assert sum(1 for (b, _) in rows if b == "bagA") == 5
    assert rows[("bagA", 10.2)].speed.speed == 1.0   # LOCF from 10.0
    assert rows[("bagA", 10.2)].gear.gear == 1       # LOCF from 10.1
    assert rows[("bagB", 20.4)].speed.speed == 6.0
    # hive partition layout preserved for pruning
    import os
    assert any(d.startswith("bag_file=") for d in os.listdir(out))


def test_register_table_partitioned(spark, topic_data, tmp_path):
    out = str(tmp_path / "synchronized")
    run_sync_batch(spark, topic_data, 1, ["bag_file"], "t", 0.1, out)
    register_table(spark, "sync_test", out, partition_cols=["bag_file"])
    try:
        n = spark.sql("select count(*) c from sync_test "
                      "where bag_file = 'bagA'").first().c
        assert n == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS sync_test")


def test_compact_files_right_sizes_and_preserves_data(spark, tmp_path):
    """64 tiny append files (the streaming-sink shape) compact into
    ~total/target files with identical data; sort_cols re-establishes
    time clustering in the same pass (disjoint per-file min/max)."""
    import glob

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        compact_files, dataset_bytes,
    )
    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") * 7 % 97).alias("v"))
    df.repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64

    total = dataset_bytes(spark, src)
    n = compact_files(spark, src, dst, target_file_bytes=total // 4 + 1)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n <= 5
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]

    # compact + re-sort: per-file id ranges must be disjoint
    dst2 = str(tmp_path / "sorted")
    compact_files(spark, src, dst2, target_file_bytes=total // 4 + 1,
                  sort_cols=["id"])
    import pyarrow.parquet as pq
    spans = []
    for f in sorted(glob.glob(f"{dst2}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        ids = [md.row_group(i).column(0).statistics for i in range(md.num_row_groups)]
        spans.append((min(s.min for s in ids), max(s.max for s in ids)))
    spans.sort()
    assert all(a_hi < b_lo for (_, a_hi), (b_lo, _) in zip(spans, spans[1:]))


def test_zordered_with_hive_partitions_no_file_blowup(spark, tmp_path):
    """Partition cols lead the z-range key: each output task writes
    whole hive partitions, so total files stay ~num_files instead of
    num_files x partitions."""
    import glob

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        write_zordered,
    )
    df = spark.range(4000).select(
        (F.col("id") % 4).alias("part"),
        (F.col("id") % 100).cast("double").alias("x"),
        ((F.col("id") * 13) % 100).cast("double").alias("y"))
    path = str(tmp_path / "zp")
    write_zordered(df, path, ["x", "y"],
                   ranges={"x": (0, 99), "y": (0, 99)},
                   num_files=8, partition_cols=["part"], mode="overwrite")
    files = glob.glob(f"{path}/part=*/*.parquet")
    # 8 range partitions, each writing into the few hive partitions its
    # range covers -> bounded by num_files + partitions slack, not 8*4
    assert len(files) <= 12
    back = spark.read.parquet(path)
    assert back.count() == 4000


def test_merge_upsert_latest_wins_and_partition_preserving(spark, tmp_path):
    """merge_upsert: updates win (or highest order_col), only touched
    partitions are rewritten, untouched partition files stay put."""
    import os

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        merge_upsert,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "d1", "a", 10), (2, "d1", "b", 10), (3, "d2", "c", 10)],
        "id long, day string, val string, ver int")
    base.write.partitionBy("day").parquet(path)

    def files(day):
        d = f"{path}/day={day}"
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    d2_before = files("d2")
    updates = spark.createDataFrame(
        [(2, "d1", "b2", 11), (4, "d1", "new", 11)],
        "id long, day string, val string, ver int")
    merge_upsert(spark, path, updates, ["id"], partition_cols=["day"],
                 order_col="ver")
    got = {(r.id, r.day, r.val, r.ver)
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d1", "a", 10), (2, "d1", "b2", 11),
                   (4, "d1", "new", 11), (3, "d2", "c", 10)}
    assert files("d2") == d2_before  # untouched partition not rewritten

    # order_col protects against stale replays: an older ver loses
    stale = spark.createDataFrame([(2, "d1", "old", 5)],
                                  "id long, day string, val string, ver int")
    merge_upsert(spark, path, stale, ["id"], partition_cols=["day"],
                 order_col="ver")
    assert {(r.id, r.val) for r in
            spark.read.parquet(path).where("day='d1'").collect()} == \
        {(1, "a"), (2, "b2"), (4, "new")}

    import pytest
    with pytest.raises(ValueError):
        merge_upsert(spark, path, updates, ["id"], partition_cols=[])


def test_snapshot_diff_add_remove_change(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "id long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 1.0),          # unchanged -> no row
         (2, "b", 2.0),          # NULL -> value = changed
         (3, "cc", 3.0),         # s changed
         (5, "e", 5.0)],         # added; 4 removed
        "id long, s string, v double")
    out = {r.id: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[5].change == "added" and out[4].change == "removed"
    assert out[2].change == "changed" and out[2].changed_cols == ["v"]
    assert out[3].changed_cols == ["s"]
    assert out[3].old_s == "c" and out[3].new_s == "cc"

    import pytest
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError):
        snapshot_diff(old, new, ["id"], ["nope"])


def test_snapshot_diff_output_scales_with_churn_not_table(spark):
    """Identical snapshots diff to zero rows, and the plan is one
    full-outer equi-join (no nested loop)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import snapshot_diff
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    d = snapshot_diff(orders, orders, ["o_orderkey"])
    assert d.count() == 0
    plan = formatted_plan(d)
    assert "FullOuter" in plan and "NestedLoop" not in plan


def test_delete_keys_removes_rows_partition_preserving(spark, tmp_path):
    """delete_keys: listed keys vanish, untouched partitions' files
    are not rewritten."""
    import os

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        delete_keys,
    )

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"), (4, "d3", "d")],
        "id long, day string, val string") \
        .write.partitionBy("day").parquet(path)

    def files(day):
        d = f"{path}/day={day}"
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    d3_before = files("d3")
    dels = spark.createDataFrame([(2,), (3,), (99,)], "id long")
    delete_keys(spark, path, dels, ["id"], partition_cols=["day"])
    got = {(r.id, r.day) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d1"), (4, "d3")}
    assert files("d3") == d3_before

    import pytest
    with pytest.raises(ValueError):
        delete_keys(spark, path, dels, ["id"], partition_cols=[])


def test_prune_versions_keeps_latest(spark, tmp_path):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        prune_versions,
    )

    path = str(tmp_path / "snap")
    for v in (3, 7, 11):
        spark.range(5).withColumn("_version", F.lit(v)) \
            .write.mode("append").partitionBy("_version").parquet(path)
    dropped = prune_versions(spark, path, keep_latest=1)
    assert dropped == [3, 7]
    left = spark.read.parquet(path)
    assert left.select("_version").distinct().collect()[0][0] == 11
    # idempotent; missing path is a no-op
    assert prune_versions(spark, path, keep_latest=1) == []
    assert prune_versions(spark, str(tmp_path / "nope")) == []
    import pytest
    with pytest.raises(ValueError):
        prune_versions(spark, path, keep_latest=0)


def test_merge_upsert_mutable_partition_key(spark, tmp_path):
    """immutable_partitions=False merges away the stale copy when an
    update MOVES a key to another partition; the default contract
    documents that it would not."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        merge_upsert,
    )

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "d1", "a", 1), (2, "d2", "b", 1)],
                          "id long, day string, val string, ver int") \
        .write.partitionBy("day").parquet(path)
    moved = spark.createDataFrame([(1, "d2", "a2", 2)],
                                  "id long, day string, val string, ver int")
    merge_upsert(spark, path, moved, ["id"], partition_cols=["day"],
                 order_col="ver", immutable_partitions=False)
    got = {(r.id, r.day, r.val) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d2", "a2"), (2, "d2", "b")}


def test_merge_upsert_stale_replay_to_phantom_partition(spark, tmp_path):
    """A stale CDC replay can carry a partition value that was never
    written to disk (the key has since moved on and the replayed row
    loses the merge): with immutable_partitions=False the merge must
    not try to drop the phantom directory — the emptied set only
    contains partitions actually present on disk."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        merge_upsert,
    )

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "d2", "current", 5), (2, "d1", "b", 1)],
                          "id long, day string, val string, ver int") \
        .write.partitionBy("day").parquet(path)
    # key 1 once lived in d9 — never materialized here — and the replay
    # loses to ver 5 already in the table
    stale = spark.createDataFrame([(1, "d9", "old", 2)],
                                  "id long, day string, val string, ver int")
    merge_upsert(spark, path, stale, ["id"], partition_cols=["day"],
                 order_col="ver", immutable_partitions=False)
    got = {(r.id, r.day, r.val) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d2", "current"), (2, "d1", "b")}
    import os
    assert not os.path.exists(os.path.join(path, "day=d9"))


def test_merge_upsert_schema_evolution_contract(spark, tmp_path):
    """Default: a drifted updates schema raises, naming the columns.
    schema_evolution=True: new columns evolve the table (old rows NULL
    via mergeSchema), update rows missing a column win with NULL."""
    import pytest

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        merge_upsert,
    )

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "d1", "a"), (2, "d2", "b")],
                          "id long, day string, val string") \
        .write.partitionBy("day").parquet(path)

    with_new = spark.createDataFrame([(1, "d1", "a2", 9.5)],
                                     "id long, day string, val string,"
                                     " score double")
    with pytest.raises(ValueError, match="score"):
        merge_upsert(spark, path, with_new, ["id"],
                     partition_cols=["day"])
    missing_col = spark.createDataFrame([(2, "d2")],
                                        "id long, day string")
    with pytest.raises(ValueError, match="val"):
        merge_upsert(spark, path, missing_col, ["id"],
                     partition_cols=["day"])
    # key/partition columns can never be evolved away, even opted-in
    with pytest.raises(ValueError, match="never"):
        merge_upsert(spark, path, spark.createDataFrame([(1, "x")],
                                                        "id long, val string"),
                     ["id"], partition_cols=["day"],
                     schema_evolution=True)

    # add-column evolution
    merge_upsert(spark, path, with_new, ["id"], partition_cols=["day"],
                 schema_evolution=True)
    got = {(r.id, r.val, r.score) for r in
           spark.read.option("mergeSchema", "true").parquet(path)
           .collect()}
    assert got == {(1, "a2", 9.5), (2, "b", None)}

    # drop-column update batch: the winning row carries NULL for the
    # absent column (whole-row SCD1 replace, not a field patch)
    merge_upsert(spark, path, missing_col, ["id"],
                 partition_cols=["day"], schema_evolution=True)
    got = {(r.id, r.val) for r in
           spark.read.option("mergeSchema", "true").parquet(path)
           .select("id", "val").collect()}
    assert got == {(1, "a2"), (2, None)}


def test_snapshot_diff_name_collision_raises(spark):
    """Key/option names colliding with the diff's internal columns
    (_in_old/_in_new, old_/new_ prefixes, change_col) raise a clear
    ValueError instead of an ambiguous-column error or a silently
    wrong classification."""
    import pytest

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import snapshot_diff

    df = spark.createDataFrame([(1, "x", "y")],
                               "old_val string, val string, _in_old string")
    with pytest.raises(ValueError, match="collision"):
        snapshot_diff(df.select("old_val", "val"),
                      df.select("old_val", "val"),
                      ["old_val"], ["val"])
    with pytest.raises(ValueError, match="collision"):
        snapshot_diff(df.select("_in_old", "val"),
                      df.select("_in_old", "val"),
                      ["_in_old"], ["val"])
    ok = spark.createDataFrame([(1, "a")], "id long, val string")
    with pytest.raises(ValueError, match="collision"):
        snapshot_diff(ok, ok, ["id"], ["val"], change_col="id")


def test_fs_probes(spark, tmp_path):
    """path_exists / dataset_has_data answer the filesystem questions
    the ingest guards ask — without reading data."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources.tables import (
        dataset_has_data, path_exists,
    )

    missing = str(tmp_path / "nope")
    assert not path_exists(spark, missing)
    assert not dataset_has_data(spark, missing)
    empty = tmp_path / "emptied"
    empty.mkdir()
    (empty / "_SUCCESS").write_text("")
    assert path_exists(spark, str(empty))
    assert not dataset_has_data(spark, str(empty))
    real = str(tmp_path / "tbl")
    spark.range(3).write.parquet(real)
    assert dataset_has_data(spark, real)


def test_delete_keys_null_and_escaped_partition_values(spark, tmp_path):
    """Emptied partitions with NULL or percent-escaped values are
    located and dropped via Hive's naming rules (silent no-op would
    resurrect 'deleted' rows)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        delete_keys,
    )

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, None, "x"), (2, "a:b", "y"), (3, "ok", "z")],
        "id long, day string, val string") \
        .write.partitionBy("day").parquet(path)
    dels = spark.createDataFrame([(1,), (2,)], "id long")
    delete_keys(spark, path, dels, ["id"], partition_cols=["day"])
    got = {(r.id, r.day) for r in spark.read.parquet(path).collect()}
    assert got == {(3, "ok")}


def test_expectations_empty_table_reports_not_crashes(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import check_expectations

    empty = spark.createDataFrame([], "id long, v double")
    rep = {r.rule: r for r in check_expectations(empty, [
        {"type": "not_null", "col": "v"},
        {"type": "row_count_min", "n": 5},
        {"type": "unique", "cols": ["id"]},
    ]).collect()}
    assert rep["not_null"].passed and rep["not_null"].n_violations == 0
    assert not rep["row_count_min"].passed
    assert rep["row_count_min"].n_violations == 5
    assert rep["unique"].passed


def test_temperature_mix_rates_zero_and_null_strata(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import temperature_mix_rates

    df = spark.createDataFrame(
        [("full", 100), ("empty", 0), ("empty", 0),
         ("nulls", None), ("full", 50)],
        "src string, n long")
    rates = temperature_mix_rates(df, "src", size_col="n")
    assert rates["empty"] == 0.0 and rates["nulls"] == 0.0
    assert rates["full"] == 1.0
