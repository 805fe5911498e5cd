"""Snapshot -> index synchronization: a BM25 / IVF index driven by a
snapshot table's change feed equals a one-shot build over the table's
current content — through appends, deletes, text-updating upserts,
commits that don't touch the indexed columns, and replayed syncs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import bm25_probe, bm25_topk
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    read_snapshot, snapshot_append, snapshot_compact, snapshot_delete,
    snapshot_upsert, snapshot_write,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
    bm25_sync_snapshot, ivf_sync_snapshot, read_bm25_index,
    read_bm25_tombstones, read_ivf_index,
)
from tests.conftest import SF_DIR

QUERY = ["spark", "window", "merge"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _docs_table(spark, path, n=200):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text", "lang").limit(n)
            .withColumn("bucket",
                        (F.col("doc_id") % 4).cast("string")))
    v0 = snapshot_write(spark, path, docs, partition_cols=["bucket"])
    return docs, v0


def _probe_equals_rebuild(spark, table_path, idx, k=10):
    p, t, s = read_bm25_index(spark, idx)
    tombs = read_bm25_tombstones(spark, idx)
    got = bm25_probe(p, t, s, QUERY, k=k, buckets=16,
                     tombstones=tombs)
    want = bm25_topk(read_snapshot(spark, table_path)
                     .select("doc_id", "text"),
                     "doc_id", "text", QUERY, k=k)
    assert _rows(got) == _rows(want)


def test_bm25_sync_follows_table_commits(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "bm25")
    docs, _ = _docs_table(spark, tbl)

    # initial sync = full load of the current snapshot
    out = bm25_sync_snapshot(spark, tbl, index_path=idx,
                             id_col="doc_id", text_col="text",
                             buckets=16)
    assert out["steps"] == 1 and out["inserted"] == 200
    _probe_equals_rebuild(spark, tbl, idx)

    # append more docs -> incremental step indexes exactly them
    more = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text", "lang")
            .where("doc_id >= 200").limit(50)
            .withColumn("bucket", (F.col("doc_id") % 4).cast("string")))
    snapshot_append(spark, tbl, more)
    out = bm25_sync_snapshot(spark, tbl, index_path=idx,
                             id_col="doc_id", text_col="text",
                             buckets=16)
    assert out["inserted"] == 50 and out["deleted"] == 0
    _probe_equals_rebuild(spark, tbl, idx)

    # delete a slice -> tombstones + negative deltas propagate
    snapshot_delete(spark, tbl,
                    spark.createDataFrame(
                        [(i,) for i in range(0, 200, 3)], "doc_id long"),
                    ["doc_id"], partition_cols=["bucket"])
    out = bm25_sync_snapshot(spark, tbl, index_path=idx,
                             id_col="doc_id", text_col="text",
                             buckets=16)
    assert out["deleted"] > 0 and out["inserted"] == 0
    _probe_equals_rebuild(spark, tbl, idx)

    # upsert rewrites one doc's text -> delete+reinsert, tombstone
    # folded so the NEW text is probeable
    up = (read_snapshot(spark, tbl).where("doc_id = 1")
          .withColumn("text", F.lit("spark spark spark window")))
    snapshot_upsert(spark, tbl, up.select("doc_id", "text", "lang",
                                          "bucket"),
                    ["doc_id"], partition_cols=["bucket"])
    out = bm25_sync_snapshot(spark, tbl, index_path=idx,
                             id_col="doc_id", text_col="text",
                             buckets=16)
    assert out["inserted"] == 1 and out["deleted"] == 1
    _probe_equals_rebuild(spark, tbl, idx)
    p, t, s = read_bm25_index(spark, idx)
    full = bm25_probe(p, t, s, QUERY, k=10_000, buckets=16,
                      tombstones=read_bm25_tombstones(spark, idx))
    assert 1 in {r.doc_id for r in full.collect()}


def test_sync_is_idempotent_and_skips_untouched_columns(spark,
                                                        tmp_path):
    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "bm25")
    _docs_table(spark, tbl, n=60)
    bm25_sync_snapshot(spark, tbl, index_path=idx,
                       id_col="doc_id", text_col="text", buckets=16)

    # re-sync with no new commits: no steps, no writes
    out = bm25_sync_snapshot(spark, tbl, index_path=idx,
                             id_col="doc_id", text_col="text",
                             buckets=16)
    assert out == {"from_version": 0, "to_version": 0, "steps": 0,
                   "inserted": 0, "deleted": 0}

    # an upsert that only changes a NON-indexed column nets an empty
    # column-pruned feed: the step runs but writes nothing
    up = (read_snapshot(spark, tbl).where("doc_id = 2")
          .withColumn("lang", F.lit("xx")))
    snapshot_upsert(spark, tbl,
                    up.select("doc_id", "text", "lang", "bucket"),
                    ["doc_id"], partition_cols=["bucket"])
    out = bm25_sync_snapshot(spark, tbl, index_path=idx,
                             id_col="doc_id", text_col="text",
                             buckets=16)
    assert out["steps"] == 1
    assert out["inserted"] == 0 and out["deleted"] == 0
    _probe_equals_rebuild(spark, tbl, idx)

    # a compact commit is skipped without reading it
    snapshot_compact(spark, tbl, target_file_bytes=1 << 30)
    out = bm25_sync_snapshot(spark, tbl, index_path=idx,
                             id_col="doc_id", text_col="text",
                             buckets=16)
    assert out["steps"] == 0 and out["to_version"] == 2
    _probe_equals_rebuild(spark, tbl, idx)


def test_ivf_sync_follows_table_commits(spark, tmp_path):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.similarity import (
        ivf_index, kmeans_pivots,
    )

    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "ivf")
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .selectExpr("vec_id as id", "embedding as vec").limit(300)
           .withColumn("part", (F.col("id") % 3).cast("string")))
    pivots = kmeans_pivots(emb, "id", "vec", nlist=8, iters=3)
    v0 = snapshot_write(spark, tbl, emb, partition_cols=["part"])

    def _index_equals_rebuild():
        live = (read_snapshot(spark, tbl)
                .selectExpr("id", "vec"))
        want = _rows(ivf_index(live, "id", "vec", pivots)
                     .select("id", "cell"))
        got = _rows(read_ivf_index(spark, idx).select("id", "cell"))
        assert got == want

    out = ivf_sync_snapshot(spark, tbl, index_path=idx, id_col="id",
                            vec_col="vec", pivots=pivots)
    assert out["steps"] == 1 and out["inserted"] == 300
    _index_equals_rebuild()

    # delete a slice
    snapshot_delete(spark, tbl,
                    spark.createDataFrame([(i,) for i in range(0, 300, 5)],
                                          "id long"),
                    ["id"], partition_cols=["part"])
    out = ivf_sync_snapshot(spark, tbl, index_path=idx, id_col="id",
                            vec_col="vec", pivots=pivots)
    assert out["deleted"] == 60 and out["inserted"] == 0
    _index_equals_rebuild()

    # update one id's vector: delete half tombstones, compaction folds
    # it, reinserted vector must survive even in the SAME cell
    one = read_snapshot(spark, tbl).where("id = 1")
    up = one.withColumn(
        "vec", F.transform("vec", lambda x: x * F.lit(1.0)))
    snapshot_upsert(spark, tbl, up, ["id"], partition_cols=["part"])
    # the vector is bit-identical -> column-pruned feed nets empty
    out = ivf_sync_snapshot(spark, tbl, index_path=idx, id_col="id",
                            vec_col="vec", pivots=pivots)
    assert out["inserted"] == 0 and out["deleted"] == 0
    _index_equals_rebuild()

    up2 = one.withColumn(
        "vec", F.transform("vec", lambda x: x * F.lit(1.5)))
    snapshot_upsert(spark, tbl, up2, ["id"], partition_cols=["part"])
    out = ivf_sync_snapshot(spark, tbl, index_path=idx, id_col="id",
                            vec_col="vec", pivots=pivots)
    assert out["inserted"] == 1 and out["deleted"] == 1
    _index_equals_rebuild()
    assert 1 in {r.id for r in read_ivf_index(spark, idx)
                 .select("id").collect()}


def test_sync_refuses_rebuilt_table(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "bm25")
    _docs_table(spark, tbl, n=30)
    bm25_sync_snapshot(spark, tbl, index_path=idx,
                       id_col="doc_id", text_col="text", buckets=16)
    # simulate an index synced AHEAD of the table (table recreated)
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming.ingest import _mark_synced
    _mark_synced(spark, idx, 99)
    with pytest.raises(ValueError, match="resync"):
        bm25_sync_snapshot(spark, tbl, index_path=idx,
                           id_col="doc_id", text_col="text",
                           buckets=16)


def test_minhash_sync_mines_pairs_across_commits(spark, tmp_path):
    """The minhash member of the sync family: pairs mined across
    commits equal a one-shot mine over the live corpus, deletes stop
    matching immediately, and an updated doc's reinserted rows survive
    tombstone compaction."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import minhash_sync_snapshot

    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "mh")
    pairs = str(tmp_path / "pairs")
    base = "the quick brown fox jumps over the lazy dog in the field"
    docs = [(0, base, "d0"), (1, base + " x", "d1"),
            (2, "completely different text about spark execution", "d0"),
            (3, "another unrelated document on window functions", "d1")]
    snapshot_write(spark, tbl,
                   spark.createDataFrame(docs,
                                         "doc_id long, text string, "
                                         "bucket string"),
                   partition_cols=["bucket"])
    params = dict(threshold=0.5, num_perm=16, shingle_n=3)
    out = minhash_sync_snapshot(spark, tbl, index_path=idx,
                                pairs_path=pairs, id_col="doc_id",
                                text_col="text", **params)
    assert out["inserted"] == 4

    def _mined():
        return {(r["corpus_id"], r["new_id"]) if r["corpus_id"]
                < r["new_id"] else (r["new_id"], r["corpus_id"])
                for r in spark.read.parquet(pairs).collect()}

    want = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in minhash_lsh_pairs(
                read_snapshot(spark, tbl), "text", "doc_id",
                **params).collect()}
    assert _mined() == want and (0, 1) in want

    # append a near-dup of doc 2 -> cross-batch pair appears
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(4, "completely different text about spark execution!",
          "d0")], "doc_id long, text string, bucket string"))
    minhash_sync_snapshot(spark, tbl, index_path=idx,
                          pairs_path=pairs, id_col="doc_id",
                          text_col="text", **params)
    assert (2, 4) in _mined()

    # delete doc 0, then append ANOTHER near-dup of the base text:
    # it must pair with surviving doc 1, not deleted doc 0
    snapshot_delete(spark, tbl, spark.createDataFrame([(0,)],
                                                      "doc_id long"),
                    ["doc_id"], partition_cols=["bucket"])
    minhash_sync_snapshot(spark, tbl, index_path=idx,
                          pairs_path=pairs, id_col="doc_id",
                          text_col="text", **params)
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(5, base + " y", "d1")],
        "doc_id long, text string, bucket string"))
    minhash_sync_snapshot(spark, tbl, index_path=idx,
                          pairs_path=pairs, id_col="doc_id",
                          text_col="text", **params)
    mined = _mined()
    assert (1, 5) in mined and (0, 5) not in mined


def test_snapshot_follow_generic_consumer_exactly_once(spark,
                                                       tmp_path):
    """The public follower drives an arbitrary consumer once per
    commit: replays are no-ops, compact commits are skipped, and the
    initial call delivers the whole snapshot as inserts."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import snapshot_follow

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "consumer")
    seen: list[tuple] = []

    def consume(ch, v):
        seen.extend((v, r["doc_id"], r["_change_type"])
                    for r in ch.collect())

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(5)
            .withColumn("b", (F.col("doc_id") % 2).cast("string")))
    snapshot_write(spark, tbl, docs, partition_cols=["b"])
    out = snapshot_follow(spark, tbl, state_path=state, apply=consume,
                          key_cols=["doc_id"],
                          columns=["doc_id", "text"])
    assert out["steps"] == 1 and len(seen) == 5
    assert all(t == "insert" for _, _, t in seen)

    # replay: nothing re-delivered
    snapshot_follow(spark, tbl, state_path=state, apply=consume,
                    key_cols=["doc_id"], columns=["doc_id", "text"])
    assert len(seen) == 5

    snapshot_compact(spark, tbl, target_file_bytes=1 << 30)
    snapshot_delete(spark, tbl,
                    spark.createDataFrame([(seen[0][1],)],
                                          "doc_id long"),
                    ["doc_id"], partition_cols=["b"])
    out = snapshot_follow(spark, tbl, state_path=state, apply=consume,
                          key_cols=["doc_id"],
                          columns=["doc_id", "text"])
    # compact skipped (1 step, the delete), one delete row delivered
    assert out["steps"] == 1
    assert seen[-1][2] == "delete" and len(seen) == 6


def test_sync_status_reports_lag_from_manifests(spark, tmp_path):
    """Lag observability without reading data: head/synced/lag plus
    the pending commits' operations in order, for fresh, caught-up
    and lagging consumers alike."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        snapshot_follow, sync_status,
    )
    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(6)
            .withColumn("b", (F.col("doc_id") % 2).cast("string")))
    snapshot_write(spark, tbl, docs, partition_cols=["b"])
    st = sync_status(spark, tbl, state)
    assert st == {"table_head": 0, "synced_version": None,
                  "lag_commits": 1, "pending_operations": ["write"]}
    snapshot_follow(spark, tbl, state_path=state,
                    apply=lambda ch, v: ch.count(),
                    columns=["doc_id", "text"])
    st = sync_status(spark, tbl, state)
    assert st["lag_commits"] == 0 and st["pending_operations"] == []
    snapshot_append(spark, tbl, spark.createDataFrame(
        [(999, "late doc", "1")], "doc_id long, text string, b string"))
    snapshot_compact(spark, tbl, target_file_bytes=1 << 30)
    st = sync_status(spark, tbl, state)
    assert st["lag_commits"] == 2
    assert st["pending_operations"] == ["append", "compact"]


def test_stream_to_table_to_view_dataflow_exactly_once(spark,
                                                       tmp_path):
    """The full streaming dataflow in one foreachBatch: file stream →
    exactly-once snapshot append → aggregate view sync via
    post_batch. The view tracks across new arrivals, and a restart
    with no new files advances nothing."""
    from pyspark.sql import types as T

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        latest_version, read_snapshot as read_snap,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot, file_stream, snapshot_append_stream,
    )
    src = str(tmp_path / "in")
    tbl, vw, ckpt = (str(tmp_path / n) for n in ("tbl", "vw", "ck"))
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("g", T.StringType()),
        T.StructField("v", T.DoubleType())])
    meas = {"n": ("count", None), "s": ("sum", "v")}

    def pump():
        q = snapshot_append_stream(
            file_stream(spark, src, schema),
            path=tbl, partition_cols=[], checkpoint_dir=ckpt,
            post_batch=lambda bid: aggregate_sync_snapshot(
                spark, tbl, vw, group_by=["g"], measures=meas))
        q.awaitTermination()

    def check():
        want = {r["g"]: (r["n"], r["s"]) for r in
                read_snap(spark, tbl).groupBy("g").agg(
                    F.count("*").alias("n"),
                    F.sum("v").alias("s")).collect()}
        got = {r["g"]: (r["n"], r["s"]) for r in
               read_snap(spark, vw).collect()}
        assert got == want, (got, want)

    (spark.createDataFrame([(i, f"g{i % 3}", float(i))
                            for i in range(30)], schema)
     .coalesce(1).write.mode("append").parquet(src))
    pump()
    check()
    tbl_head, vw_head = latest_version(spark, tbl), \
        latest_version(spark, vw)
    # new arrivals advance both table and view
    (spark.createDataFrame([(100 + i, "g0", 7.0) for i in range(5)],
                           schema)
     .coalesce(1).write.mode("append").parquet(src))
    pump()
    check()
    assert latest_version(spark, tbl) == tbl_head + 1
    assert latest_version(spark, vw) == vw_head + 1
    # restart with nothing new: no table commit, no view commit
    pump()
    assert latest_version(spark, tbl) == tbl_head + 1
    assert latest_version(spark, vw) == vw_head + 1
    check()


def test_sync_status_survives_pruned_history_and_rebuilds(spark,
                                                          tmp_path):
    """Observability must not crash where it matters most: a
    consumer lagging past retention sees '(pruned)' placeholders,
    and a rebuilt table raises the follower's own error."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_prune,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        sync_status,
    )
    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    df = spark.createDataFrame([(1, "a", "x")],
                               "doc_id long, text string, b string")
    snapshot_write(spark, tbl, df, partition_cols=["b"])
    for k in range(3):
        snapshot_append(spark, tbl, df)
    snapshot_prune(spark, tbl, keep_latest=2,
                   orphan_grace_seconds=0.0)
    st = sync_status(spark, tbl, state)      # fresh consumer, lo=0
    assert st["lag_commits"] == 4
    assert st["pending_operations"][:2] == ["(pruned)", "(pruned)"]
    assert st["pending_operations"][-1] == "append"
    # rebuilt table: synced marker ahead of head
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming.ingest import (
        _mark_synced,
    )
    _mark_synced(spark, state, 99)
    with pytest.raises(ValueError, match="rebuilt"):
        sync_status(spark, tbl, state)


def test_snapshot_follow_initial_load_pinned_to_marker(spark,
                                                       tmp_path,
                                                       monkeypatch):
    """The initial full load must read the SAME version recorded as
    the synced marker (r8 advisor finding): a commit landing between
    the follower's head resolution and an UNPINNED latest read would
    be delivered in the initial load and then re-applied by the next
    step's change feed — double-counting. Simulate the race by
    pinning latest_version to the older head while a newer commit is
    already published."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import snapshot_follow
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import ingest as _ingest
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import snapshots as _snaps

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "consumer")
    v0 = snapshot_write(
        spark, tbl,
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "doc_id long, text string"),
        partition_cols=[])
    v1 = snapshot_append(
        spark, tbl,
        spark.createDataFrame([(3, "c")], "doc_id long, text string"))
    assert v1 == v0 + 1

    seen: list[tuple] = []

    def consume(ch, v):
        seen.extend((v, r["doc_id"]) for r in ch.collect())

    # the follower resolved head=v0 just before v1 landed
    real = _snaps.latest_version
    monkeypatch.setattr(_snaps, "latest_version",
                        lambda sp, p: v0)
    out = snapshot_follow(spark, tbl, state_path=state, apply=consume)
    assert out["to_version"] == v0 and out["steps"] == 1
    assert sorted(d for _, d in seen) == [1, 2], \
        "initial load must be pinned to the recorded marker version"
    monkeypatch.setattr(_snaps, "latest_version", real)

    # the next step delivers v1's rows exactly once
    snapshot_follow(spark, tbl, state_path=state, apply=consume)
    assert sorted(d for _, d in seen) == [1, 2, 3]
