"""Deletion propagation into the persisted indexes (r7): tombstoned
probes equal filtered rebuilds EXACTLY (scores included — the negative
stat deltas make the probe see the filtered corpus, not stale
statistics), compaction folds tombstones in physically and equals a
rebuild over the survivors, deletes are replay-idempotent, and
compaction touches only the partitions that contain tombstoned rows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    bm25_probe, bm25_topk,
)
from tests.conftest import SF_DIR

QUERY = ["spark", "window", "merge"]
DEL = "doc_id % 3 = 0 or doc_id = 206"


def _docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _build_bm25(spark, docs, idx, buckets):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import bm25_index_batch
    bm25_index_batch(docs.where("doc_id % 2 = 0"), 0, "doc_id", "text",
                     index_path=idx, buckets=buckets)
    bm25_index_batch(docs.where("doc_id % 2 = 1"), 1, "doc_id", "text",
                     index_path=idx, buckets=buckets)


def test_bm25_tombstoned_probe_equals_filtered_rebuild(spark, tmp_path):
    """Probe-after-delete == one-shot BM25 over the corpus minus the
    deleted docs — scores identical, because tombstones remove the
    postings while the negative df_t / corpus deltas shift idf, n_docs
    and avgdl to the filtered corpus's exact values."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        bm25_delete_batch, read_bm25_index, read_bm25_tombstones,
    )
    docs = _docs(spark)
    idx = str(tmp_path / "bm25")
    _build_bm25(spark, docs, idx, buckets=32)

    deleted = docs.where(DEL)
    assert deleted.count() > 0
    bm25_delete_batch(deleted, 0, "doc_id", "text", index_path=idx,
                      buckets=32)

    p, t, s = read_bm25_index(spark, idx)
    tombs = read_bm25_tombstones(spark, idx)
    assert tombs is not None
    got = bm25_probe(p, t, s, QUERY, k=15, buckets=32, tombstones=tombs)
    want = bm25_topk(docs.where(f"not ({DEL})"), "doc_id", "text",
                     QUERY, k=15)
    assert _rows(got) == _rows(want) and got.count() == 15

    # the deletion actually changed the answer (top docs were deleted)
    stale = bm25_probe(p, t, s, QUERY, k=15, buckets=32)
    assert _rows(stale) != _rows(got)

    # no tombstoned id survives anywhere in the ranking, not just top-k
    full = bm25_probe(p, t, s, QUERY, k=10_000, buckets=32,
                      tombstones=tombs)
    gone = {r.doc_id for r in deleted.select("doc_id").collect()}
    assert not ({r.doc_id for r in full.collect()} & gone)

    # replaying the same delete batch rewrites its own subpartitions —
    # stats counted once, result unchanged
    bm25_delete_batch(deleted, 0, "doc_id", "text", index_path=idx,
                      buckets=32)
    p, t, s = read_bm25_index(spark, idx)
    got2 = bm25_probe(p, t, s, QUERY, k=15, buckets=32,
                      tombstones=read_bm25_tombstones(spark, idx))
    assert _rows(got2) == _rows(want)


def test_bm25_compact_folds_tombstones_and_prunes_untouched(
        spark, tmp_path):
    """Compaction == rebuild over survivors: after
    bm25_compact_deletes a probe WITHOUT tombstones matches the
    filtered corpus, the deleted ids are physically gone from the
    postings, the tombstone relation is cleared, and bucket
    directories no tombstone touches are not rewritten."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import bm25_deletion_deltas
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        bm25_compact_deletes, bm25_delete_batch, read_bm25_index,
        read_bm25_tombstones,
    )
    docs = _docs(spark)
    idx = str(tmp_path / "bm25")
    _build_bm25(spark, docs, idx, buckets=256)

    # a SMALL delete (the two top-ranked docs) so most of the 256
    # buckets are untouched and the rewrite scope is observable
    deleted = docs.where("doc_id in (135, 206)")
    bm25_delete_batch(deleted, 0, "doc_id", "text", index_path=idx,
                      buckets=256)
    touched = {r[0] for r in
               bm25_deletion_deltas(deleted, "doc_id", "text",
                                    buckets=256)["tombstones"]
               .select("term_bucket").distinct().collect()}
    post_root = f"{idx}/postings"
    untouched_mtimes = {
        d: os.path.getmtime(os.path.join(post_root, d))
        for d in os.listdir(post_root)
        if d.startswith("term_bucket=")
        and int(d.split("=")[1]) not in touched}
    assert untouched_mtimes, "need untouched buckets for the check"

    res = bm25_compact_deletes(spark, idx, id_col="doc_id")
    assert res["buckets_rewritten"] == len(touched)
    assert read_bm25_tombstones(spark, idx) is None

    p, t, s = read_bm25_index(spark, idx)
    assert p.where("doc_id in (135, 206)").count() == 0
    got = bm25_probe(p, t, s, QUERY, k=15, buckets=256)
    want = bm25_topk(docs.where("doc_id not in (135, 206)"),
                     "doc_id", "text", QUERY, k=15)
    assert _rows(got) == _rows(want)

    for d, m in untouched_mtimes.items():
        assert os.path.getmtime(os.path.join(post_root, d)) == m, \
            f"untouched bucket {d} was rewritten"

    # compaction is idempotent: a re-run is a no-op
    assert bm25_compact_deletes(spark, idx, id_col="doc_id") == {
        "buckets_rewritten": 0, "partitions_emptied": 0}


def test_minhash_loop_excludes_deleted_and_compacts(spark, tmp_path):
    """After index_delete_batch, the ingest loop's probe stops matching
    the deleted corpus doc immediately (pairs equal a probe against an
    index rebuilt from the survivors); compaction removes its rows
    physically and clears the tombstones."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        minhash_index, minhash_match_pairs,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        incremental_dedup_batch, index_compact_deletes,
        index_delete_batch,
    )
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm window sill in the morning sun")
    other = ("completely different text about spark query engines and "
             "shuffle partitions at terabyte scale with adaptive plans")
    b0 = spark.createDataFrame(
        [(0, base), (1, base + " extended slightly"), (2, other)],
        "doc_id long, text string")
    idx = str(tmp_path / "mh")
    pairs = str(tmp_path / "pairs")
    incremental_dedup_batch(b0, 0, "text", "doc_id",
                            index_path=idx, pairs_path=pairs,
                            threshold=0.5)

    index_delete_batch(spark.createDataFrame([(0,)], "doc_id long"),
                       0, "doc_id", index_path=idx)

    b1 = spark.createDataFrame(
        [(10, base.replace("morning", "evening"))],
        "doc_id long, text string")
    incremental_dedup_batch(b1, 1, "text", "doc_id",
                            index_path=idx, pairs_path=pairs,
                            threshold=0.5)
    got = {(r.new_id, r.corpus_id, round(r.jaccard, 6)) for r in
           spark.read.parquet(pairs).where("_batch_id = 1").collect()}
    assert all(c != 0 for _, c, _ in got), "deleted doc still matched"
    survivors = b0.where("doc_id != 0")
    want = {(r.new_id, r.corpus_id, round(r.jaccard, 6)) for r in
            minhash_match_pairs(
                b1, minhash_index(survivors, "text", "doc_id"),
                "text", "doc_id", threshold=0.5).collect()}
    assert got == want and len(want) >= 1

    index_compact_deletes(spark, idx, "doc_id")
    live = spark.read.parquet(idx)
    assert live.where("doc_id = 0").count() == 0
    assert not os.path.exists(f"{idx}/_tombstones")
    # tombstones folded: next batch still equals the survivor probe
    # (ids 0's rows now physically absent, 10's batch present)
    b2 = spark.createDataFrame([(20, base + " tail words")],
                               "doc_id long, text string")
    incremental_dedup_batch(b2, 2, "text", "doc_id",
                            index_path=idx, pairs_path=pairs,
                            threshold=0.5)
    got2 = {(r.new_id, r.corpus_id) for r in
            spark.read.parquet(pairs).where("_batch_id = 2").collect()}
    assert got2 and all(c != 0 for _, c in got2)
    spark.catalog.clearCache()


def test_ivf_delete_probe_compact_and_live_advisory(spark, tmp_path):
    """IVF: read_ivf_index anti-joins tombstones (probe == probe over
    an index rebuilt from survivors), the drift advisory counts the
    LIVE corpus, compaction rewrites only tombstoned cells and equals
    the rebuild."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        ivf_index, ivf_probe, kmeans_pivots,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        ivf_append_batch, ivf_compact_deletes, ivf_delete_batch,
        read_ivf_index,
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    piv = kmeans_pivots(emb, "vec_id", "embedding", nlist=8)
    idx = str(tmp_path / "ivf")
    for k in range(3):
        ivf_append_batch(emb.where(f"vec_id % 3 = {k}"), k, "vec_id",
                         "embedding", pivots=piv, index_path=idx)

    deleted = emb.where("vec_id % 5 = 0")
    ivf_delete_batch(deleted, 0, "vec_id", "embedding", pivots=piv,
                     index_path=idx)
    live = emb.where("vec_id % 5 != 0")

    queries = emb.where("vec_id in (1, 2, 3)")
    got = _rows(ivf_probe(read_ivf_index(spark, idx), queries,
                          "vec_id", "embedding", piv, k=5, nprobe=3))
    want = _rows(ivf_probe(ivf_index(live, "vec_id", "embedding", piv),
                           queries, "vec_id", "embedding", piv,
                           k=5, nprobe=3))
    assert got == want and len(got) > 0
    deleted_ids = {r.vec_id for r in deleted.select("vec_id").collect()}
    assert not ({r[1] for r in got} & deleted_ids)

    # advisory over a follow-up append counts live rows, not history
    extra = emb.where("vec_id in (1, 2)").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    stats = ivf_append_batch(extra, 3, "vec_id", "embedding",
                             pivots=piv, index_path=idx)
    assert stats["total"] == live.count() + 2

    res = ivf_compact_deletes(spark, idx)
    assert res["cells_rewritten"] >= 1
    assert not os.path.exists(f"{idx}/_tombstones")
    compacted = _rows(read_ivf_index(spark, idx, apply_tombstones=False)
                      .where("vec_id < 10000").select("vec_id", "cell"))
    rebuilt = _rows(ivf_index(live, "vec_id", "embedding", piv)
                    .select("vec_id", "cell"))
    assert compacted == rebuilt
    assert ivf_compact_deletes(spark, idx) == {
        "cells_rewritten": 0, "partitions_emptied": 0}


def test_embedding_loop_excludes_deleted_and_compacts(spark, tmp_path):
    """The cosine-space ingest loop: tombstones shadow both the band
    index and the vector corpus store; compaction folds both in one
    pass (tombstones clear last, so a crash between them re-runs)."""
    import numpy as np

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        embedding_dedup_batch, index_compact_deletes, index_delete_batch,
    )
    rng = np.random.default_rng(7)
    base = rng.normal(size=16)

    def vec(eps):
        v = base + eps * rng.normal(size=16)
        return (v / np.linalg.norm(v)).tolist()

    b0 = spark.createDataFrame(
        [(0, vec(0.001)), (1, vec(0.002)),
         (2, (rng.normal(size=16) / 4).tolist())],
        "vec_id long, embedding array<double>")
    idx, corp, pairs = (str(tmp_path / p)
                        for p in ("idx", "corp", "pairs"))
    kw = dict(index_path=idx, corpus_path=corp, pairs_path=pairs,
              threshold=0.99, bands=8, rows_per_band=4, dim=16)
    embedding_dedup_batch(b0, 0, "vec_id", "embedding", **kw)

    index_delete_batch(spark.createDataFrame([(0,)], "vec_id long"),
                       0, "vec_id", index_path=idx)
    b1 = spark.createDataFrame([(10, vec(0.0015))],
                               "vec_id long, embedding array<double>")
    embedding_dedup_batch(b1, 1, "vec_id", "embedding", **kw)
    got = {(r.new_id, r.corpus_id) for r in
           spark.read.parquet(pairs).where("_batch_id = 1").collect()}
    assert (10, 1) in got and all(c != 0 for _, c in got)

    index_compact_deletes(spark, idx, "vec_id", also_paths=(corp,))
    assert spark.read.parquet(idx).where("vec_id = 0").count() == 0
    assert spark.read.parquet(corp).where("vec_id = 0").count() == 0
    assert not os.path.exists(f"{idx}/_tombstones")
    spark.catalog.clearCache()
