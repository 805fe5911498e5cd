"""Incremental dedup at scale, end-to-end in the production shape
(VERDICT r4 #6): ``minhash_index`` → ``write_bucketed`` → reload →
``minhash_match_pairs`` over sequential batches, with the bucketed
index APPENDED each round — asserting the per-batch cost claim in
dedup.py (each arriving batch pays its own signatures + one co-located
bucket join, no corpus re-mining) on recorded wall times.

Set SPARK_GRAFT_SKIP_SLOW=1 to skip (the loop runs ~10 Spark jobs).
"""

from __future__ import annotations

import os
import statistics
import time

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    minhash_index, minhash_match_pairs,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    write_bucketed,
)

BATCH = 1500
N_BATCHES = 10
DUP_EVERY = 10                      # every 10th doc of a batch is a dup
SLICE = BATCH // DUP_EVERY          # 150 dups per batch


def _batch_docs(spark, k: int):
    """Batch k of synthetic docs. Batch 0 is the corpus: doc ``local``
    has template id ``local``. Later batches: every ``DUP_EVERY``-th
    doc exactly copies a batch-0 doc from a slice DISJOINT per batch
    (batch k targets templates [k*SLICE, (k+1)*SLICE)), all other docs
    are globally unique — so every probe batch yields exactly SLICE
    match pairs regardless of how large the index has grown, making
    per-batch wall time comparable across the run."""
    local = F.col("id")
    gid = local + F.lit(k * BATCH)
    if k == 0:
        tid = local
    else:
        tid = F.when(local % DUP_EVERY == 0,
                     F.lit(k * SLICE) + (local / DUP_EVERY).cast("long")) \
               .otherwise(F.lit(1_000_000) + gid)
    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(25)),
        lambda j: F.concat(F.lit("w"),
                           # prime > any tid, so tid -> token set is
                           # injective (1e6+6 would alias unique docs
                           # back onto corpus templates mod p)
                           F.pmod((tid + 1) * j, F.lit(10_000_019)))))
    return spark.range(BATCH).select(gid.alias("doc_id"),
                                     text.alias("text"))


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
                    reason="slow scale test disabled")
def test_incremental_dedup_per_batch_cost_stays_flat(spark):
    table = "t_mh_scale_index"
    spark.sql(f"drop table if exists {table}")
    try:
        write_bucketed(minhash_index(_batch_docs(spark, 0), "text", "doc_id"),
                       table, ["band", "bh"], 8)
        times, pair_counts = [], []
        for k in range(1, N_BATCHES):
            batch = _batch_docs(spark, k)
            t0 = time.monotonic()
            pairs = minhash_match_pairs(batch, spark.table(table),
                                        "text", "doc_id", threshold=0.8)
            pair_counts.append(pairs.count())
            # production shape: the batch then joins the corpus index
            write_bucketed(minhash_index(batch, "text", "doc_id"),
                           table, ["band", "bh"], 8, mode="append")
            times.append(time.monotonic() - t0)

        # correctness: each batch's dups hit exactly its disjoint
        # batch-0 slice, no matter how big the index has grown
        assert pair_counts == [SLICE] * (N_BATCHES - 1)

        # the cost claim: probing+appending batch 9 against a 9x index
        # costs about what batch 2 cost against a 2x index. Box noise
        # is +-30% per run; 3x headroom separates "flat" from the ~10x
        # growth a re-mine-the-corpus implementation would show.
        early = statistics.median(times[1:4])   # skip warm-up batch 1
        late = statistics.median(times[-3:])
        assert late <= early * 3, (
            f"per-batch cost grew with index size: early={early:.2f}s "
            f"late={late:.2f}s times={['%.2f' % t for t in times]}")
    finally:
        spark.sql(f"drop table if exists {table}")


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
                    reason="slow scale test disabled")
def test_cascade_update_per_batch_cost_stays_flat(spark, tmp_path):
    """Continuous-aggregate maintenance at scale: fold 10 sequential
    raw batches into persisted tiers (cascade_update → overwrite tiers
    parquet → reload), with each batch covering a NEW time range so
    history (and the tiers table) grows linearly — asserting the
    per-batch cost claim in timeseries.py (only the batch's partials
    plus tier rows shuffle, never historical raw data) on recorded
    wall times, and exact equality with a full rebuild at the end."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        cascade_update, downsample_cascade,
    )

    res = [10.0, 100.0, 1000.0]
    n_rows, span = 50_000, 10_000.0

    def batch(k):
        # integer-valued doubles -> exactly associative sums
        return spark.range(n_rows).select(
            (F.col("id") % 20).alias("k"),
            (F.lit(k * span) + (F.col("id") % 10_000).cast("double"))
            .alias("t"),
            ((F.col("id") * 7) % 100).cast("double").alias("v"))

    tiers_path = str(tmp_path / "tiers")
    downsample_cascade(batch(0), ["k"], "t", "v", res) \
        .write.mode("overwrite").parquet(tiers_path)
    spark.catalog.clearCache()
    times = []
    for kb in range(1, 10):
        t0 = time.monotonic()
        tiers = spark.read.parquet(tiers_path)
        out = cascade_update(tiers, batch(kb), ["k"], "t", "v", res)
        out.write.mode("overwrite").parquet(str(tmp_path / "next"))
        times.append(time.monotonic() - t0)
        spark.catalog.clearCache()
        # swap: next becomes current
        import shutil
        shutil.rmtree(tiers_path)
        shutil.move(str(tmp_path / "next"), tiers_path)

    early = statistics.median(times[1:4])
    late = statistics.median(times[-3:])
    assert late <= early * 3, (
        f"per-batch cost grew with history: early={early:.2f}s "
        f"late={late:.2f}s times={['%.2f' % t for t in times]}")

    # exactness after 10 folds: equals one cascade over all raw rows
    import functools
    all_raw = functools.reduce(lambda a, b: a.unionByName(b),
                               [batch(k) for k in range(10)])
    want = {(r.k, r.resolution, r.bucket): (r.n, r.sum, r.min, r.max)
            for r in downsample_cascade(all_raw, ["k"], "t", "v",
                                        res).collect()}
    got = {(r.k, r.resolution, r.bucket): (r.n, r.sum, r.min, r.max)
           for r in spark.read.parquet(tiers_path).collect()}
    assert got == want
    spark.catalog.clearCache()


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
                    reason="slow scale test disabled")
def test_ivf_append_per_batch_cost_stays_flat(spark, tmp_path):
    """IVF index maintenance at scale: appending batch 9 to a 9x index
    costs about what batch 2 cost — each append pays its own cell
    assignment plus an aggregate over the tiny per-batch cell-stats
    table, never a re-scan of the accumulated index (mirrors the
    incremental-dedup proof)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import kmeans_pivots
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        ivf_append_batch, read_ivf_index,
    )

    n, dim = 3000, 16

    def vec_batch(k):
        base = (F.col("id") % 8).cast("double")
        return spark.range(n).select(
            (F.col("id") + F.lit(k * n)).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: base * (d + 1) / F.lit(float(dim))
                + F.pmod(F.col("id") * (d + 3), F.lit(97)) / 970.0
            ).alias("embedding"))

    piv = kmeans_pivots(vec_batch(0), "vec_id", "embedding", nlist=8,
                        iters=5)
    idx_path = str(tmp_path / "ivf")
    times = []
    for k in range(10):
        t0 = time.monotonic()
        stats = ivf_append_batch(vec_batch(k), k, "vec_id", "embedding",
                                 pivots=piv, index_path=idx_path)
        times.append(time.monotonic() - t0)
        spark.catalog.clearCache()
    assert stats["total"] == 10 * n

    early = statistics.median(times[1:4])
    late = statistics.median(times[-3:])
    assert late <= early * 3, (
        f"per-batch append cost grew with index size: early={early:.2f}s "
        f"late={late:.2f}s times={['%.2f' % t for t in times]}")
    assert read_ivf_index(spark, idx_path).count() == 10 * n


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
                    reason="slow scale test disabled")
def test_edit_distance_pairs_scales_with_matches_not_pairs(spark):
    """Fuzzy-join blocking at 10x: candidate volume (and wall time)
    tracks the true-match count, not n^2. A 20k-string corpus with
    ~2k planted near-misses resolves in seconds; the all-pairs space
    would be 2x10^8 levenshtein calls."""
    n = 10_000
    # discriminating characters FIRST (the documented usage stance:
    # a corpus-wide template prefix concentrates the candidate join on
    # the template grams — strip it or lead with the varying part)
    base = spark.range(n).select(
        F.col("id"),
        F.concat(F.col("id").cast("string"),
                 F.lit(" record identifier alpha")).alias("s"))
    # plant one near-miss per 10 originals: drop the last character
    mut = (base.where(F.col("id") % 10 == 0)
           .select((F.col("id") + n).alias("id"),
                   F.expr("substring(s, 1, length(s) - 1)").alias("s")))
    corpus = base.unionByName(mut)
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import edit_distance_pairs

    t0 = time.time()
    pairs = edit_distance_pairs(corpus, "s", "id", max_dist=1, q=3)
    out = pairs.collect()
    wall = time.time() - t0
    # every planted mutant pairs with its source at distance 1 ...
    planted = {(i, i + n) for i in range(0, n, 10)}
    got = {(r.id_a, r.id_b) for r in out}
    assert planted <= got
    # ... plus the id-suffix near-misses the corpus genuinely contains
    # (e.g. "...1" vs "...11" is one insertion); everything verified
    for r in out:
        assert r.distance <= 1
    assert wall < 120, f"fuzzy blocking took {wall:.0f}s at 20k strings"


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
                    reason="slow scale test disabled")
def test_duplicate_passages_cost_tracks_duplication_volume(spark):
    """Passage mining over 20k docs with a planted boilerplate block in
    5% of them: output is exactly the planted pair structure's spans,
    and wall time stays in seconds because the shingle join's fan-out
    is the true duplication volume, not corpus^2."""
    n = 20_000
    base = spark.range(n).select(
        F.col("id"),
        F.concat(
            F.lit("document body segment "), F.col("id").cast("string"),
            F.lit(" carries unique filler content portion "),
            (F.col("id") * 7 % 997).cast("string"),
            F.when(F.col("id") % 20 == 0,
                   F.lit(" standard legal boilerplate notice all rights "
                         "reserved redistribution prohibited without "
                         "written permission of the publisher"))
            .otherwise(F.lit(""))).alias("text"))
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import duplicate_passages

    t0 = time.time()
    spans = duplicate_passages(base, "text", "id",
                               shingle_n=8, min_run=3)
    n_spans = spans.count()
    wall = time.time() - t0
    # 1000 docs share the 16-token block -> C(1000,2) pair spans
    assert n_spans == 1000 * 999 // 2
    one = spans.first()
    assert one.n_tokens >= 10
    assert wall < 120, f"passage mining took {wall:.0f}s at 20k docs"


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
                    reason="slow scale test disabled")
def test_bm25_append_per_batch_cost_stays_flat(spark, tmp_path):
    """Inverted-index maintenance at scale: appending doc batch 9 to a
    9x index costs about what batch 2 cost — every probe relation is
    additive, so an append touches only its own batch's rows (mirrors
    the incremental-dedup and IVF proofs). A final probe over the full
    accumulated index returns exactly k rows."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import bm25_probe
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        bm25_index_batch, read_bm25_index,
    )

    n = 2000
    words = ["spark", "window", "merge", "table", "scan", "query",
             "batch", "row", "agg", "join", "filter", "sort"]

    def doc_batch(k):
        body = F.concat_ws(" ", *[
            F.element_at(F.array(*[F.lit(w) for w in words]),
                         (F.pmod(F.col("id") * (j + 3) + j, F.lit(12))
                          + 1).cast("int"))
            for j in range(30)])
        return spark.range(n).select(
            (F.col("id") + F.lit(k * n)).alias("doc_id"),
            body.alias("text"))

    idx = str(tmp_path / "bm25")
    times = []
    for k in range(10):
        t0 = time.monotonic()
        bm25_index_batch(doc_batch(k), k, "doc_id", "text",
                         index_path=idx, buckets=16)
        times.append(time.monotonic() - t0)
        spark.catalog.clearCache()

    early = statistics.median(times[1:4])
    late = statistics.median(times[-3:])
    assert late <= early * 3, (
        f"per-batch append cost grew with index size: early={early:.2f}s "
        f"late={late:.2f}s times={['%.2f' % t for t in times]}")
    hits = bm25_probe(*read_bm25_index(spark, idx),
                      ["spark", "merge"], k=25, buckets=16)
    assert hits.count() == 25


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
                    reason="slow scale test disabled")
def test_index_build_cost_linearish_at_10x(spark):
    """One-shot 10x build smoke (r7, VERDICT #8): inverted_index over
    5k vs 50k docs and kmeans_pivots over 5k vs 50k vectors. Wall
    grows ~linearly with input (bounded at 30x for the 10x input —
    generous for fixed overheads; a quadratic shape would be ~100x),
    and the shuffle volume driver is pinned structurally: postings
    rows = exploded tokens (10x input → 10x rows, counted), while
    k-means driver/shuffle state stays MODEL-sized (nlist x dim
    partials per iteration) regardless of corpus size — the recorded
    walls are the evidence the 10^8-doc build extrapolation rests on."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import inverted_index, kmeans_pivots

    words = ["spark", "window", "merge", "table", "scan", "query",
             "batch", "row", "agg", "join", "filter", "sort"]

    def docs(n):
        body = F.concat_ws(" ", *[
            F.element_at(F.array(*[F.lit(w) for w in words]),
                         (F.pmod(F.col("id") * (j + 3) + j, F.lit(12))
                          + 1).cast("int"))
            for j in range(30)])
        return spark.range(n).select(F.col("id").alias("doc_id"),
                                     body.alias("text"))

    def vecs(n, dim=32):
        v = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (F.pmod(F.col("id") * j * 2654435761
                              + j * 40503, F.lit(104729))
                       / 104729.0 - 0.5))
        return spark.range(n).select(F.col("id").alias("vec_id"),
                                     v.alias("embedding"))

    walls, rows = {}, {}
    for n in (5_000, 50_000):
        t0 = time.monotonic()
        rows[n] = inverted_index(docs(n), "doc_id", "text",
                                 buckets=64).count()
        walls[f"inv_{n}"] = time.monotonic() - t0
        t0 = time.monotonic()
        piv = kmeans_pivots(vecs(n), "vec_id", "embedding", nlist=16)
        assert piv.count() == 16
        walls[f"kmeans_{n}"] = time.monotonic() - t0

    # postings volume (the shuffle driver) is ~10x, never superlinear
    assert rows[50_000] <= rows[5_000] * 11
    assert rows[50_000] >= rows[5_000] * 9
    for op in ("inv", "kmeans"):
        small, big = walls[f"{op}_5000"], walls[f"{op}_50000"]
        assert big <= max(small * 30, small + 30), (
            f"{op} build not linear-ish at 10x: {walls}")
    assert walls[f"inv_50000"] < 120 and walls[f"kmeans_50000"] < 180, (
        f"10x build absolute budget blown: {walls}")


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
                    reason="slow scale test disabled")
def test_r8_ops_build_cost_linearish_at_10x(spark):
    """10x build smoke for the r8 surface: BPE count_of (Arrow UDF,
    memoized) and pq_encode over 5k vs 50k inputs grow ~linearly
    (bounded at 30x / absolute budget), and the PQ index's byte
    driver is structural: codes rows == corpus rows (counted), m
    smallints per row regardless of dim — the evidence the 10^9-row
    encode extrapolation rests on."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import pq_codebooks, pq_encode
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import make_subword_tokenizer

    words = ["spark", "window", "merge", "table", "scan", "query",
             "batch", "row", "agg", "join", "filter", "sort"]

    def docs(n):
        body = F.concat_ws(" ", *[
            F.element_at(F.array(*[F.lit(w) for w in words]),
                         (F.pmod(F.col("id") * (j + 3) + j, F.lit(12))
                          + 1).cast("int"))
            for j in range(30)])
        return spark.range(n).select(F.col("id").alias("doc_id"),
                                     body.alias("text"))

    def vecs(n, dim=32):
        v = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (F.pmod(F.col("id") * j * 2654435761
                              + j * 40503, F.lit(104729))
                       / 104729.0 - 0.5))
        return spark.range(n).select(F.col("id").alias("vec_id"),
                                     v.alias("embedding"))

    import string as _string
    tok = make_subword_tokenizer(sorted(set(
        list(_string.ascii_lowercase) + ["th", "er", "in", "ta",
                                         "spark", "window"])))
    cb = pq_codebooks(vecs(5_000), "vec_id", "embedding", m=8,
                      ksub=16, iters=2)

    walls, rows = {}, {}
    for n in (5_000, 50_000):
        t0 = time.monotonic()
        s = docs(n).select(tok.count_of("text").alias("n")) \
            .agg(F.sum("n")).collect()[0][0]
        assert s > 0
        walls[f"bpe_{n}"] = time.monotonic() - t0
        t0 = time.monotonic()
        rows[n] = pq_encode(vecs(n), "vec_id", "embedding", cb).count()
        walls[f"pq_{n}"] = time.monotonic() - t0

    assert rows[5_000] == 5_000 and rows[50_000] == 50_000
    for op in ("bpe", "pq"):
        small, big = walls[f"{op}_5000"], walls[f"{op}_50000"]
        assert big <= max(small * 30, small + 30), (
            f"{op} not linear-ish at 10x: {walls}")
    assert walls["bpe_50000"] < 120 and walls["pq_50000"] < 120, (
        f"10x budget blown: {walls}")


def test_aggregate_sync_per_step_cost_stays_flat(spark, tmp_path):
    """IVM at scale: syncing the aggregate view after the 9th append
    costs about what the 2nd cost, although the base table is ~9x
    larger — a re-aggregating implementation would grow ~linearly.
    (The absolute proof that the base is never re-read is the
    destructive test in test_materialized_aggregates; this pins the
    end-to-end step cost.)"""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        snapshot_append, snapshot_write,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        aggregate_sync_snapshot,
    )
    tbl, vw = str(tmp_path / "t"), str(tmp_path / "v")
    meas = {"n": ("count", None), "s": ("sum", "v"),
            "a": ("avg", "v")}

    def batch(k):
        return spark.range(k * 5000, (k + 1) * 5000).selectExpr(
            "id", "cast(id % 97 as string) as g",
            "cast(id % 13 as double) as v")

    snapshot_write(spark, tbl, batch(0), partition_cols=[])
    aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                            measures=meas)
    times = []
    for k in range(1, 10):
        snapshot_append(spark, tbl, batch(k))
        t0 = time.monotonic()
        aggregate_sync_snapshot(spark, tbl, vw, group_by=["g"],
                                measures=meas)
        times.append(time.monotonic() - t0)
    early = statistics.median(times[1:4])
    late = statistics.median(times[-3:])
    assert late <= early * 3, (
        f"per-step sync cost grew with table size: early={early:.2f}s "
        f"late={late:.2f}s times={['%.2f' % t for t in times]}")
