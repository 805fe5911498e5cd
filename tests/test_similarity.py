"""Similarity search: brute-force exactness vs a NumPy reference on the
real embeddings table; LSH recall sanity vs brute force."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    brute_force_topk, embedding_dup_pairs, ivf_topk, lsh_topk,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_brute_force_matches_numpy(emb):
    queries = emb.where("vec_id < 3")
    got = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    rows = got.collect()

    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in range(3):
        sims = normed @ normed[qid]
        order = sorted((round(-s, 6), i) for i, s in zip(ids, sims) if i != qid)
        expect = [(i, -s) for s, i in order[:5]]
        mine = [(r.neighbor_id, r.cosine) for r in
                sorted(rows, key=lambda r: r.rank) if r.query_id == qid]
        assert [m[0] for m in mine] == [e[0] for e in expect]
        for m, e in zip(mine, expect):
            assert abs(m[1] - e[1]) < 1e-5


def test_topk_shape(emb):
    got = brute_force_topk(emb, emb.where("vec_id < 2"), "vec_id",
                           "embedding", k=7)
    counts = {r.query_id: r.cnt for r in
              got.groupBy("query_id").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {0: 7, 1: 7}


def test_lsh_recall_reasonable(emb):
    queries = emb.where("vec_id < 5")
    bf = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    ann = lsh_topk(emb, queries, "vec_id", "embedding", k=5, planes=2, dim=64)
    bf_set = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    ann_set = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    # every ANN hit ranks by true cosine; recall>0 and each query returns rows
    assert len(ann_set & bf_set) / len(bf_set) > 0.2
    assert {q for q, _ in ann_set} == {0, 1, 2, 3, 4}


def test_ivf_recall_reasonable(emb):
    queries = emb.where("vec_id < 5")
    bf = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    ivf = ivf_topk(emb, queries, "vec_id", "embedding", k=5,
                   nlist=8, nprobe=3)
    bf_set = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    ivf_set = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    # every IVF hit ranks by true cosine; probing 3/8 cells must keep
    # nonzero recall and every query must return rows
    assert len(ivf_set & bf_set) / len(bf_set) > 0.2
    assert {q for q, _ in ivf_set} == {0, 1, 2, 3, 4}


def test_embedding_dup_pairs_symmetric_threshold(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 1e-4]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [(r.id_a, r.id_b) for r in
           embedding_dup_pairs(df, "vec_id", "embedding", 0.99).collect()]
    assert got == [(0, 1)]
    exact = [(r.id_a, r.id_b) for r in
             embedding_dup_pairs(df, "vec_id", "embedding", 0.99,
                                 exact=True).collect()]
    assert exact == [(0, 1)]


def test_embedding_dup_pairs_bucketed_subset_of_exact(spark):
    """The banded-LSH default must return a subset of the exact answer
    with identical cosines, keep useful recall at the demo τ, and its
    plan must contain no unbucketed (cartesian / nested-loop) self-join."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r.id_a, r.id_b): r.cosine for r in
             embedding_dup_pairs(emb, "vec_id", "embedding", 0.4,
                                 exact=True).collect()}
    banded_df = embedding_dup_pairs(emb, "vec_id", "embedding", 0.4,
                                    bands=4, rows_per_band=4)
    banded = {(r.id_a, r.id_b): r.cosine for r in banded_df.collect()}
    assert set(banded) <= set(exact)
    assert all(banded[k] == exact[k] for k in banded)
    assert len(banded) >= max(1, len(exact) // 3)

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    plan = formatted_plan(banded_df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_matches_from_scratch_operator(spark, emb, tmp_path):
    """Probing a persisted cell-partitioned index returns EXACTLY the
    rows ivf_topk computes from scratch with the same pivots/nprobe —
    the index is a layout change, not a semantics change."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        ivf_index, ivf_pivots, ivf_probe,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        write_partitioned,
    )
    queries = emb.where("vec_id < 5")
    # trained pivots are the production codebook; equivalence must hold
    # for whatever frame is passed, so pin the SAME pivots on both sides
    piv = ivf_pivots(emb, "vec_id", "embedding", nlist=16)
    idx_path = str(tmp_path / "ivf")
    write_partitioned(ivf_index(emb, "vec_id", "embedding", piv),
                      idx_path, ["cell"], mode="overwrite")
    index = spark.read.parquet(idx_path)

    got = sorted((r.query_id, r.rank, r.neighbor_id, r.cosine) for r in
                 ivf_probe(index, queries, "vec_id", "embedding", piv,
                           k=5, nprobe=4).collect())
    want = sorted((r.query_id, r.rank, r.neighbor_id, r.cosine) for r in
                  ivf_topk(emb, queries, "vec_id", "embedding",
                           k=5, nlist=16, nprobe=4, pivots=piv).collect())
    assert got == want and len(got) == 25

    # the legacy first-ids rule stays the oracle-reproducible default
    # of ivf_topk when no pivots are passed
    fid = ivf_pivots(emb, "vec_id", "embedding", nlist=16,
                     method="first_ids")
    got2 = sorted((r.query_id, r.rank, r.neighbor_id, r.cosine) for r in
                  ivf_topk(emb, queries, "vec_id", "embedding",
                           k=5, nlist=16, nprobe=4, pivots=fid).collect())
    want2 = sorted((r.query_id, r.rank, r.neighbor_id, r.cosine) for r in
                   ivf_topk(emb, queries, "vec_id", "embedding",
                            k=5, nlist=16, nprobe=4).collect())
    assert got2 == want2


def test_kmeans_pivots_cell_balance_contract(spark):
    """The trained codebook's whole point: on an id-correlated corpus
    (embeddings drift with id, as crawl-time-ordered corpora do) the
    first-ids rule puts every pivot at the start of the drift and one
    cell swallows nearly the whole corpus — nprobe/nlist pruning
    silently stops pruning. kmeans pivots keep max-cell/mean-cell
    bounded on the same data."""
    import numpy as np

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        cell_balance, ivf_index, ivf_pivots, kmeans_pivots,
    )

    rng = np.random.default_rng(7)
    n, dim, nlist = 800, 16, 8
    # embeddings drift along a line as id grows + small isotropic noise
    base = np.zeros((n, dim))
    base[:, 0] = np.linspace(0.0, 10.0, n)
    vecs = base + rng.normal(0.0, 0.05, size=(n, dim))
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>")

    first = ivf_pivots(df, "vec_id", "embedding", nlist=nlist,
                       method="first_ids")
    bal_first = cell_balance(
        ivf_index(df, "vec_id", "embedding", first).groupBy("cell").count(),
        nlist)
    trained = kmeans_pivots(df, "vec_id", "embedding", nlist=nlist)
    bal_kmeans = cell_balance(
        ivf_index(df, "vec_id", "embedding", trained)
        .groupBy("cell").count(), nlist)

    # first-ids: all 8 pivots sit in the first ~1% of the drift, so the
    # last pivot's cell captures essentially everything downstream
    assert bal_first["imbalance"] > 4.0, bal_first
    # trained: farthest-point init + Lloyd spread the centroids along
    # the drift; every cell stays near the mean size
    assert bal_kmeans["imbalance"] <= 2.0, bal_kmeans
    assert bal_kmeans["nonempty"] == nlist
    assert bal_first["total"] == bal_kmeans["total"] == n


def test_ivf_recall_vs_nprobe_curve(spark, emb):
    """Pin the recall-vs-probe trade with trained pivots: candidates
    only grow with nprobe (exact ranking within them), so recall@k is
    monotone in nprobe and reaches 1.0 at nprobe=nlist (full probe ==
    brute force)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import kmeans_pivots

    nlist = 8
    piv = kmeans_pivots(emb, "vec_id", "embedding", nlist=nlist)
    queries = emb.where("vec_id < 10")
    bf = {(r.query_id, r.neighbor_id) for r in
          brute_force_topk(emb, queries, "vec_id", "embedding",
                           k=5).collect()}
    recall = {}
    for nprobe in (1, 2, 4, nlist):
        got = {(r.query_id, r.neighbor_id) for r in
               ivf_topk(emb, queries, "vec_id", "embedding", k=5,
                        nlist=nlist, nprobe=nprobe,
                        pivots=piv).collect()}
        recall[nprobe] = len(got & bf) / len(bf)
    assert recall[1] <= recall[2] <= recall[4] <= recall[nlist]
    assert recall[nlist] == 1.0
    assert recall[2] >= 0.3, recall


def test_ivf_probe_reads_only_probed_cells(spark, emb, tmp_path):
    """The probe's literal cell IN (...) predicate partition-prunes the
    index read: the scan materializes only the probed cells' rows, not
    the corpus — nprobe/nlist of the bytes at any scale."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        ivf_index, ivf_pivots, ivf_probe,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans import (
        scan_output_rows,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        write_partitioned,
    )
    piv = ivf_pivots(emb, "vec_id", "embedding", nlist=16)
    idx_path = str(tmp_path / "ivf")
    idx = ivf_index(emb, "vec_id", "embedding", piv)
    write_partitioned(idx, idx_path, ["cell"], mode="overwrite")
    index = spark.read.parquet(idx_path)

    # the probe pushes a literal cell IN (...) filter; measure exactly
    # that read shape in isolation (a plan with one leaf scan)
    probed = sorted({r["cell"] for r in
                     idx.where("vec_id < 2").select("cell").collect()})
    hit = index.where(F.col("cell").isin(probed))
    matched = hit.count()
    hit.collect()
    scanned = scan_output_rows(hit)
    total = emb.count()
    assert 0 < matched < total * 0.7
    assert scanned == matched, "cell predicate must prune partitions, " \
        "not filter post-scan"


def test_ivf_append_matches_full_rebuild_and_advises_repivot(
        spark, emb, tmp_path):
    """Incremental IVF maintenance: appended batches accumulate into
    exactly the index a full rebuild with the same pivots produces
    (assignment is per-row deterministic given frozen pivots), replay
    of a batch is idempotent, probes keep working over the appended
    layout, and the drift advisory fires when arriving data piles into
    one cell."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        ivf_index, ivf_probe, kmeans_pivots,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        ivf_append_batch, read_ivf_index,
    )

    piv = kmeans_pivots(emb, "vec_id", "embedding", nlist=8)
    batches = [emb.where(f"vec_id % 3 = {k}") for k in range(3)]
    idx_path = str(tmp_path / "ivf")
    stats = [ivf_append_batch(b, k, "vec_id", "embedding", pivots=piv,
                              index_path=idx_path)
             for k, b in enumerate(batches)]
    # in-distribution batches: no advisory
    assert not any(s["repivot_advised"] for s in stats)
    assert stats[-1]["total"] == emb.count()

    def snap(df):
        return sorted((r.vec_id, r.cell) for r in
                      df.select("vec_id", "cell").collect())

    accumulated = snap(read_ivf_index(spark, idx_path))
    rebuilt = snap(ivf_index(emb, "vec_id", "embedding", piv))
    assert accumulated == rebuilt

    # replaying batch 1 rewrites its own subpartitions — no duplicates
    ivf_append_batch(batches[1], 1, "vec_id", "embedding", pivots=piv,
                     index_path=idx_path)
    assert snap(read_ivf_index(spark, idx_path)) == rebuilt

    # probe over the appended layout == probe over a rebuilt index
    queries = emb.where("vec_id < 3")
    got = sorted(tuple(r) for r in
                 ivf_probe(read_ivf_index(spark, idx_path), queries,
                           "vec_id", "embedding", piv, k=5,
                           nprobe=3).collect())
    want = sorted(tuple(r) for r in
                  ivf_probe(ivf_index(emb, "vec_id", "embedding", piv),
                            queries, "vec_id", "embedding", piv, k=5,
                            nprobe=3).collect())
    assert got == want and len(got) > 0

    # a drifted batch (far outside every trained cell) swells one cell
    # past the threshold -> advisory fires
    import numpy as np
    far = spark.createDataFrame(
        [(10_000 + i, (np.full(64, 50.0) + i).tolist())
         for i in range(3 * emb.count())],
        "vec_id long, embedding array<double>")
    drifted = ivf_append_batch(far, 3, "vec_id", "embedding", pivots=piv,
                               index_path=idx_path)
    assert drifted["repivot_advised"], drifted


def test_embedding_incremental_matches_full_mining(spark, emb):
    """Cosine-space incremental dedup (embedding_index +
    embedding_match_pairs, the minhash_index twin): intra-batch pairs
    plus index-probe pairs reproduce EXACTLY the pair set
    embedding_dup_pairs mines over the whole corpus at the same banding
    and threshold."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        embedding_index, embedding_match_pairs,
    )
    kw = dict(bands=10, rows_per_band=5, dim=64)
    corpus = emb.where("vec_id % 2 = 0")
    batch = emb.where("vec_id % 2 = 1")
    index = embedding_index(corpus, "vec_id", "embedding", **kw)

    cross = embedding_match_pairs(batch, index, corpus, "vec_id",
                                  "embedding", threshold=0.4, **kw)
    intra = (embedding_dup_pairs(batch, "vec_id", "embedding",
                                 threshold=0.4, **kw)
             .select(F.col("id_b").alias("new_id"),
                     F.col("id_a").alias("corpus_id"), "cosine"))
    got = {(min(r.new_id, r.corpus_id), max(r.new_id, r.corpus_id),
            r.cosine)
           for r in cross.unionByName(intra).collect()}
    # corpus-internal pairs are deliberately NOT re-mined by the probe;
    # add them once (the already-indexed history) for the comparison
    hist = {(r.id_a, r.id_b, r.cosine)
            for r in embedding_dup_pairs(corpus, "vec_id", "embedding",
                                         threshold=0.4, **kw).collect()}
    want = {(r.id_a, r.id_b, r.cosine)
            for r in embedding_dup_pairs(emb, "vec_id", "embedding",
                                         threshold=0.4, **kw).collect()}
    assert got | hist == want
    assert got.isdisjoint(hist)
    assert got and hist            # both paths actually exercised
    spark.catalog.clearCache()


# --------------------------------------------------------------- PCA

def test_pca_matches_numpy_and_projects(spark):
    """Distributed moments == numpy moments; fitted components span the
    same top-k subspace; projection matches (X - mean) @ W.T."""
    import numpy as np

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        embedding_moments, fit_pca, project_embeddings,
    )

    rng = np.random.default_rng(3)
    # anisotropic: variance concentrated in 3 of 8 dims via a mixing matrix
    base = rng.normal(size=(500, 3)) @ rng.normal(size=(3, 8)) * 5
    x = base + rng.normal(scale=0.1, size=(500, 8)) + rng.normal(size=8)
    df = spark.createDataFrame(
        [(i, row.astype(np.float32).tolist()) for i, row in enumerate(x)],
        "id long, embedding array<float>")
    xf = x.astype(np.float32).astype(np.float64)  # storage-precision truth

    n, mean, cov = embedding_moments(df, "embedding")
    assert n == 500
    assert np.allclose(mean, xf.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(xf.T, bias=True), atol=1e-7)

    model = fit_pca(df, "embedding", 3)
    evals = np.linalg.eigvalsh(np.cov(xf.T, bias=True))[::-1][:3]
    assert np.allclose(model.explained_variance, evals, rtol=1e-6)

    out = project_embeddings(df, "embedding", model)
    got = {r.id: np.asarray(r.pca) for r in out.collect()}
    expect = (xf - xf.mean(axis=0)) @ model.components.T
    for i in range(500):
        assert np.allclose(got[i], expect[i], atol=1e-3)
    # projected variance per component ~= explained_variance
    proj = np.asarray([got[i] for i in range(500)])
    assert np.allclose(proj.var(axis=0), model.explained_variance,
                       rtol=1e-3)


def test_pca_whiten_and_partition_stability(spark):
    import numpy as np

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        embedding_moments, fit_pca, project_embeddings,
    )
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n1, m1, c1 = embedding_moments(emb, "embedding")
    n2, m2, c2 = embedding_moments(emb.repartition(17), "embedding")
    assert n1 == n2
    assert np.allclose(m1, m2, atol=1e-9) and np.allclose(c1, c2, atol=1e-9)

    model = fit_pca(emb, "embedding", 4, whiten=True)
    out = project_embeddings(emb, "embedding", model, out_col="w")
    proj = np.asarray([r.w for r in out.collect()])
    # whitened components have ~unit variance
    assert np.allclose(proj.var(axis=0), 1.0, rtol=5e-2)

    import pytest
    with pytest.raises(ValueError):
        fit_pca(emb, "embedding", 0)
    with pytest.raises(ValueError):
        fit_pca(emb, "embedding", 10_000)


def test_embedding_near_dedup_one_call(spark):
    """The cosine twin of near_dedup: exact-duplicate vectors collapse
    to one representative (smallest id, or best keep_by score)."""
    import numpy as np

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        cache_scope, embedding_near_dedup,
    )

    rng = np.random.default_rng(9)
    base = rng.normal(size=(5, 16)).astype(np.float32)
    rows = []
    # ids 0-4: distinct vectors; 10-12: copies of vector 0; 20: copy of 1
    for i in range(5):
        rows.append((i, base[i].tolist(), float(i)))
    for j, src in ((10, 0), (11, 0), (12, 0), (20, 1)):
        rows.append((j, base[src].tolist(), float(j)))
    df = spark.createDataFrame(rows, "vid long, v array<float>, q double")

    with cache_scope():
        kept = sorted(r.vid for r in
                      embedding_near_dedup(df, "vid", "v",
                                           threshold=0.999,
                                           dim=16).collect())
    assert kept == [0, 1, 2, 3, 4]

    with cache_scope():
        kept = sorted(r.vid for r in
                      embedding_near_dedup(df, "vid", "v",
                                           threshold=0.999, dim=16,
                                           keep_by="q").collect())
    # highest q in cluster {0,10,11,12} is 12; in {1,20} is 20
    assert kept == [2, 3, 4, 12, 20]


def test_ivf_repivot_retrains_and_reassigns(spark, tmp_path):
    """The drift advisory's explicit answer: repivot trains a fresh
    codebook on the accumulated index and reassigns every row —
    restoring cell balance a drifted ingest destroyed."""
    import numpy as np

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        cell_balance, ivf_repivot, kmeans_pivots,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import (
        ivf_append_batch, read_ivf_index,
    )

    rng = np.random.default_rng(3)
    dim, nlist = 16, 8

    def cloud(center, n, id0):
        pts = rng.normal(0, 0.05, (n, dim)) + center
        return spark.createDataFrame(
            [(id0 + i, pts[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>")

    base = cloud(np.zeros(dim), 400, 0)
    piv = kmeans_pivots(base, "vec_id", "embedding", nlist=nlist)
    idx_path = str(tmp_path / "ivf")
    ivf_append_batch(base, 0, "vec_id", "embedding", pivots=piv,
                     index_path=idx_path)
    # drifted batch far from every trained cell -> advisory fires
    far = cloud(np.full(dim, 30.0), 1200, 10_000)
    stats = ivf_append_batch(far, 1, "vec_id", "embedding", pivots=piv,
                             index_path=idx_path)
    assert stats["repivot_advised"]

    index = read_ivf_index(spark, idx_path)
    new_piv, new_index = ivf_repivot(index, "vec_id", "embedding",
                                     nlist=nlist)
    bal = cell_balance(new_index.groupBy("cell").count(), nlist)
    assert bal["imbalance"] <= 2.5, bal
    assert new_index.count() == 1600
    assert new_piv.count() == nlist


# -- SemDeDup semantic dedup (r7) ---------------------------------------------


def _np_semantic_pairs(ids, mat, pivots, threshold):
    """Reference: assign each vector to its nearest pivot (L2, lowest
    pivot id on ties), then all within-cell pairs with cosine >= tau."""
    d2 = ((mat[:, None, :] - pivots[None, :, :]) ** 2).sum(axis=2)
    cell = d2.argmin(axis=1)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cell[i] != cell[j]:
                continue
            c = round(float(normed[i] @ normed[j]), 6)
            if c >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, c))
    return out


def test_semantic_dup_pairs_matches_numpy_within_cells(spark, emb):
    """Pinned pivots => the operator's (pairs, cosines) equal the
    NumPy SemDeDup reference exactly: same cell assignment, same
    within-cell pair set, bit-equal rounded cosines."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import semantic_dup_pairs
    sub = emb.where("vec_id < 120")
    pivots = (sub.orderBy("vec_id").limit(8)
              .selectExpr("vec_id as _pid", "embedding"))
    got = {(r.id_a, r.id_b, r.cosine) for r in
           semantic_dup_pairs(sub, "vec_id", "embedding", 0.3,
                              pivots=pivots).collect()}

    pdf = sub.toPandas().sort_values("vec_id")
    mat = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    expect = _np_semantic_pairs(ids, mat, mat[:8], 0.3)
    assert got == expect and len(expect) > 0


def test_semantic_dedup_keeps_one_per_group(spark):
    """A planted near-identical group collapses to its smallest id
    (or highest keep_by); far vectors survive; nothing crosses cells.
    Uses trained k-means pivots - the production path."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import semantic_dedup
    rng = np.random.default_rng(7)
    base = rng.normal(size=(3, 16))
    rows = []
    # three well-separated centers; center 0 carries 4 near-copies
    for gid, n in [(0, 4), (1, 1), (2, 1)]:
        for k in range(n):
            v = base[gid] * 10 + rng.normal(scale=1e-3, size=16)
            rows.append((gid * 10 + k, v.tolist(), float(k)))
    df = spark.createDataFrame(rows,
                               "id long, vec array<double>, score double")
    kept = semantic_dedup(df, "id", "vec", 0.999, nlist=3, iters=5)
    assert {r.id for r in kept.select("id").collect()} == {0, 10, 20}
    kept2 = semantic_dedup(df, "id", "vec", 0.999, nlist=3, iters=5,
                           keep_by="score")
    assert {r.id for r in kept2.select("id").collect()} == {3, 10, 20}


def test_semantic_cell_drops_ledger(spark, emb):
    """max_cell valve accounting: exact n_dropped per truncated cell,
    empty frame when the valve never engages."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        semantic_cell_drops, semantic_cells,
    )
    sub = emb.where("vec_id < 60")
    pivots = (sub.orderBy("vec_id").limit(4)
              .selectExpr("vec_id as _pid", "embedding"))
    sizes = {r.cell: r.cnt for r in
             semantic_cells(sub, "vec_id", "embedding", pivots)
             .groupBy("cell").agg(F.count("*").alias("cnt")).collect()}
    cap = 5
    got = {r.cell: (r.n_members, r.n_dropped) for r in
           semantic_cell_drops(sub, "vec_id", "embedding", pivots,
                               max_cell=cap).collect()}
    expect = {c: (n, n - cap) for c, n in sizes.items() if n > cap}
    assert got == expect and len(expect) > 0
    assert semantic_cell_drops(sub, "vec_id", "embedding", pivots,
                               max_cell=10 ** 6).count() == 0


def test_semantic_dup_pairs_no_cartesian(spark, emb):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import semantic_dup_pairs
    sub = emb.where("vec_id < 50")
    pivots = (sub.orderBy("vec_id").limit(4)
              .selectExpr("vec_id as _pid", "embedding"))
    plan = (semantic_dup_pairs(sub, "vec_id", "embedding", 0.5,
                               pivots=pivots)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
