"""Similarity search over embedding columns (``array<float>``).

Beyond-reference surface (SURVEY §7.2 step 6). Two tiers:

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus scan; one shuffle for the per-query top-k
  window. The correctness baseline.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: corpus is hashed
  once (map-side), probes only matching buckets, so the scan per query
  is |corpus| / 2^planes on average. The 100 TB path; recall < 1 by
  design, tested against the brute-force baseline.
- :func:`embedding_dup_pairs` — cosine near-duplicate pairs, the
  embedding analogue of minhash dedup.

Hyperplanes are pseudo-random but deterministic: component d of plane p
is derived from the portable 60-bit hash of ``"p:d"`` mapped into
[-1, 1], so results are reproducible across engines and runs without a
stored model."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, norm
from ..functions.hashing import hash64


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 10,
                     query_id_col: str | None = None) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` is expected to be small (it is broadcast); ranking uses
    the 6-dp-rounded similarity with the corpus id as tiebreaker so the
    result is deterministic and oracle-comparable."""
    query_id_col = query_id_col or id_col
    # norms computed once per row, not once per pair; the per-pair
    # cosine is then dot/qn/cn — the identical double operations in the
    # identical order as cosine(), so results stay bit-exact
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qvec"),
                       norm(vec_col).alias("_qn"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cvec"),
                      norm(vec_col).alias("_cn"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(dot("_qvec", "_cvec") / F.col("_qn")
                              / F.col("_cn"), 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("bigint").alias("rank")))


def hyperplane_bucket(vec_col, planes: int, dim: int):
    """LSH bucket id: sign bits of projections onto ``planes``
    deterministic pseudo-random hyperplanes (column-expression form;
    :func:`_bucketize` is the codegen relational form of the same math)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    bucket = F.lit(0).cast("bigint")
    for p in range(planes):
        # component d of plane p in [-1, 1): hash("p:d") / 2^59 - 1
        comps = F.array(*[
            (hash64(F.lit(f"{p}:{d}")) / F.lit(float(1 << 59)) - 1.0)
            for d in range(dim)
        ])
        proj = F.aggregate(F.zip_with(v, comps, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _plane_component(p: int, d: int) -> float:
    """Python replica of :func:`hyperplane_bucket`'s component hash —
    identical to ``hash64(lit(f"{p}:{d}")) / 2^59 - 1`` (md5 first 15
    hex digits), pinned by the q_ann_lsh DuckDB oracle."""
    import hashlib
    h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
    return h / float(1 << 59) - 1.0


def _explode_vec(df: DataFrame, id_cols: list[str], vec_col: str,
                 x_name: str) -> DataFrame:
    return df.select(*id_cols,
                     F.posexplode(F.col(vec_col).cast("array<double>"))
                      .alias("_d", x_name))


def _bucketize(ev: DataFrame, id_cols: list[str], x_name: str,
               planes: int, dim: int, bucket_name: str,
               norm2_name: str) -> DataFrame:
    """Hyperplane buckets + squared norms from an exploded-vector frame,
    as one broadcast join + one aggregate — all whole-stage codegen.

    The higher-order-function formulation (``zip_with``+``aggregate``
    per plane) is CodegenFallback: interpreted row-at-a-time, ~2.5 ms
    per vector. Here the 64×planes plane matrix is a broadcast literal
    table joined on the component index, and the per-plane projections
    are conditional sums. Exploded element rows never leave their
    partition before partial aggregation, so each sum accumulates in
    ascending-d order — float-identical to the sequential expression
    (and to the DuckDB oracle's ``list_sum``)."""
    spark = ev.sparkSession
    pl = spark.createDataFrame(
        [(d, [_plane_component(p, d) for p in range(planes)])
         for d in range(dim)],
        "_d int, _comps array<double>")
    # SQL-string expressions — identical Catalyst nodes to the Column
    # form at ~1 py4j round-trip per expression instead of per operator
    # (r14; the plan-build cost was measured, see simhash)
    aggs = [F.expr(f"sum({x_name} * _comps[{p}])").alias(f"_proj{p}")
            for p in range(planes)]
    aggs.append(F.expr(f"sum({x_name} * {x_name})").alias(norm2_name))
    g = ev.join(F.broadcast(pl), "_d").groupBy(*id_cols).agg(*aggs)
    bucket = " + ".join(
        f"cast(if(_proj{p} >= 0, {1 << p}, 0) as bigint)"
        for p in range(planes))
    return g.select(*id_cols, F.expr(bucket).alias(bucket_name),
                    F.col(norm2_name))


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 10, planes: int = 4,
             dim: int = 64, query_id_col: str | None = None) -> DataFrame:
    """Approximate top-k: exact ranking *within* the query's hyperplane
    bucket. One map-side bucket expression over the corpus + a bucket
    equi-join replaces the all-pairs cross join — the candidate set per
    query is ~|corpus|/2^planes."""
    query_id_col = query_id_col or id_col
    # no persist: the exploded corpus is consumed twice (bucket pass and
    # scoring pass) but recomputing a posexplode off the scan is far
    # cheaper than materializing an InMemoryRelation (measured 4×
    # end-to-end); at 100 TB the double scan is the price of the
    # candidate-restricted scoring and columnar pruning keeps it narrow
    ce = _explode_vec(corpus, [F.col(id_col).alias("neighbor_id")],
                      vec_col, "_cx")
    qe = _explode_vec(queries, [F.col(query_id_col).alias("query_id")],
                      vec_col, "_qx")

    cb = _bucketize(ce, ["neighbor_id"], "_cx", planes, dim,
                    "bucket", "_cn2")
    qb = _bucketize(qe, ["query_id"], "_qx", planes, dim,
                    "bucket", "_qn2")

    # candidate pairs: bucket equi-join (queries are the small side —
    # both the candidate list and the query elements broadcast)
    cand = (cb.join(F.broadcast(qb), "bucket")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", "_qn2", "_cn2"))

    # dot products only for candidates: corpus element rows stay in
    # place, so each pair's products accumulate in d order — float-
    # identical to the sequential expression form
    dots = (ce.join(F.broadcast(cand.select("query_id", "neighbor_id")),
                    "neighbor_id")
            .join(F.broadcast(qe), ["query_id", "_d"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum(F.col("_cx") * F.col("_qx")).alias("_dot")))

    scored = (dots.join(F.broadcast(cand), ["query_id", "neighbor_id"])
              .select("query_id", "neighbor_id",
                      F.round(F.col("_dot") / F.sqrt("_qn2")
                              / F.sqrt("_cn2"), 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("bigint").alias("rank")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 10, nlist: int = 16, nprobe: int = 4,
             query_id_col: str | None = None,
             pivots: DataFrame | None = None) -> DataFrame:
    """IVF-flat approximate top-k: coarse quantization into ``nlist``
    cells, exact cosine ranking within the query's ``nprobe`` nearest
    cells.

    ``pivots`` supplies the coarse codebook (``(_pid, vec_col)`` — use
    :func:`kmeans_pivots` for a trained, cell-balanced one; that is the
    production path). When omitted, the codebook defaults to the
    ``nlist`` corpus vectors with the smallest ids — a deterministic
    data-sampled rule kept ONLY because it is reproducible in the
    DuckDB oracle (the q_ann_ivf gate rebuilds it in SQL); on real
    corpora whose ids correlate with crawl time/domain it clusters the
    pivots and skews the cells, so callers should pass trained pivots.
    Cells are assigned by squared-L2 argmin (ties → lowest
    pivot id), queries probe their ``nprobe`` nearest cells, and only
    cell-matched pairs are scored — candidate work is
    ~``nprobe/nlist`` of brute force, the classic IVF trade.

    All distance/score math runs on exploded elements through broadcast
    joins + aggregates (whole-stage codegen), accumulating in component
    order so results are float-identical to sequential expressions.
    Columns: (query_id, neighbor_id, cosine, rank)."""
    query_id_col = query_id_col or id_col
    pv = pivots if pivots is not None else (
        corpus.orderBy(F.col(id_col).asc()).limit(nlist)
        .select(F.col(id_col).alias("_pid"), F.col(vec_col)))
    pe = _explode_vec(pv, ["_pid"], vec_col, "_px")

    def cells(ev, idc, rank_n):
        # squared-L2 to every pivot; d-ordered sums (broadcast join keeps
        # the stream side in place)
        d2 = (ev.join(F.broadcast(pe), "_d")
              .groupBy(idc, "_pid")
              .agg(F.sum((F.col(ev.columns[-1]) - F.col("_px"))
                         * (F.col(ev.columns[-1]) - F.col("_px"))).alias("_d2")))
        w = Window.partitionBy(idc).orderBy(F.asc("_d2"), F.asc("_pid"))
        return (d2.withColumn("_cr", F.row_number().over(w))
                .where(F.col("_cr") <= rank_n)
                .select(idc, F.col("_pid").alias("_cell")))

    ce = _explode_vec(corpus, [F.col(id_col).alias("neighbor_id")],
                      vec_col, "_cx")
    qe = _explode_vec(queries, [F.col(query_id_col).alias("query_id")],
                      vec_col, "_qx")
    c_cell = cells(ce, "neighbor_id", 1)
    q_cells = cells(qe, "query_id", nprobe)

    cand = (c_cell.join(F.broadcast(q_cells), "_cell")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id").distinct())

    sums = (ce.join(F.broadcast(cand), "neighbor_id")
            .join(F.broadcast(qe), ["query_id", "_d"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum(F.col("_cx") * F.col("_qx")).alias("_dot"),
                 F.sum(F.col("_cx") * F.col("_cx")).alias("_cn2"),
                 F.sum(F.col("_qx") * F.col("_qx")).alias("_qn2")))
    scored = sums.select(
        "query_id", "neighbor_id",
        F.round(F.col("_dot") / F.sqrt("_qn2") / F.sqrt("_cn2"), 6)
         .alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("bigint").alias("rank")))


def ivf_pivots(corpus: DataFrame, id_col: str, vec_col: str,
               nlist: int = 16, *, method: str = "kmeans",
               iters: int = 10) -> DataFrame:
    """The coarse codebook, ``(_pid, vec_col)``; store it next to the
    index.

    ``method="kmeans"`` (default) trains it with distributed Lloyd's
    iterations (:func:`kmeans_pivots`) — the production rule, with a
    cell-balance contract tested on id-clustered corpora.
    ``method="first_ids"`` is the legacy smallest-ids rule, kept ONLY
    for oracle-reproducible tests (it is expressible in plain SQL);
    on corpora whose ids correlate with content it clusters the pivots
    and the nprobe/nlist pruning guarantee silently degrades."""
    if method == "kmeans":
        return kmeans_pivots(corpus, id_col, vec_col, nlist, iters=iters)
    if method == "first_ids":
        return (corpus.orderBy(F.col(id_col).asc()).limit(nlist)
                .select(F.col(id_col).alias("_pid"), F.col(vec_col)))
    raise ValueError(f"unknown pivot method {method!r}: "
                     f"expected 'kmeans' or 'first_ids'")


def kmeans_pivots(corpus: DataFrame, id_col: str, vec_col: str,
                  nlist: int = 16, *, iters: int = 10,
                  tol: float = 1e-6) -> DataFrame:
    """Trained IVF codebook: distributed Lloyd's k-means over the
    corpus, returning ``nlist`` centroids as ``(_pid, vec_col)`` —
    drop-in pivots for :func:`ivf_topk` / :func:`ivf_index` /
    :func:`ivf_probe`.

    Scale shape (the same Arrow-partials pattern as
    ``classifier.fit_logistic`` and ``embeddings.embedding_moments``):
    the MODEL (nlist x dim doubles) lives on the driver and ships to
    tasks in the closure; each Lloyd iteration is ONE distributed pass
    where every Arrow batch assigns its vectors to the nearest centroid
    with one numpy matmul and emits per-centroid (count, sum-vector)
    partials — driver state per iteration is O(arrow_batches x nlist),
    never the corpus. Iterations stop early when the largest centroid
    displacement falls under ``tol``.

    Determinism: initialization is k-means‖-style — oversample
    ``8 x nlist`` candidates by smallest ``xxhash64(id)`` (reproducible
    given the data yet UNCORRELATED with id order — the failure mode of
    the first-ids rule: on corpora where ids track crawl time/domain,
    consecutive ids are near-duplicates, the pivots cluster, and most
    of the corpus lands in one giant cell), then reduce to ``nlist``
    seeds with greedy farthest-point on the driver (O(oversample x
    nlist x dim), model-sized) so well-separated regions each get a
    seed even when a plain ``nlist``-sized hash sample would miss some
    (the coupon-collector gap). Empty cells keep their
    previous centroid. Float partials merge on the driver, so exact
    bit-patterns may vary with partitioning — callers pin results by
    passing the RETURNED pivots frame everywhere, not by re-training.

    Centroids are literal data (``createDataFrame``), so downstream
    cell assignment broadcasts them exactly like any other pivot frame.
    """
    if nlist < 1:
        raise ValueError(f"nlist must be >= 1, got {nlist}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    import numpy as np

    spark = corpus.sparkSession
    data = (corpus.select(F.col(vec_col).cast("array<double>").alias("x"))
            .where(F.col(vec_col).isNotNull())
            .persist())
    try:
        seed_rows = (corpus
                     .select(F.col(vec_col).cast("array<double>")
                             .alias("x"),
                             F.xxhash64(F.col(id_col).cast("string"))
                             .alias("_h"))
                     .where(F.col(vec_col).isNotNull())
                     .orderBy(F.asc("_h"))
                     .limit(8 * nlist).collect())
        if not seed_rows:
            raise ValueError("no rows with non-null vectors")
        cand = np.asarray([r["x"] for r in seed_rows], dtype=np.float64)
        # greedy farthest-point reduction: start from the smallest-hash
        # candidate, then repeatedly take the candidate farthest from
        # every chosen seed — covers separated regions deterministically
        chosen = [0]
        d_min = ((cand - cand[0]) ** 2).sum(axis=1)
        while len(chosen) < min(nlist, len(cand)):
            nxt = int(d_min.argmax())
            chosen.append(nxt)
            d_min = np.minimum(d_min, ((cand - cand[nxt]) ** 2).sum(axis=1))
        cent = cand[chosen]
        nlist = len(cent)              # corpus smaller than nlist: use all
        dim = cent.shape[1]

        for _ in range(iters):
            c_now = cent

            def partials(it):
                import pandas as pd
                for pdf in it:
                    x = np.asarray([np.asarray(v, dtype=np.float64)
                                    for v in pdf["x"]])
                    if len(x) == 0:
                        continue
                    # squared L2 via the expansion; argmin per row
                    d2 = ((x * x).sum(axis=1)[:, None]
                          - 2.0 * (x @ c_now.T)
                          + (c_now * c_now).sum(axis=1)[None, :])
                    a = d2.argmin(axis=1)
                    cnt = np.bincount(a, minlength=nlist)
                    sums = np.zeros((nlist, dim), dtype=np.float64)
                    np.add.at(sums, a, x)
                    yield pd.DataFrame({"cnt": [cnt.tolist()],
                                        "sums": [sums.ravel().tolist()]})

            rows = data.mapInPandas(
                partials, "cnt array<long>, sums array<double>").collect()
            cnt = np.zeros(nlist, dtype=np.int64)
            sums = np.zeros((nlist, dim), dtype=np.float64)
            for r in rows:
                cnt += np.asarray(r["cnt"], dtype=np.int64)
                sums += np.asarray(r["sums"],
                                   dtype=np.float64).reshape(nlist, dim)
            nz = cnt > 0
            new = cent.copy()
            new[nz] = sums[nz] / cnt[nz, None]
            shift = float(np.abs(new - cent).max())
            cent = new
            if shift < tol:
                break
    finally:
        data.unpersist()
    return spark.createDataFrame(
        [(int(i), cent[i].tolist()) for i in range(nlist)],
        f"_pid long, {vec_col} array<double>")


def cell_balance(cell_counts: DataFrame, nlist: int, *,
                 cell_col: str = "cell",
                 count_col: str = "count") -> dict:
    """Cell-size balance statistics from a ``(cell, count)`` frame —
    the IVF pruning-health metric: ``imbalance`` = max cell size over
    the mean size across ALL ``nlist`` cells (empty cells count as 0,
    so dead pivots RAISE the ratio). ``imbalance`` near 1 means
    ``nprobe/nlist`` candidate math translates into ``nprobe/nlist``
    bytes read; a large value means one giant cell is silently
    defeating the pruning (the first-ids-codebook failure mode).
    Collects at most ``nlist`` rows — driver-side model metadata."""
    if nlist < 1:
        raise ValueError(f"nlist must be >= 1, got {nlist}")
    sizes = [r[count_col] for r in
             cell_counts.select(cell_col, count_col).collect()]
    total = sum(sizes)
    mx = max(sizes) if sizes else 0
    mean = total / nlist
    return {"nlist": nlist, "nonempty": len([s for s in sizes if s > 0]),
            "total": total, "max": mx, "mean": mean,
            "imbalance": (mx / mean) if mean > 0 else float("inf")}


def _assign_cells(ev: DataFrame, idc: str, x_name: str,
                  pe: DataFrame, rank_n: int) -> DataFrame:
    """Nearest ``rank_n`` pivot cells per vector by squared L2
    (ties → lowest pivot id); broadcast pivot elements keep the
    vector elements in place (d-ordered sums, codegen)."""
    d2 = (ev.join(F.broadcast(pe), "_d")
          .groupBy(idc, "_pid")
          .agg(F.sum((F.col(x_name) - F.col("_px"))
                     * (F.col(x_name) - F.col("_px"))).alias("_d2")))
    w = Window.partitionBy(idc).orderBy(F.asc("_d2"), F.asc("_pid"))
    return (d2.withColumn("_cr", F.row_number().over(w))
            .where(F.col("_cr") <= rank_n)
            .select(idc, F.col("_pid").alias("cell")))


def ivf_index(corpus: DataFrame, id_col: str, vec_col: str,
              pivots: DataFrame) -> DataFrame:
    """Cell-assigned corpus — the persistable IVF index.

    Returns the corpus rows plus a ``cell`` column (nearest pivot by
    squared L2). The production shape mirrors
    :func:`~.dedup.minhash_index`: assign cells ONCE, write with
    ``sources.write_partitioned(index, path, ["cell"])``, and every
    later probe reads ONLY its probed cells' partitions from storage —
    hive partition pruning turns ``nprobe/nlist`` candidate math into
    ``nprobe/nlist`` *bytes read*, which at 100 TB is the entire point
    of IVF. Proven on scan metrics in
    tests/test_similarity.py::test_ivf_probe_reads_only_probed_cells.
    """
    ce = _explode_vec(corpus, [F.col(id_col).alias("_iid")], vec_col, "_cx")
    pe = _explode_vec(pivots, ["_pid"], vec_col, "_px")
    cells = _assign_cells(ce, "_iid", "_cx", pe, 1)
    return corpus.join(cells.withColumnRenamed("_iid", id_col), id_col)


def ivf_probe(index: DataFrame, queries: DataFrame, id_col: str,
              vec_col: str, pivots: DataFrame, k: int = 10,
              nprobe: int = 4,
              query_id_col: str | None = None) -> DataFrame:
    """Top-k over a prebuilt cell-assigned index (:func:`ivf_index`).

    The query batch's probed cell ids are collected to the driver
    (bounded by ``nprobe x |queries|`` ints — probe metadata, the same
    class as batch manifests) and pushed into the index read as a
    LITERAL ``cell IN (...)`` predicate, so a cell-partitioned index
    only lists/opens the probed partitions. Scoring then runs the
    identical exact-cosine element plan as :func:`ivf_topk`; with the
    same pivots and ``nprobe`` the results are row-identical to the
    from-scratch operator (equivalence test).
    """
    query_id_col = query_id_col or id_col
    pe = _explode_vec(pivots, ["_pid"], vec_col, "_px")
    qe = _explode_vec(queries, [F.col(query_id_col).alias("query_id")],
                      vec_col, "_qx")
    q_cells = _assign_cells(qe, "query_id", "_qx", pe, nprobe)

    probed = sorted({r["cell"] for r in
                     q_cells.select("cell").distinct().collect()})
    hit = index.where(F.col("cell").isin(probed))

    ce = _explode_vec(hit, [F.col(id_col).alias("neighbor_id"), "cell"],
                      vec_col, "_cx")
    cand = (ce.select("neighbor_id", "cell").distinct()
            .join(F.broadcast(q_cells), "cell")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id").distinct())

    sums = (ce.join(F.broadcast(cand), "neighbor_id")
            .join(F.broadcast(qe), ["query_id", "_d"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum(F.col("_cx") * F.col("_qx")).alias("_dot"),
                 F.sum(F.col("_cx") * F.col("_cx")).alias("_cn2"),
                 F.sum(F.col("_qx") * F.col("_qx")).alias("_qn2")))
    scored = sums.select(
        "query_id", "neighbor_id",
        F.round(F.col("_dot") / F.sqrt("_qn2") / F.sqrt("_cn2"), 6)
         .alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("bigint").alias("rank")))


def ivf_repivot(index: DataFrame, id_col: str, vec_col: str,
                nlist: int = 16, *, iters: int = 10) -> tuple[DataFrame,
                                                              DataFrame]:
    """The explicit answer to ``ivf_append_batch``'s drift advisory:
    train a FRESH codebook on the accumulated index's vectors
    (:func:`kmeans_pivots`) and reassign every row
    (:func:`ivf_index`). Returns ``(new_pivots, new_index)`` — the
    caller writes the new index (ideally as a snapshot commit /
    ``write_partitioned(..., ["cell"])``) and stores the pivots beside
    it. Deliberately a full-rewrite OPERATION, never a side effect of
    an append: reassigning history rewrites every cell partition, and
    that cost decision belongs to an operator reading the advisory,
    not to the ingest loop."""
    fresh = kmeans_pivots(index.select(id_col, vec_col), id_col, vec_col,
                          nlist, iters=iters)
    return fresh, ivf_index(index.drop("cell"), id_col, vec_col, fresh)


def _band_buckets(ev: DataFrame, id_name: str, x_name: str, bands: int,
                  rows_per_band: int, dim: int) -> DataFrame:
    """(id, band, bval) keys from sign bits of ``bands × rows_per_band``
    deterministic hyperplane projections — the minhash-banding analogue
    for cosine space. Projections are the same broadcast plane-matrix
    join + conditional sums as :func:`_bucketize` (whole-stage codegen,
    d-ordered accumulation ⇒ float-identical to the DuckDB oracle's
    ``list_sum``)."""
    planes = bands * rows_per_band
    spark = ev.sparkSession
    pl = spark.createDataFrame(
        [(d, [_plane_component(p, d) for p in range(planes)])
         for d in range(dim)],
        "_d int, _comps array<double>")
    # SQL-string expressions — same nodes, one parse round-trip (r14)
    aggs = [F.expr(f"sum({x_name} * _comps[{p}])").alias(f"_proj{p}")
            for p in range(planes)]
    g = ev.join(F.broadcast(pl), "_d").groupBy(id_name).agg(*aggs)
    band_structs = []
    for bnd in range(bands):
        val = " + ".join(
            f"if(_proj{bnd * rows_per_band + r} >= 0, {1 << r}, 0)"
            for r in range(rows_per_band))
        band_structs.append(
            f"named_struct('band', {bnd}, 'bval', cast({val} as bigint))")
    bk = f"explode(array({', '.join(band_structs)}))"
    return (g.select(id_name, F.expr(bk).alias("bk"))
            .select(id_name, F.col("bk.band").alias("band"),
                    F.col("bk.bval").alias("bval")))


def embedding_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.99, bands: int = 8,
                        rows_per_band: int = 8, dim: int = 64,
                        exact: bool = False,
                        max_bucket: int = 1000,
                        target_recall: float | None = None,
                        max_perm: int = 512) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ τ).

    Default path is banded hyperplane LSH candidates + exact cosine
    verify — never an all-pairs self-join. Each vector gets
    ``bands`` bucket keys (one per band of ``rows_per_band`` sign
    bits); a pair is a candidate iff some band's bits all agree, i.e.
    one equi-join on (band, bval) after an explode — identical
    machinery to :func:`lsh_topk`'s buckets, unioned across bands like
    minhash banding. With angle fraction a = arccos(τ)/π, recall at the
    threshold is 1-(1-(1-a)^r)^b (defaults: ~94% at τ=0.9) while a
    random pair is a candidate with p = 1-(1-2^-r)^b (~3%) — the
    shuffle carries ~p·n² pairs instead of n². ``exact=True`` is the
    all-candidates escape hatch (upper-triangle id pairs; only for
    oracle-exact runs at test scale).

    Scoring is bit-exact w.r.t. sequential (DuckDB ``list_sum``) math
    without broadcasting the corpus: candidate pairs join both full
    vectors (two shuffle joins), then ``explode(arrays_zip(va, vb))``
    emits each pair's components consecutively in ascending order
    inside ONE partition, so the partial aggregate produces exactly one
    d-ordered accumulator per pair — no cross-partition float merge.
    The per-pair ``zip_with/aggregate`` expression form would be
    CodegenFallback (interpreted, measured ~0.4 ms/pair at dim 64);
    this explode/agg plan is whole-stage codegen throughout.

    ``target_recall=0.95`` derives (bands, rows_per_band) from
    ``threshold`` via :func:`~..operators.dedup.banding_for_recall`
    (kind="cosine": one sign bit agrees with 1 − arccos(τ)/π),
    overriding the manual banding parameters — recall at the threshold
    becomes a contract instead of caller-side S-curve math."""
    if target_recall is not None and not exact:
        from .dedup import banding_for_recall
        bands, rows_per_band = banding_for_recall(threshold, target_recall,
                                                  kind="cosine",
                                                  max_perm=max_perm)
    vecs = df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    if exact:
        ids = vecs.select("_id")
        cand = (ids.select(F.col("_id").alias("id_a"))
                .crossJoin(ids.select(F.col("_id").alias("id_b")))
                .where(F.col("id_a") < F.col("id_b")))
    else:
        ev = _explode_vec(df, [F.col(id_col).alias("_id")], vec_col, "_x")
        bb = _band_buckets(ev, "_id", "_x", bands, rows_per_band, dim)
        # One pass over the bucket keys: group the members of each
        # (band, bval) bucket and emit in-bucket id pairs by double
        # explode. A bb⋈bb self-join yields the identical candidate set
        # but evaluates the projection aggregate TWICE (no exchange
        # reuse across the aliased sides — measured 2× the bucket-pass
        # cost at sf0.1); this shape shuffles bb once. Hot buckets
        # (degenerate/constant embeddings) are bounded to their first
        # ``max_bucket`` members by id — same skew valve + semantics as
        # dedup.minhash_lsh_pairs; the window and the groupBy hash-
        # partition on the same key so the cap adds no extra shuffle.
        w = Window.partitionBy("band", "bval").orderBy(F.asc("_id"))
        grp = (bb.withColumn("_bn", F.row_number().over(w))
               .where(F.col("_bn") <= max_bucket)
               .groupBy("band", "bval")
               .agg(F.collect_list("_id").alias("_ids"))
               .where(F.size("_ids") >= 2))
        cand = (grp.select(F.explode("_ids").alias("id_a"), "_ids")
                .select("id_a", F.explode("_ids").alias("id_b"))
                .where(F.col("id_a") < F.col("id_b"))
                .distinct())

    va = vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return _verified_cosine(cand, va, vb, "id_a", "id_b", threshold)


def _verified_cosine(cand: DataFrame, va: DataFrame, vb: DataFrame,
                     a: str, b: str, threshold: float) -> DataFrame:
    """Exact-cosine verification over CANDIDATE pairs only — the shared
    scoring tail of every pair miner here (``va``/``vb`` carry the
    pair-side vectors as ``_va``/``_vb``). Candidate pairs join both
    full vectors, then ``explode(arrays_zip(...))`` emits each pair's
    components consecutively in ascending element order inside ONE
    partition, so the partial aggregate produces exactly one d-ordered
    accumulator per pair — bit-exact w.r.t. sequential (DuckDB
    ``list_sum``) float math, and whole-stage codegen throughout (the
    per-pair ``zip_with/aggregate`` expression form is CodegenFallback,
    measured ~0.4 ms/pair at dim 64)."""
    z = (cand.join(va, a).join(vb, b)
         .select(a, b, F.explode(F.arrays_zip("_va", "_vb")).alias("_e"))
         .select(a, b,
                 F.col("_e._va").alias("_ax"), F.col("_e._vb").alias("_bx")))
    pairs = (z.groupBy(a, b)
             .agg(F.sum(F.col("_ax") * F.col("_bx")).alias("_dot"),
                  F.sum(F.col("_ax") * F.col("_ax")).alias("_na2"),
                  F.sum(F.col("_bx") * F.col("_bx")).alias("_nb2")))
    return (pairs
            .select(a, b,
                    F.round(F.col("_dot") / F.sqrt("_na2") / F.sqrt("_nb2"),
                            6).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def semantic_cells(df: DataFrame, id_col: str, vec_col: str,
                   pivots: DataFrame) -> DataFrame:
    """``(id, cell)`` — each vector's nearest pivot by squared L2, the
    cluster-blocking step of :func:`semantic_dup_pairs` exposed so
    callers can persist/inspect the assignment (cell sizes feed
    :func:`cell_balance`; the cells are also exactly
    :func:`ivf_index`'s)."""
    ce = _explode_vec(df, [F.col(id_col).alias("_iid")], vec_col, "_cx")
    pe = _explode_vec(pivots, ["_pid"], vec_col, "_px")
    return (_assign_cells(ce, "_iid", "_cx", pe, 1)
            .withColumnRenamed("_iid", id_col))


def semantic_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                       threshold: float = 0.95, *,
                       nlist: int = 64, iters: int = 10,
                       pivots: DataFrame | None = None,
                       max_cell: int = 4000) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (id_a < id_b,
    cosine ≥ τ): cluster the embedding space with k-means, then find
    pairs WITHIN each cluster by exact cosine — the published recipe
    for pruning semantically redundant training data (Abbas et al.,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540; their pipeline is exactly
    cluster → within-cluster pairwise cosine → drop all but one per
    group).

    Blocking contract vs :func:`embedding_dup_pairs` (hyperplane LSH):
    LSH banding targets a RECALL at the threshold and finds cross-
    cluster pairs too; semantic clustering is the SemDeDup trade —
    candidate cost is ∑ cellsize² (∼n²/nlist for balanced cells,
    measure with :func:`cell_balance`), pairs straddling a k-means
    boundary are missed BY DESIGN (the paper accepts this: duplicates
    cluster together), and the cells double as the IVF index cells so
    one clustering pays for retrieval AND dedup. Pass a persisted
    ``pivots`` frame to pin results (retraining shifts boundaries);
    the default trains :func:`kmeans_pivots` on ``df`` itself.

    Scale shape: ONE shuffle keys the corpus by cell; in-cell pairs
    come from the same capped collect_list + double-explode as every
    other blocked miner here (``max_cell`` is the skew valve —
    :func:`semantic_cell_drops` is its no-silent-caps ledger); exact
    cosine runs on candidates only via the shared d-ordered
    explode/agg plan. Never an all-pairs self-join."""
    if pivots is None:
        pivots = kmeans_pivots(df, id_col, vec_col, nlist, iters=iters)
    cells = semantic_cells(df, id_col, vec_col, pivots)
    w = Window.partitionBy("cell").orderBy(F.asc(id_col))
    grp = (cells.withColumn("_cn", F.row_number().over(w))
           .where(F.col("_cn") <= max_cell)
           .groupBy("cell")
           .agg(F.collect_list(id_col).alias("_ids"))
           .where(F.size("_ids") >= 2))
    cand = (grp.select(F.explode("_ids").alias("id_a"), "_ids")
            .select("id_a", F.explode("_ids").alias("id_b"))
            .where(F.col("id_a") < F.col("id_b"))
            .distinct())
    vecs = df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    va = vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return _verified_cosine(cand, va, vb, "id_a", "id_b", threshold)


def semantic_cell_drops(df: DataFrame, id_col: str, vec_col: str,
                        pivots: DataFrame, *,
                        max_cell: int = 4000) -> DataFrame:
    """Drop accounting for :func:`semantic_dup_pairs`' ``max_cell``
    valve — one row per truncated cell, ``(cell, n_members,
    n_dropped)``. Empty ⇒ the valve did not engage. Pass the SAME
    pivots/max_cell as the audited call; cost is the cell-assignment
    aggregation only, no pair join (the same ledger contract as
    :func:`~.tsmatch.motif_bucket_drops` and minhash's)."""
    cells = semantic_cells(df, id_col, vec_col, pivots)
    return (cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .where(F.col("n_members") > max_cell)
            .select("cell", "n_members",
                    (F.col("n_members") - max_cell).alias("n_dropped")))


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str,
                   threshold: float = 0.95, *,
                   keep_by: str | None = None,
                   **pair_kwargs) -> DataFrame:
    """One-call SemDeDup: mine within-cluster pairs
    (:func:`semantic_dup_pairs`), cluster them transitively
    (:func:`~.dedup.dup_clusters`), keep one representative per group
    (smallest id, or highest ``keep_by`` — the shared
    :func:`~.dedup.keep_cluster_representatives` election), return
    ``df`` minus the rest. ``pair_kwargs`` pass through to the miner
    (``nlist``, ``iters``, ``pivots``, ``max_cell``)."""
    from .dedup import dup_clusters, keep_cluster_representatives

    pairs = semantic_dup_pairs(df, id_col, vec_col, threshold,
                               **pair_kwargs)
    clusters = dup_clusters(pairs, "id_a", "id_b")
    return keep_cluster_representatives(df, id_col, clusters,
                                        keep_by=keep_by)


def embedding_index(df: DataFrame, id_col: str, vec_col: str,
                    bands: int = 10, rows_per_band: int = 5,
                    dim: int = 64) -> DataFrame:
    """Persistable hyperplane-LSH band index of an embedding corpus:
    the ``(id, band, bval)`` bucket relation
    :func:`embedding_match_pairs` probes — the cosine-space twin of
    :func:`~.dedup.minhash_index` (same incremental-ingest shape: index
    once, write bucketed on ``["band", "bval"]`` for an index-side
    zero-exchange probe join, dedup each arriving batch without
    re-mining corpus pairs). Band parameters must match between index
    and probe."""
    ev = _explode_vec(df, [F.col(id_col).alias("_id")], vec_col, "_x")
    return (_band_buckets(ev, "_id", "_x", bands, rows_per_band, dim)
            .withColumnRenamed("_id", id_col))


def embedding_match_pairs(new_df: DataFrame, index: DataFrame,
                          corpus: DataFrame, id_col: str, vec_col: str,
                          threshold: float = 0.99, bands: int = 10,
                          rows_per_band: int = 5, dim: int = 64,
                          max_bucket: int = 1000) -> DataFrame:
    """Cosine near-dup pairs between a NEW batch and an indexed corpus
    (:func:`embedding_index`, same band parameters) — returns
    ``(new_id, corpus_id, cosine)`` with exact-cosine verification over
    candidates only, never corpus-internal pairs.

    ``corpus`` supplies the indexed side's vectors for the verify step
    (the band index deliberately stores only bucket keys — duplicating
    a vector per band would multiply index bytes by ``bands``). One
    bucket join produces candidates; scoring reuses the exploded
    element plan of :func:`embedding_dup_pairs` (d-ordered partial
    sums, whole-stage codegen). A doc present in both sides matches
    itself at cosine 1.0 — filter ``new_id != corpus_id`` downstream if
    ids overlap. Hot buckets are bounded on the PROBE side by
    ``max_bucket``; bound the index side at build time if needed."""
    ev = _explode_vec(new_df, [F.col(id_col).alias("_id")], vec_col, "_x")
    nb = _band_buckets(ev, "_id", "_x", bands, rows_per_band, dim)
    w = Window.partitionBy("band", "bval").orderBy(F.asc("_id"))
    nb = (nb.withColumn("_bn", F.row_number().over(w))
          .where(F.col("_bn") <= max_bucket).drop("_bn"))
    cand = (nb.join(index.select(F.col(id_col).alias("_cid"),
                                 "band", "bval"),
                    ["band", "bval"])
            .select(F.col("_id").alias("new_id"),
                    F.col("_cid").alias("corpus_id"))
            .distinct())

    va = new_df.select(F.col(id_col).alias("new_id"),
                       F.col(vec_col).cast("array<double>").alias("_va"))
    vb = corpus.select(F.col(id_col).alias("corpus_id"),
                       F.col(vec_col).cast("array<double>").alias("_vb"))
    return _verified_cosine(cand, va, vb, "new_id", "corpus_id",
                            threshold)


def embedding_near_dedup(df: DataFrame, id_col: str, vec_col: str,
                         threshold: float = 0.99,
                         keep_by: str | None = None,
                         **pair_kwargs) -> DataFrame:
    """One-call cosine-space near-dedup — the embedding twin of
    :func:`~.dedup.near_dedup`: mine pairs
    (:func:`embedding_dup_pairs`), cluster them
    (:func:`~.dedup.dup_clusters`), keep one representative per
    cluster (smallest id, or the highest ``keep_by`` score — the same
    :func:`~.dedup.keep_cluster_representatives` election as
    :func:`~.dedup.near_dedup`, shared so semantics can't drift), and
    return ``df`` with the other members removed. ``pair_kwargs`` pass
    through to the pair miner (``bands``, ``rows_per_band``, ``dim``,
    ``target_recall``, …).

    Cache note: the pair miner itself persists nothing (it re-derives
    bucket keys per pass by design — see embedding_dup_pairs); the
    retained state here is :func:`~.dedup.dup_clusters`' per-round
    ``localCheckpoint`` blocks, which die with the session."""
    from .dedup import dup_clusters, keep_cluster_representatives

    pairs = embedding_dup_pairs(df, id_col, vec_col,
                                threshold=threshold, **pair_kwargs)
    clusters = dup_clusters(pairs, "id_a", "id_b")
    return keep_cluster_representatives(df, id_col, clusters,
                                        keep_by=keep_by)


# -- product quantization (r8) ----------------------------------------------
# The 100 TB step for the persisted IVF index: full-precision vectors
# in the probed cells dominate bytes read (dim x 8 B/row); PQ stores
# m one-byte-range codes instead (dim/m-dim subspace centroids), ADC
# scores candidates from the codes relationally, and an exact-cosine
# re-rank over ONLY the shortlist restores accuracy. Beyond-reference
# (the reference has no vector surface); design follows the public
# IVFADC construction (Jegou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011).


def pq_codebooks(corpus: DataFrame, id_col: str, vec_col: str, *,
                 m: int, ksub: int = 256, iters: int = 10,
                 tol: float = 1e-6) -> DataFrame:
    """Train ``m`` independent subspace codebooks (``ksub`` centroids
    each) — the PQ model, ``(sub, cid, center)`` with ``center`` of
    length ``dim/m``.

    Scale shape: the SAME Arrow-partials discipline as
    :func:`kmeans_pivots` — the model (m x ksub x dim/m doubles) lives
    on the driver; each Lloyd iteration is ONE distributed pass where
    every Arrow batch assigns each row's m subvectors to their nearest
    sub-centroids (one numpy matmul per subspace) and emits
    per-(subspace, centroid) count/sum partials. All m subspaces train
    in the same pass, so cost is iters passes total, not m x iters.
    Initialization is the same deterministic hash-ordered oversample +
    greedy farthest-point, per subspace. ``dim`` must be divisible by
    ``m``."""
    # 32768, not 65536: pq_encode persists codes as array<smallint>
    # (the whole point is small codes) and a cid >= 2^15 would
    # overflow at the Arrow conversion — the ceiling must match the
    # storage type, not the abstract codebook math
    if m < 1 or ksub < 1 or ksub > 32768:
        raise ValueError(f"need m >= 1 and 1 <= ksub <= 32768 "
                         f"(codes persist as smallint), "
                         f"got m={m} ksub={ksub}")
    import numpy as np

    spark = corpus.sparkSession
    data = (corpus.select(F.col(vec_col).cast("array<double>").alias("x"))
            .where(F.col(vec_col).isNotNull()).persist())
    try:
        seed_rows = (corpus
                     .select(F.col(vec_col).cast("array<double>")
                             .alias("x"),
                             F.xxhash64(F.col(id_col).cast("string"))
                             .alias("_h"))
                     .where(F.col(vec_col).isNotNull())
                     .orderBy(F.asc("_h"))
                     .limit(8 * ksub).collect())
        if not seed_rows:
            raise ValueError("no rows with non-null vectors")
        full = np.asarray([r["x"] for r in seed_rows], dtype=np.float64)
        dim = full.shape[1]
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        dsub = dim // m
        ksub = min(ksub, len(full))

        def _farthest(cand: np.ndarray, k: int) -> np.ndarray:
            chosen = [0]
            d_min = ((cand - cand[0]) ** 2).sum(axis=1)
            while len(chosen) < min(k, len(cand)):
                nxt = int(d_min.argmax())
                chosen.append(nxt)
                d_min = np.minimum(
                    d_min, ((cand - cand[nxt]) ** 2).sum(axis=1))
            return cand[chosen]

        cents = np.stack([_farthest(full[:, s * dsub:(s + 1) * dsub], ksub)
                          for s in range(m)])       # (m, ksub, dsub)

        for _ in range(iters):
            c_now = cents

            def partials(it):
                import pandas as pd
                for pdf in it:
                    x = np.asarray([np.asarray(v, dtype=np.float64)
                                    for v in pdf["x"]])
                    if len(x) == 0:
                        continue
                    cnt = np.zeros((m, ksub), dtype=np.int64)
                    sums = np.zeros((m, ksub, dsub), dtype=np.float64)
                    for s in range(m):
                        xs = x[:, s * dsub:(s + 1) * dsub]
                        cs = c_now[s]
                        d2 = ((xs * xs).sum(axis=1)[:, None]
                              - 2.0 * (xs @ cs.T)
                              + (cs * cs).sum(axis=1)[None, :])
                        a = d2.argmin(axis=1)
                        cnt[s] = np.bincount(a, minlength=ksub)
                        np.add.at(sums[s], a, xs)
                    yield pd.DataFrame({"cnt": [cnt.ravel().tolist()],
                                        "sums": [sums.ravel().tolist()]})

            rows = data.mapInPandas(
                partials, "cnt array<long>, sums array<double>").collect()
            cnt = np.zeros((m, ksub), dtype=np.int64)
            sums = np.zeros((m, ksub, dsub), dtype=np.float64)
            for r in rows:
                cnt += np.asarray(r["cnt"],
                                  dtype=np.int64).reshape(m, ksub)
                sums += np.asarray(r["sums"],
                                   dtype=np.float64).reshape(m, ksub, dsub)
            new = cents.copy()
            nz = cnt > 0
            new[nz] = sums[nz] / cnt[nz][:, None]
            shift = float(np.abs(new - cents).max())
            cents = new
            if shift < tol:
                break
    finally:
        data.unpersist()
    return spark.createDataFrame(
        [(int(s), int(c), cents[s, c].tolist())
         for s in range(m) for c in range(ksub)],
        "sub int, cid int, center array<double>")


def pq_codebook_model(codebooks: DataFrame):
    """Collect the (tiny) codebook frame into the numpy model the
    Arrow encoders close over — bounded driver metadata, m x ksub x
    dsub doubles (the k-means partials bound).

    Each call is one driver-side Spark job; a caller composing
    :func:`ivf_pq_index` and :func:`ivf_pq_probe` over the SAME
    codebook should collect once and pass the array through their
    ``model=`` parameter instead of paying the job twice (r14 — the
    q_ann_ivf gate entry does exactly this)."""
    import numpy as np

    rows = codebooks.collect()
    m = 1 + max(r["sub"] for r in rows)
    ksub = 1 + max(r["cid"] for r in rows)
    dsub = len(rows[0]["center"])
    cents = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in rows:
        cents[r["sub"], r["cid"]] = r["center"]
    return cents


_codebook_model = pq_codebook_model


def pq_encode(df: DataFrame, id_col: str, vec_col: str,
              codebooks: DataFrame, *,
              keep_cols: list[str] | None = None,
              model=None) -> DataFrame:
    """PQ-encode vectors: ``(id [, keep_cols...], codes, _cnorm)``
    where ``codes[s]`` is the nearest sub-centroid of subvector ``s``
    (deterministic: ties to the lowest cid) and ``_cnorm`` the norm of
    the RECONSTRUCTION (so ADC can rank by approximate cosine without
    touching the original vector again). One Arrow pass, one matmul
    per subspace per batch; output drops the full vector — that's the
    8-16x byte cut."""
    import numpy as np

    cents = model if model is not None else pq_codebook_model(codebooks)
    m, ksub, dsub = cents.shape
    keep = keep_cols or []
    in_cols = [id_col, *keep, vec_col]
    cnorm2_tab = (cents * cents).sum(axis=2)          # (m, ksub)

    def encode(it):
        import pandas as pd
        for pdf in it:
            x = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            out = {id_col: pdf[id_col]}
            for c in keep:
                out[c] = pdf[c]
            if len(x) == 0:
                out["codes"] = pd.Series([], dtype=object)
                out["_cnorm"] = pd.Series([], dtype=float)
                yield pd.DataFrame(out)
                continue
            codes = np.zeros((len(x), m), dtype=np.int32)
            norm2 = np.zeros(len(x), dtype=np.float64)
            for s in range(m):
                xs = x[:, s * dsub:(s + 1) * dsub]
                cs = cents[s]
                d2 = ((xs * xs).sum(axis=1)[:, None]
                      - 2.0 * (xs @ cs.T)
                      + (cs * cs).sum(axis=1)[None, :])
                a = d2.argmin(axis=1)
                codes[:, s] = a
                norm2 += cnorm2_tab[s][a]
            out["codes"] = list(codes.tolist())
            out["_cnorm"] = np.sqrt(norm2)
            yield pd.DataFrame(out)

    id_t = dict(df.dtypes)[id_col]
    keep_t = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in keep)
    schema = (f"{id_col} {id_t}, "
              + (keep_t + ", " if keep_t else "")
              + "codes array<smallint>, _cnorm double")
    return df.select(*in_cols).mapInPandas(encode, schema)


def ivf_pq_index(corpus: DataFrame, id_col: str, vec_col: str,
                 pivots: DataFrame, codebooks: DataFrame, *,
                 model=None) -> DataFrame:
    """Cell-assigned, PQ-encoded index: ``(id, cell, codes, _cnorm)``
    — :func:`ivf_index`'s layout with the full-precision vector
    replaced by ``m`` small codes. Persist with
    ``write_partitioned(index, path, ["cell"])`` exactly like the
    full-precision index; probes read only probed cells AND only
    code bytes — the two multiplicative reductions compound."""
    ce = _explode_vec(corpus, [F.col(id_col).alias("_iid")], vec_col,
                      "_cx")
    pe = _explode_vec(pivots, ["_pid"], vec_col, "_px")
    cells = _assign_cells(ce, "_iid", "_cx", pe, 1) \
        .withColumnRenamed("_iid", id_col)
    enc = pq_encode(corpus, id_col, vec_col, codebooks, model=model)
    return enc.join(cells, id_col)


def ivf_pq_probe(pq_index: DataFrame, full_vectors: DataFrame,
                 queries: DataFrame, id_col: str, vec_col: str,
                 pivots: DataFrame, codebooks: DataFrame,
                 k: int = 10, nprobe: int = 4, *,
                 rerank: int = 4,
                 query_id_col: str | None = None,
                 model=None,
                 prune_with_literal: bool = True) -> DataFrame:
    """IVFADC probe with exact re-rank: ADC-score the probed cells'
    CODES, shortlist ``rerank * k`` per query, then re-score ONLY the
    shortlist against ``full_vectors`` with the exact-cosine element
    plan (the :func:`_verified_cosine` tail's shape) and return the
    top ``k``.

    Scale audit: (1) probed cells reach the index read as a literal
    ``cell IN (...)`` — partition pruning as in :func:`ivf_probe`;
    (2) ADC is a broadcast join of the exploded codes against the
    per-query lookup table (|queries| x m x ksub rows — driver-bounded
    probe metadata, the LUT twin of the probed-cell collect) followed
    by one (query, id) sum — per-candidate cost m additions instead
    of dim multiplies; (3) the only touch of full-precision vectors is
    the shortlist join — O(rerank * k * |queries|) rows read from a
    store that can stay id-bucketed. Never all-pairs, never a
    cartesian."""
    import numpy as np

    query_id_col = query_id_col or id_col
    cents = model if model is not None else pq_codebook_model(codebooks)
    m, ksub, dsub = cents.shape
    spark = queries.sparkSession

    pe = _explode_vec(pivots, ["_pid"], vec_col, "_px")
    qe = _explode_vec(queries,
                      [F.col(query_id_col).alias("query_id")],
                      vec_col, "_qx")
    q_cells = _assign_cells(qe, "query_id", "_qx", pe, nprobe)

    if prune_with_literal:
        # collect the probed cell ids so a PERSISTED index read prunes
        # partitions with a literal `cell IN (...)` — worth one driver
        # job when the index comes from disk
        probed = sorted({r["cell"] for r in
                         q_cells.select("cell").distinct().collect()})
        hit = pq_index.where(F.col("cell").isin(probed))
    else:
        # in-plan index (no partitions to prune): a broadcast semi-join
        # filters the same rows with NO eager driver job (r14)
        hit = pq_index.join(
            F.broadcast(q_cells.select("cell").distinct()),
            "cell", "left_semi")

    # per-query ADC lookup table: dot(q_s, c_{s,cid}) for every
    # (subspace, centroid) — |queries| x m x ksub rows, built in one
    # Arrow pass over the query batch and broadcast into the join
    def lut_rows(it):
        import pandas as pd
        for pdf in it:
            q = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            if len(q) == 0:
                continue
            qn = np.sqrt((q * q).sum(axis=1))
            frames = []
            for s in range(m):
                qs = q[:, s * dsub:(s + 1) * dsub]
                vals = qs @ cents[s].T                 # (|q|, ksub)
                frames.append(pd.DataFrame({
                    "query_id": pdf[query_id_col].repeat(ksub)
                                   .reset_index(drop=True),
                    "_qnorm": pd.Series(qn).repeat(ksub)
                                 .reset_index(drop=True),
                    "_sub": np.int32(s),
                    "_cid": np.tile(np.arange(ksub, dtype=np.int32),
                                    len(q)),
                    "_val": vals.ravel(),
                }))
            yield pd.concat(frames, ignore_index=True)

    qid_t = dict(queries.dtypes)[query_id_col]
    lut = queries.select(query_id_col, vec_col).mapInPandas(
        lut_rows,
        f"query_id {qid_t}, _qnorm double, _sub int, _cid int, "
        f"_val double")

    codes_e = hit.select(
        F.col(id_col).alias("neighbor_id"), "cell", "_cnorm",
        F.posexplode("codes").alias("_sub", "_cid"))
    adc = (codes_e.join(F.broadcast(q_cells), "cell")
           .join(F.broadcast(lut.withColumn(
               "_cid", F.col("_cid").cast("smallint"))),
               ["query_id", "_sub", "_cid"])
           .where(F.col("neighbor_id") != F.col("query_id"))
           .groupBy("query_id", "neighbor_id")
           .agg(F.sum("_val").alias("_adot"),
                F.first("_cnorm").alias("_cn"),
                F.first("_qnorm").alias("_qn")))
    # shortlist ranks on the ADC cosine ROUNDED to 9 decimals with an
    # id tie-break: the raw sum's float reassociation slack (~1e-15 —
    # numpy partials here vs sequential math in a SQL twin) is far
    # inside the grid, so the shortlist is deterministic across
    # engines/partitionings; 1e-9 is far below any meaningful ADC
    # score difference, so ranking quality is unaffected
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("_adot") / F.col("_cn") / F.col("_qn"),
                       9)),
        F.asc("neighbor_id"))
    short = (adc.withColumn("_ar", F.row_number().over(w_adc))
             .where(F.col("_ar") <= rerank * k)
             .select("query_id", "neighbor_id"))

    # exact re-rank: only the shortlist touches full vectors
    ce = _explode_vec(
        full_vectors.join(
            F.broadcast(short.select("neighbor_id").distinct()),
            full_vectors[id_col] == F.col("neighbor_id"), "left_semi"),
        [F.col(id_col).alias("neighbor_id")], vec_col, "_cx")
    sums = (ce.join(F.broadcast(short), "neighbor_id")
            .join(F.broadcast(qe), ["query_id", "_d"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum(F.col("_cx") * F.col("_qx")).alias("_dot"),
                 F.sum(F.col("_cx") * F.col("_cx")).alias("_cn2"),
                 F.sum(F.col("_qx") * F.col("_qx")).alias("_qn2")))
    scored = sums.select(
        "query_id", "neighbor_id",
        F.round(F.col("_dot") / F.sqrt("_qn2") / F.sqrt("_cn2"), 6)
         .alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("bigint").alias("rank")))


# -- OPQ: learned rotation for product quantization (r8) --------------------
# PQ quantizes each dim/m-wide subspace independently, so its error is
# worst when variance/correlation is spread unevenly across the
# subspace boundaries (the common case for learned embeddings). OPQ
# (Ge et al., CVPR 2013) fixes the GEOMETRY instead of the codebooks:
# learn one orthogonal rotation R that redistributes variance so the
# subspaces are as independent as possible, then run ordinary PQ in
# the rotated space. Because R preserves norms and inner products,
# the whole existing stack composes unchanged downstream of
# :func:`rotate_vectors`: rotated pivots give IDENTICAL cell
# assignments, ADC cosines in rotated space equal cosines in the
# original space, and the exact re-rank tail needs no inverse
# rotation. Training is the classic alternation — encode under
# current R, then solve the orthogonal Procrustes problem
# R = argmin ||XR - X̂||_F via SVD of X^T X̂ — on a DETERMINISTIC
# hash-ordered sample on the driver (same bounded-sample discipline
# as pq_codebooks' seeding; the model is d x d doubles).


def opq_rotation(corpus: DataFrame, id_col: str, vec_col: str, *,
                 m: int, ksub: int = 256, iters: int = 8,
                 sample: int = 4096, sub_iters: int = 4) -> DataFrame:
    """Train the OPQ rotation: returns ``(i, row)`` — row ``i`` of the
    orthogonal d x d matrix R — plus training diagnostics in the
    frame's metadata-free contract (orthogonality and error descent
    are test-pinned instead). Train codebooks AFTER rotating
    (:func:`rotate_vectors` then :func:`pq_codebooks`); queries and
    appended vectors must pass through the same rotation.

    Deterministic: hash-ordered sample, farthest-point init per
    subspace, numpy SVD — two runs yield the same R bit-for-bit."""
    if m < 1 or ksub < 1:
        raise ValueError(f"need m >= 1 and ksub >= 1, got {m}, {ksub}")
    import numpy as np

    spark = corpus.sparkSession
    rows = (corpus
            .select(F.col(vec_col).cast("array<double>").alias("x"),
                    F.xxhash64(F.col(id_col).cast("string"))
                    .alias("_h"))
            .where(F.col(vec_col).isNotNull())
            .orderBy(F.asc("_h")).limit(sample).collect())
    if not rows:
        raise ValueError("no rows with non-null vectors")
    X = np.asarray([r["x"] for r in rows], dtype=np.float64)
    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = min(ksub, n)

    def _farthest(cand: np.ndarray, kk: int) -> np.ndarray:
        chosen = [0]
        d_min = ((cand - cand[0]) ** 2).sum(axis=1)
        while len(chosen) < min(kk, len(cand)):
            nxt = int(d_min.argmax())
            chosen.append(nxt)
            d_min = np.minimum(
                d_min, ((cand - cand[nxt]) ** 2).sum(axis=1))
        return cand[chosen].copy()

    def _train_encode(Xr: np.ndarray):
        """Per-subspace Lloyd on the rotated sample, then the
        reconstruction X̂ — the inner PQ step of the alternation."""
        recon = np.empty_like(Xr)
        for s in range(m):
            xs = Xr[:, s * dsub:(s + 1) * dsub]
            cs = _farthest(xs, k)
            for _ in range(sub_iters):
                d2 = ((xs * xs).sum(axis=1)[:, None]
                      - 2.0 * (xs @ cs.T)
                      + (cs * cs).sum(axis=1)[None, :])
                a = d2.argmin(axis=1)
                for c in range(len(cs)):
                    sel = xs[a == c]
                    if len(sel):
                        cs[c] = sel.mean(axis=0)
            d2 = ((xs * xs).sum(axis=1)[:, None] - 2.0 * (xs @ cs.T)
                  + (cs * cs).sum(axis=1)[None, :])
            recon[:, s * dsub:(s + 1) * dsub] = cs[d2.argmin(axis=1)]
        return recon

    R = np.eye(dim)
    for _ in range(iters):
        recon = _train_encode(X @ R)
        # orthogonal Procrustes: rotate X onto its own reconstruction
        U, _, Vt = np.linalg.svd(X.T @ recon)
        R_new = U @ Vt
        if np.abs(R_new - R).max() < 1e-9:
            R = R_new
            break
        R = R_new
    return spark.createDataFrame(
        [(i, R[i].tolist()) for i in range(dim)],
        "i int, row array<double>")


def rotation_model(rotation: DataFrame):
    """Collect the (d x d — driver-bounded) rotation frame into the
    numpy matrix the Arrow appliers close over."""
    import numpy as np

    rows = rotation.collect()
    dim = len(rows)
    R = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        R[r["i"]] = r["row"]
    return R


def rotate_vectors(df: DataFrame, vec_col: str,
                   rotation: DataFrame) -> DataFrame:
    """Replace ``vec_col`` with its rotated form (one Arrow pass, one
    matmul per batch; all other columns carried through). Feed the
    corpus AND every query/append through the same rotation — rotated
    and unrotated vectors must never mix in one index."""
    import numpy as np

    R = rotation_model(rotation)
    cols = df.columns

    def apply(it):
        import pandas as pd
        for pdf in it:
            vals = pdf[vec_col]
            ok = vals.notna()
            if ok.any():
                x = np.asarray([np.asarray(v, dtype=np.float64)
                                for v in vals[ok]])
                rot = x @ R
                out = pd.Series([None] * len(pdf), dtype=object)
                out[np.flatnonzero(ok.to_numpy())] = list(rot.tolist())
            else:
                out = pd.Series([None] * len(pdf), dtype=object)
            pdf = pdf.copy()
            pdf[vec_col] = out
            yield pdf

    schema = ", ".join(
        f"{c} {t}" if c != vec_col else f"{c} array<double>"
        for c, t in df.dtypes)
    return df.mapInPandas(apply, schema)
