"""Sparse retrieval: BM25 scoring, a persisted hash-bucketed inverted
index, and reciprocal-rank fusion — the keyword counterpart to
``similarity.py``'s dense ANN stack ("find documents about X in the
corpus", then fuse with embedding neighbors for hybrid retrieval).

The reference has no search surface at all; this rounds out the
training-data engine the same way the IVF index does for embeddings:

- :func:`bm25_topk` — one-shot scoring straight off the corpus table.
- :func:`inverted_index` / :func:`corpus_stats` — the persistable
  form: postings keyed by a PORTABLE hash bucket of the term, written
  once with ``sources.write_partitioned(postings, path, ["term_bucket"])``;
  a probe then reads ONLY its query terms' buckets (literal IN over the
  hive layout — same bytes-pruned story, and test, as ``ivf_probe``).
  Buckets (not ``partitionBy("term")``) because a web corpus has 10^8+
  distinct noise terms — one directory per term would melt any
  metastore listing, while 2^8-2^12 buckets keep listings O(1) and
  pruning proportional.
- :func:`bm25_probe` — BM25 over the pruned postings. Per-term
  document frequencies come from :func:`term_stats` — additive
  per-batch DELTA rows under the same bucket layout, summed after
  pruning — so the probe never needs the unpruned index AND appending
  a batch never rewrites existing rows (append == rebuild,
  test-pinned).
- :func:`rrf_fuse` — reciprocal-rank fusion of any rankings that share
  an id (classically: this module's sparse top-k + ``similarity``'s
  dense top-k), rank-only so wildly different score scales compose.

All scoring is codegen expressions over one exploded-token aggregate;
corpus-level scalars (N, avgdl) join as broadcast 1-row frames, never
driver collects (same stance as ``quality.tfidf_top_terms``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from ..functions.text import tokens

_DEFAULT_BUCKETS = 256


def _term_bucket(term, buckets: int):
    return F.pmod(hash64(term), F.lit(buckets)).cast("int")


def _postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl): term frequency per doc plus the doc's total
    token length. ``dl`` is computed BEFORE the explode (``size`` of
    the token array) and carried through the aggregate as a grouping
    key — it is functionally dependent on the id, so the grouping is
    unchanged, and the plan stays one partial-aggregated hash
    aggregate. (The previous ``sum(tf) over (partition by id)`` window
    planted a full sort of the aggregated (id, term) stream — measured
    ~1.25× the cost of this shape warm at sf0.1, and the sort's memory
    footprint, not just its time, is what hurts on a skewed 100 TB
    corpus.)"""
    toks = df.select(id_col, tokens(text_col).alias("_tk"))
    return (toks.select(id_col,
                        F.size("_tk").cast("bigint").alias("dl"),
                        F.explode("_tk").alias("term"))
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
            .select(id_col, "term", "tf", "dl"))


def _bm25_score(k1: float, b: float):
    """BM25 term contribution from columns tf, dl, df_t, n_docs,
    avgdl (Robertson/Sparck-Jones idf, the Lucene-standard variant
    with the +1 keeping idf positive)."""
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    return idf * norm


def _validated_terms(query_terms: list[str]) -> list[str]:
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # queries must use the DOCUMENT tokenizer's alphabet — ASCII
    # [a-z0-9] runs (functions.text.tokens) — or they silently score 0.
    # str.isalnum() is NOT that check: it accepts Unicode letters the
    # tokenizer never emits.
    import re
    terms = sorted({t.lower() for t in query_terms})
    bad = [t for t in terms if not re.fullmatch(r"[a-z0-9]+", t)]
    if bad:
        raise ValueError(f"query terms must be single alphanumeric "
                         f"tokens (got {bad}); multi-word queries "
                         f"pass each word as its own term")
    return terms


def corpus_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-row ADDITIVE ``(n_docs, n_tokens)`` frame — persist
    append-mode next to the inverted index (a probe reads pruned
    buckets only, so corpus-level stats can't be derived at query
    time). Additive on purpose: each ingested batch appends its own
    row, the probe sums whatever rows exist, and ``avgdl`` is derived
    as ``n_tokens / n_docs`` at query time — appending never rewrites
    history (same stance as the sketch relations)."""
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens(text_col)).cast("bigint")).alias("n_tokens"))


def inverted_index(df: DataFrame, id_col: str, text_col: str, *,
                   buckets: int = _DEFAULT_BUCKETS) -> DataFrame:
    """Postings ``(term, id, tf, dl, term_bucket)`` — write with
    ``write_partitioned(index, path, ["term_bucket"])`` and probes read
    only their terms' buckets.

    INCREMENTAL by construction: ingesting a new (doc-disjoint) batch
    is just three append writes — this frame, :func:`term_stats`, and
    :func:`corpus_stats` for the batch — because every relation the
    probe consumes is additive (postings are per-doc rows; term/corpus
    stats are summable deltas). No df_t denormalized onto postings:
    that would make every append rewrite all existing postings of
    every term the batch touches. Append == rebuild, test-pinned."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    p = _postings(df, id_col, text_col)
    return p.withColumn("term_bucket",
                        _term_bucket(F.col("term"), buckets))


def term_stats(df: DataFrame, id_col: str, text_col: str, *,
               buckets: int = _DEFAULT_BUCKETS) -> DataFrame:
    """Per-term document-frequency DELTAS for one batch:
    ``(term, df_t, term_bucket)`` — write append-mode partitioned by
    ``term_bucket`` like the postings. A probe sums the ``df_t`` rows
    of its pruned buckets, so the idf stays exact across any number of
    appended batches (batches must be doc-disjoint — the usual ingest
    contract, same as the dedup indexes)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    return (df.select(id_col, F.explode_outer(
                F.array_distinct(tokens(text_col))).alias("term"))
            .where(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("df_t"))
            .withColumn("term_bucket",
                        _term_bucket(F.col("term"), buckets)))


def bm25_deletion_deltas(deleted_df: DataFrame, id_col: str,
                         text_col: str, *,
                         buckets: int = _DEFAULT_BUCKETS) -> dict:
    """The ADDITIVE deletion record for documents leaving an indexed
    corpus — the missing half of the incremental index contract
    (appends never rewrite history; neither do deletes):

    - ``tombstones``: ``(id, term_bucket)`` pairs — one row per bucket
      any of the doc's terms hashes to, so a probe can exclude the
      doc's postings after pruning to its own buckets (the tombstone
      read is bucket-pruned exactly like the postings read).
    - ``neg_terms``: :func:`term_stats` of the deleted docs with
      ``df_t`` NEGATED — appended next to the positive deltas, the
      probe's per-term sum yields the filtered corpus's exact document
      frequencies.
    - ``neg_stats``: :func:`corpus_stats` of the deleted docs negated —
      summed ``n_docs``/``n_tokens`` (hence ``avgdl``) match the
      filtered corpus exactly.

    With all three applied, a tombstoned probe is SCORE-IDENTICAL to a
    full rebuild over the corpus minus the deleted docs (gate-verified
    in q_tfidf's ``bm25_del`` branch) — not the stale-stats
    approximation segment-merge engines serve between merges. Requires
    the deleted docs' TEXT (the GDPR/dedup-prune flow deletes from the
    corpus table, which still has it); ids must be docs actually in
    the index, deleted at most once (same doc-disjoint discipline as
    appends)."""
    neg_terms = (term_stats(deleted_df, id_col, text_col,
                            buckets=buckets)
                 .withColumn("df_t", -F.col("df_t")))
    neg_stats = (corpus_stats(deleted_df, id_col, text_col)
                 .select((-F.col("n_docs")).alias("n_docs"),
                         (-F.col("n_tokens")).alias("n_tokens")))
    tombstones = (deleted_df
                  .select(F.col(id_col), F.explode_outer(
                      F.array_distinct(tokens(text_col))).alias("term"))
                  .where(F.col("term").isNotNull())
                  .select(id_col,
                          _term_bucket(F.col("term"), buckets)
                          .alias("term_bucket"))
                  .distinct())
    return {"tombstones": tombstones, "neg_terms": neg_terms,
            "neg_stats": neg_stats}


def _without_tombstoned(hit: DataFrame, tombstones: DataFrame | None,
                        probed: list[int], id_col: str) -> DataFrame:
    """Exclude tombstoned docs' postings: anti-join on
    ``(id, term_bucket)`` — exact because a deleted doc has a tombstone
    row for EVERY bucket its terms hash to. The tombstone side is
    pruned to the probe's buckets first, so the read stays proportional
    to the query, not the delete history."""
    if tombstones is None:
        return hit
    t = (tombstones.where(F.col("term_bucket").isin(probed))
         .select(id_col, "term_bucket").distinct())
    return hit.join(t, [id_col, "term_bucket"], "left_anti")


def probe_buckets(query_terms: list[str], *,
                  buckets: int = _DEFAULT_BUCKETS) -> list[int]:
    """The bucket ids a query touches — PURE PYTHON (the bucket hash
    is the engine's portable md5 family: first 15 md5 hex digits as a
    bigint), so finding them costs no Spark job; push the result as a
    literal ``term_bucket IN (...)`` predicate."""
    import hashlib

    return sorted({int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                   % buckets for t in _validated_terms(query_terms)})


def bm25_probe(postings: DataFrame, terms_df: DataFrame,
               stats: DataFrame, query_terms: list[str], *,
               k: int = 10, k1: float = 1.2, b: float = 0.75,
               buckets: int = _DEFAULT_BUCKETS,
               id_col: str = "doc_id",
               tombstones: DataFrame | None = None) -> DataFrame:
    """Top-``k`` BM25 over a persisted :func:`inverted_index` →
    ``(id, score, rank)``. Reads: postings and :func:`term_stats`
    pruned to :func:`probe_buckets`' literal IN (hive partition
    pruning — bytes proportional to the query, not the corpus), the
    tiny :func:`corpus_stats` relation summed (broadcast). ``buckets``
    must match the build. Ties break by id; scores round to 6 for
    cross-engine comparability.

    ``tombstones`` (from :func:`bm25_deletion_deltas`): deleted docs'
    postings are anti-joined away after pruning. Pass ``terms_df`` /
    ``stats`` with the negative deltas unioned in (the persisted
    layout's reader does this) and the probe is score-identical to a
    rebuild over the filtered corpus."""
    terms = _validated_terms(query_terms)
    probed = probe_buckets(terms, buckets=buckets)
    hit = (postings.where(F.col("term_bucket").isin(probed))
           .where(F.col("term").isin(terms)))
    hit = _without_tombstoned(hit, tombstones, probed, id_col)
    dfreq = (terms_df.where(F.col("term_bucket").isin(probed))
             .where(F.col("term").isin(terms))
             .groupBy("term")
             .agg(F.sum("df_t").alias("df_t")))
    totals = stats.agg(F.sum("n_docs").cast("bigint").alias("n_docs"),
                       (F.sum("n_tokens") / F.sum("n_docs"))
                       .alias("avgdl"))
    scored = (hit.join(F.broadcast(dfreq), "term")
              .join(F.broadcast(totals))
              .withColumn("_s", _bm25_score(k1, b))
              .groupBy(id_col)
              .agg(F.round(F.sum("_s"), 6).alias("score")))
    order = [F.desc("score"), F.asc(id_col)]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)                           # k rows only
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              query_terms: list[str], *, k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """One-shot BM25 top-``k`` straight off the corpus table →
    ``(id, score, rank)`` — identical scoring to the index path
    (equivalence-tested), for ad-hoc queries that don't warrant
    building the index. Document frequencies aggregate from the
    query-term postings only (early term filter keeps the wide ops
    proportional to matching docs, not the corpus vocabulary);
    ``dl``/``avgdl``/``n_docs`` still cover ALL tokens and docs, as
    BM25 requires."""
    terms = _validated_terms(query_terms)
    p = _postings(df, id_col, text_col).where(F.col("term").isin(terms))
    dfreq = p.groupBy("term").agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("df_t"))
    totals = corpus_stats(df, id_col, text_col).select(
        "n_docs", (F.col("n_tokens") / F.col("n_docs")).alias("avgdl"))
    scored = (p.join(dfreq, "term")
              .join(F.broadcast(totals))
              .withColumn("_s", _bm25_score(k1, b))
              .groupBy(id_col)
              .agg(F.round(F.sum("_s"), 6).alias("score")))
    order = [F.desc("score"), F.asc(id_col)]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def rrf_fuse(rankings: dict[str, DataFrame], id_col: str, *,
             k: int = 60, topk: int = 10,
             weights: dict[str, float] | None = None) -> DataFrame:
    """Reciprocal-rank fusion of named rankings sharing ``id_col`` and
    a ``rank`` column → ``(id, rrf_score, rank, sources)``:
    ``rrf = Σ_r 1/(k + rank_r(d))`` (Cormack et al.'s k=60 default).
    Rank-only, so BM25 scores and cosine similarities — incomparable
    scales — fuse without calibration; a document missing from one
    ranking simply contributes nothing (``sources`` says which lists
    carried it). ``weights`` optionally scales each ranking's
    contribution (``w/(k + rank)`` — lean the fusion toward the list
    you trust; unlisted names default to 1.0). Inputs are top-k lists
    (small); the union-aggregate is proportional to Σ|rankings|, not
    any corpus."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    wts = weights or {}
    bad = sorted(set(wts) - set(rankings))
    if bad:
        raise ValueError(f"weights name unknown rankings: {bad}")
    if any(x <= 0 for x in wts.values()):
        raise ValueError("weights must be > 0")
    parts = []
    for name, r in sorted(rankings.items()):
        parts.append(r.select(
            F.col(id_col),
            (F.lit(float(wts.get(name, 1.0)))
             / (F.lit(float(k)) + F.col("rank"))).alias("_c"),
            F.lit(name).alias("_src")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.groupBy(id_col)
             .agg(F.round(F.sum("_c"), 6).alias("rrf_score"),
                  F.sort_array(F.collect_set("_src")).alias("sources")))
    order = [F.desc("rrf_score"), F.asc(id_col)]
    top = fused.orderBy(*order).limit(topk)
    w = Window.orderBy(*order)
    return (top.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .select(id_col, "rrf_score", "rank", "sources"))


def bm25_probe_many(postings: DataFrame, terms_df: DataFrame,
                    stats: DataFrame, queries: dict[str, list[str]], *,
                    k: int = 10, k1: float = 1.2, b: float = 0.75,
                    buckets: int = _DEFAULT_BUCKETS,
                    id_col: str = "doc_id",
                    tombstones: DataFrame | None = None) -> DataFrame:
    """Batch retrieval: top-``k`` BM25 per query for a WHOLE query set
    → ``(query_id, id, score, rank)`` — the production shape (RAG
    evaluation, hard-negative mining) scores thousands of queries in
    one job, not one probe each.

    One pruned index read covers every query: the literal IN carries
    the UNION of all queries' buckets, the (query_id, term) pairs join
    in as a broadcast relation (bounded by the query set, never the
    corpus), and per-query ranking is a window partitioned by
    query_id — so cost scales with matching postings + |queries|·k,
    and the scoring arithmetic is shared with :func:`bm25_probe`
    (per-query equivalence test-pinned). A query whose terms miss the
    corpus entirely yields no rows (same as the single probe)."""
    if not queries:
        raise ValueError("queries must be non-empty")
    pairs = [(qid, t) for qid, terms in sorted(queries.items())
             for t in _validated_terms(terms)]
    all_terms = sorted({t for _, t in pairs})
    probed = probe_buckets(all_terms, buckets=buckets)
    spark = postings.sparkSession
    qdf = spark.createDataFrame(pairs, "query_id string, term string")

    hit = (postings.where(F.col("term_bucket").isin(probed))
           .where(F.col("term").isin(all_terms)))
    hit = _without_tombstoned(hit, tombstones, probed, id_col)
    dfreq = (terms_df.where(F.col("term_bucket").isin(probed))
             .where(F.col("term").isin(all_terms))
             .groupBy("term")
             .agg(F.sum("df_t").alias("df_t")))
    totals = stats.agg(F.sum("n_docs").cast("bigint").alias("n_docs"),
                       (F.sum("n_tokens") / F.sum("n_docs"))
                       .alias("avgdl"))
    scored = (hit.join(F.broadcast(qdf), "term")
              .join(F.broadcast(dfreq), "term")
              .join(F.broadcast(totals))
              .withColumn("_s", _bm25_score(k1, b))
              .groupBy("query_id", id_col)
              .agg(F.round(F.sum("_s"), 6).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w)
                              .cast("bigint"))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "score", "rank"))
