"""Sparse retrieval (operators/retrieval.py): BM25 vs a full DuckDB
SQL oracle, index-probe == direct-scoring equivalence, measured
bucket-pruned index reads, and reciprocal-rank fusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    bm25_probe, bm25_topk, corpus_stats, inverted_index, rrf_fuse,
)
from tests.conftest import SF_DIR, assert_df_matches_oracle

QUERY = ["spark", "window", "merge"]


def test_bm25_matches_duckdb_oracle(spark, duck):
    """bm25_topk on the documents table vs the same formula written as
    SQL (Robertson idf with +1, k1=1.2, b=0.75) — scores and ranking
    hash-match."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = bm25_topk(docs, "doc_id", "text", QUERY, k=15)
    assert_df_matches_oracle(got, duck, r"""
        with toks as (
          select doc_id,
            list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                        t -> t <> '') as tk
          from documents),
        tf as (
          select doc_id, term, count(*)::bigint as tf
          from (select doc_id, unnest(tk) as term from toks)
          group by 1, 2),
        dl as (select doc_id, len(tk)::bigint as dl from toks),
        stats as (
          select count(*)::bigint as n_docs, avg(len(tk)) as avgdl
          from toks),
        q as (
          select tf.doc_id, tf.term, tf.tf, dl.dl
          from tf join dl using (doc_id)
          where tf.term in ('spark', 'window', 'merge')),
        dfreq as (select term, count(*)::bigint as df_t from q group by 1),
        s as (
          select q.doc_id,
            sum(ln(1 + (stats.n_docs - dfreq.df_t + 0.5)
                       / (dfreq.df_t + 0.5))
                * q.tf * 2.2
                / (q.tf + 1.2 * (1 - 0.75 + 0.75 * q.dl / stats.avgdl)))
              as score
          from q join dfreq using (term) cross join stats
          group by q.doc_id)
        select doc_id, round(score, 6) as score,
               row_number() over (order by score desc, doc_id)::bigint
                 as rank
        from s order by score desc, doc_id limit 15
    """)


def _write_index_batch(spark, docs, base, mode):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import term_stats
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        write_partitioned,
    )

    write_partitioned(inverted_index(docs, "doc_id", "text", buckets=32),
                      f"{base}/postings", ["term_bucket"], mode=mode)
    write_partitioned(term_stats(docs, "doc_id", "text", buckets=32),
                      f"{base}/terms", ["term_bucket"], mode=mode)
    write_partitioned(corpus_stats(docs, "doc_id", "text"),
                      f"{base}/stats", [], mode=mode)


def _read_index(spark, base):
    return (spark.read.parquet(f"{base}/postings"),
            spark.read.parquet(f"{base}/terms"),
            spark.read.parquet(f"{base}/stats"))


def test_bm25_probe_equals_direct_and_prunes_buckets(spark, tmp_path):
    """The persisted-index path returns row-identical results to
    one-shot scoring, and its read materializes only the query terms'
    buckets (measured on scan metrics, same proof as ivf_probe)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import probe_buckets
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans import (
        scan_output_rows,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = str(tmp_path / "inv")
    _write_index_batch(spark, docs, base, "overwrite")
    postings, terms_df, stats = _read_index(spark, base)

    direct = bm25_topk(docs, "doc_id", "text", QUERY, k=15).collect()
    probe = bm25_probe(postings, terms_df, stats, QUERY, k=15, buckets=32)
    assert sorted((r.doc_id, r.score, r.rank) for r in probe.collect()) \
        == sorted((r.doc_id, r.score, r.rank) for r in direct)

    probed = probe_buckets(QUERY, buckets=32)
    hit = postings.where(F.col("term_bucket").isin(probed))
    hit.collect()
    scanned = scan_output_rows(hit)
    total = postings.count()
    assert 0 < scanned < total * 0.5, \
        "bucket predicate must prune partitions, not filter post-scan"


def test_bm25_index_append_equals_rebuild(spark, tmp_path):
    """Ingesting the corpus as two doc-disjoint appended batches gives
    the SAME probe results as one full build — every probe relation is
    additive, so append never rewrites history."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    half1, half2 = docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")

    inc = str(tmp_path / "inc")
    _write_index_batch(spark, half1, inc, "overwrite")
    _write_index_batch(spark, half2, inc, "append")
    full = str(tmp_path / "full")
    _write_index_batch(spark, docs, full, "overwrite")

    got_inc = bm25_probe(*_read_index(spark, inc), QUERY, k=15,
                         buckets=32).collect()
    got_full = bm25_probe(*_read_index(spark, full), QUERY, k=15,
                          buckets=32).collect()
    assert sorted(map(tuple, got_inc)) == sorted(map(tuple, got_full))
    assert len(got_inc) == 15


def test_term_stats_df_t_is_exact(spark):
    """term_stats deltas equal the true per-batch document frequency
    (the probe's idf depends on summed deltas being exact)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import term_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    ts = term_stats(docs, "doc_id", "text", buckets=8)
    truth = (inverted_index(docs, "doc_id", "text", buckets=8)
             .groupBy("term").agg(F.countDistinct("doc_id").alias("n")))
    bad = (ts.join(truth, "term", "full_outer")
           .where(F.coalesce("df_t", F.lit(-1))
                  != F.coalesce("n", F.lit(-2))))
    assert bad.count() == 0


def test_rrf_fuse_hand_example_and_hybrid(spark):
    """RRF on a hand example matches the formula; a doc ranked well in
    BOTH lists beats single-list docs; sources records provenance."""
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id int, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2), (1, 3)], "doc_id int, rank int")
    got = {r.doc_id: r for r in
           rrf_fuse({"sparse": a, "dense": b}, "doc_id", k=60,
                    topk=10).collect()}
    import math
    want = {1: 1 / 61 + 1 / 63, 2: 1 / 62 + 1 / 61, 3: 1 / 63, 4: 1 / 62}
    for d, w in want.items():
        assert math.isclose(got[d].rrf_score, round(w, 6), abs_tol=1e-9)
    assert got[2].rank == 1 and got[1].rank == 2       # both-list docs first
    assert got[2].sources == ["dense", "sparse"]
    assert got[3].sources == ["sparse"]


def test_retrieval_input_contracts(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, "doc_id", "text", [])
    with pytest.raises(ValueError, match="alphanumeric"):
        bm25_topk(docs, "doc_id", "text", ["two words"])
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse({}, "doc_id")


def test_bm25_probe_many_matches_per_query_probes(spark, tmp_path):
    """The batch probe equals one bm25_probe per query, in one job:
    shared pruned read, per-query window ranking; a query with only
    out-of-corpus terms contributes zero rows."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import bm25_probe_many

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = str(tmp_path / "inv")
    _write_index_batch(spark, docs, base, "overwrite")
    idx = _read_index(spark, base)

    queries = {
        "q_spark": ["spark", "window"],
        "q_merge": ["merge", "batch"],
        "q_scan": ["scan"],
        "q_missing": ["zzzunseen"],
    }
    got = bm25_probe_many(*idx, queries, k=7, buckets=32)
    rows = {}
    for r in got.collect():
        rows.setdefault(r.query_id, []).append((r.doc_id, r.score, r.rank))
    assert "q_missing" not in rows
    for qid, terms in queries.items():
        if qid == "q_missing":
            continue
        want = sorted((r.doc_id, r.score, r.rank) for r in
                      bm25_probe(*idx, terms, k=7, buckets=32).collect())
        assert sorted(rows[qid]) == want, qid
    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        bm25_probe_many(*idx, {}, buckets=32)


def test_rrf_fuse_weights(spark):
    """Weighted RRF: scaling one list's contribution reorders the
    fusion exactly per the w/(k+rank) formula; bad weight names and
    non-positive weights raise."""
    import math

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id int, rank int")
    b = spark.createDataFrame([(2, 1), (1, 2)], "doc_id int, rank int")
    got = {r.doc_id: r for r in
           rrf_fuse({"sparse": a, "dense": b}, "doc_id", k=60,
                    weights={"dense": 3.0}).collect()}
    want1 = 1 / 61 + 3 / 62
    want2 = 1 / 62 + 3 / 61
    assert math.isclose(got[1].rrf_score, round(want1, 6), abs_tol=1e-9)
    assert math.isclose(got[2].rrf_score, round(want2, 6), abs_tol=1e-9)
    assert got[2].rank == 1                   # dense upweight flips it
    with pytest.raises(ValueError, match="unknown rankings"):
        rrf_fuse({"a": a}, "doc_id", weights={"zzz": 2.0})
    with pytest.raises(ValueError, match="> 0"):
        rrf_fuse({"a": a}, "doc_id", weights={"a": 0.0})


def test_query_terms_must_match_tokenizer_alphabet():
    """r7 regression (ADVICE r6, low): validation must use the
    tokenizer's ASCII [a-z0-9] alphabet — str.isalnum() accepts
    Unicode terms that tokens() can never emit, so they'd silently
    score 0."""
    import pytest

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.retrieval import _validated_terms

    assert _validated_terms(["Spark", "42x"]) == ["42x", "spark"]
    for bad in ["café", "日本", "a b", "a-b", ""]:
        with pytest.raises(ValueError):
            _validated_terms([bad])
