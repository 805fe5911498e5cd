"""Dedup operators: synthetic corpora with known duplicate structure,
plus MinHash-vs-exact agreement on the real documents table."""

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    contamination, dup_clusters, duplicate_ids, exact_dedup,
    minhash_index, minhash_lsh_pairs, minhash_match_pairs,
    ngram_jaccard_pairs,
    simhash, simhash_pairs,
)
from tests.conftest import SF_DIR

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm window sill in the morning sun")


@pytest.fixture(scope="module")
def corpus(spark):
    near = BASE.replace("morning", "evening")          # 1 token changed
    far = "completely different text about spark query engines and shuffles"
    rows = [(0, BASE), (1, BASE), (2, "The  QUICK brown fox jumps over the "
                                      "lazy dog while the cat watches from the warm window "
                                      "sill in the morning sun"),
            (3, near), (4, far)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(corpus):
    got = exact_dedup(corpus, "text", "doc_id").collect()
    by_keep = {r.keep_id: r.n_dups for r in got}
    # 0,1,2 normalize to the same fingerprint; 3 and 4 are singletons
    assert by_keep == {0: 3, 3: 1, 4: 1}


def test_duplicate_ids(corpus):
    got = sorted((r.dup_id, r.kept_id) for r in
                 duplicate_ids(corpus, "text", "doc_id").collect())
    assert got == [(1, 0), (2, 0)]


def test_minhash_finds_near_dup(corpus):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs and 0.5 <= pairs[(0, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_agrees_with_exact_jaccard(corpus):
    mh = {(r.id_a, r.id_b): r.jaccard for r in
          minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.5).collect()}
    ex = {(r.id_a, r.id_b): r.jaccard for r in
          ngram_jaccard_pairs(corpus, "text", "doc_id", threshold=0.5).collect()}
    assert mh == ex


def test_minhash_agrees_with_exact_on_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mh = {(r.id_a, r.id_b): r.jaccard for r in
          minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    ex = {(r.id_a, r.id_b): r.jaccard for r in
          ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    assert mh == ex


def test_minhash_incremental_matches_full_remine(spark):
    """Index-then-probe (the incremental-ingest shape) must surface
    exactly the cross pairs that full re-mining over corpus ∪ batch
    finds between the two sides — no corpus-internal re-mining, same
    recall (identical band hashes on both paths)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.where("doc_id % 2 = 0")
    batch = docs.where("doc_id % 2 = 1")
    idx = minhash_index(corpus, "text", "doc_id", num_perm=32)
    got = {(r.new_id, r.corpus_id): r.jaccard for r in
           minhash_match_pairs(batch, idx, "text", "doc_id",
                               threshold=0.5, num_perm=32).collect()}
    full = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5,
                             num_perm=32).collect()
    expect = {}
    for r in full:
        if r.id_a % 2 != r.id_b % 2:  # cross pairs only
            new_id = r.id_a if r.id_a % 2 == 1 else r.id_b
            corpus_id = r.id_b if r.id_a % 2 == 1 else r.id_a
            expect[(new_id, corpus_id)] = r.jaccard
    assert got == expect
    assert expect, "fixture must produce at least one cross pair"


def test_dup_clusters_components(spark):
    """Min-label propagation must reach the true fixpoint: a path graph
    needs diameter rounds (labels can't shortcut), and disjoint
    components must not merge."""
    # path 10-11-12-13-14 (diameter 4) + pair 20-21 + triangle 30-31-32
    edges = [(11, 10), (11, 12), (13, 12), (13, 14),
             (20, 21), (30, 31), (31, 32), (30, 32)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_dup_clusters_long_chain(spark):
    """A chain whose diameter far exceeds max_iter: plain min-label
    propagation would silently emit split labels after max_iter rounds
    (the r3 audit defect); pointer doubling must converge in O(log d)
    rounds and label the whole chain with its minimum id."""
    n = 200  # diameter 199 >> max_iter=20; log2 convergence needs ~8 rounds
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(n)}


def test_dup_clusters_raises_on_exhausted_iterations(spark):
    """With max_iter too small to converge, the operator must raise
    rather than return wrong labels."""
    edges = [(i, i + 1) for i in range(63)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iter=2)


def test_ngram_jaccard_unigram_shingles(spark, corpus):
    """shingle_n=1 must work (distinct-token Jaccard), not IndexError."""
    got = {(r.id_a, r.id_b): r.jaccard for r in
           ngram_jaccard_pairs(corpus, "text", "doc_id",
                               threshold=0.5, shingle_n=1).collect()}
    assert got.get((0, 1)) == 1.0   # identical docs share all unigrams
    assert (0, 3) in got            # one-token edit stays above 0.5
    with pytest.raises(ValueError, match="shingle_n"):
        ngram_jaccard_pairs(corpus, "text", "doc_id", shingle_n=0)


def test_contamination_unigram_shingles(spark):
    """shingle_n=1 contamination counts distinct-token overlap."""
    docs = spark.createDataFrame([(0, "a b c"), (1, "x y z")],
                                 "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b q")], "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.n_contaminated)
           for r in contamination(docs, bench, "doc_id", "text",
                                  shingle_n=1).collect()}
    assert got == {0: (3, 2), 1: (3, 0)}


def test_contamination_overlap(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j"),          # shares its one 8-gram run
         (1, "a b c d e f g h x y"),          # shares 8-gram "a..h"
         (2, "z z z q w e r t y u"),          # no overlap
         (3, "short text")],                  # < 8 tokens -> 0 shingles
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h i j k l")], "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination_ratio)
           for r in contamination(docs, bench, "doc_id", "text",
                                  shingle_n=8).collect()}
    assert got[0] == (3, 3, 1.0)   # all three 8-grams inside the bench run
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (3, 0, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_simhash_near_dup_small_distance(spark, corpus):
    sh = {r.doc_id: r.simhash for r in simhash(corpus, "text", "doc_id").collect()}
    assert sh[0] == sh[1] == sh[2]
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             simhash_pairs(corpus, "text", "doc_id", max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0


def test_dedup_pipeline_composed_kept_set(spark):
    """The pipeline a user actually ships, end-to-end at the gate's
    sf0.01 scale: minhash pairs → connected components → delete-list →
    final kept set, checked against a DuckDB exact-all-pairs graph with
    a Python union-find fixpoint (fully independent of the Spark path).
    The three stages are individually oracle-checked in the gate; this
    pins their COMPOSITION — cluster ids feeding the delete-list, and
    the kept set being exactly one representative (the min id) per
    component plus all singletons. (sf0.1 composition is covered by
    bench.py's q_dup_clusters; the all-pairs oracle is quadratic, so
    the exactness check stays at gate scale.)"""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    clusters = dup_clusters(pairs)
    delete = {r.id for r in
              clusters.where(F.col("id") != F.col("cluster_id")).collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    kept = all_ids - delete

    con = duckdb.connect()
    con.sql("create view documents as select * from "
            f"read_parquet('{sf_dir}/documents.parquet')")
    oracle_pairs = con.sql(entry.JACCARD_PAIRS_SQL).fetchall()
    con.close()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in oracle_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo  # min-id root => root IS the kept member
    expected_delete = {x for x in parent if find(x) != x}
    assert delete == expected_delete
    assert kept == all_ids - expected_delete
    assert len(pairs.collect()) == len(oracle_pairs)  # same pair graph


def test_simhash_pairs_matches_brute_force(spark):
    """Spec-level recall: the pigeonhole block join must return exactly
    the pairs a brute-force all-pairs Hamming filter returns — no pair
    whose differing bits cluster in one region may be missed."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = 3
    sigs = [(r.doc_id, r.simhash) for r in
            simhash(docs, "text", "doc_id").collect() if r.simhash is not None]
    expected = {}
    for i, (ida, sa) in enumerate(sigs):
        for idb, sb in sigs[i + 1:]:
            h = bin(sa ^ sb).count("1")
            if h <= k:
                expected[(min(ida, idb), max(ida, idb))] = h
    got = {(r.id_a, r.id_b): r.hamming for r in
           simhash_pairs(docs, "text", "doc_id", max_hamming=k).collect()}
    assert got == expected


def _cached_plans(spark) -> bool:
    """True iff Spark's CacheManager holds any cached plan."""
    return not spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_cache_scope_frees_storage_on_exit(spark):
    """Operator-internal caches (minhash signatures) must be freed when
    the cache_scope closes — composed pipelines can't leak blocks."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import cache_scope, minhash_lsh_pairs

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    with cache_scope():
        pairs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
        assert pairs.count() >= 0        # action inside the scope
        assert _cached_plans(spark), "signature frame should be cached"
    assert not _cached_plans(spark), "scope exit must unpersist"


def test_cache_scope_nested_and_unscoped(spark):
    """Inner scopes free only their own frames; persists outside any
    scope keep the old caller-owned lifetime."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import cache_scope
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.caching import (
        register_persist,
    )

    spark.catalog.clearCache()
    outer_df = spark.range(10)
    inner_df = spark.range(20)
    with cache_scope():
        register_persist(outer_df).count()
        with cache_scope():
            register_persist(inner_df).count()
            assert inner_df.storageLevel.useMemory
        assert not inner_df.storageLevel.useMemory   # inner freed
        assert outer_df.storageLevel.useMemory       # outer survives
    assert not outer_df.storageLevel.useMemory

    plain = spark.range(30)
    register_persist(plain).count()                  # no scope active
    assert plain.storageLevel.useMemory              # caller-owned
    plain.unpersist(blocking=True)


def test_near_dedup_one_call(spark, corpus):
    """near_dedup keeps exactly one representative (the smallest id)
    per near-dup cluster and all singletons."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import cache_scope, near_dedup

    with cache_scope():
        kept = sorted(r.doc_id for r in
                      near_dedup(corpus, "text", "doc_id",
                                 threshold=0.5).collect())
    # docs 0,1,2,3 are one near-dup cluster (keep 0); 4 is unrelated
    assert kept == [0, 4]


def test_near_dedup_keep_by_best_score(spark, corpus):
    """keep_by keeps the HIGHEST-scoring cluster member (ties -> the
    smallest id), and NULL scores lose to any non-NULL score."""
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import cache_scope, near_dedup

    scored = corpus.withColumn(
        "quality",
        F.when(F.col("doc_id") == 2, 9.0)
         .when(F.col("doc_id") == 0, F.lit(None).cast("double"))
         .otherwise(1.0))
    with cache_scope():
        kept = sorted(r.doc_id for r in
                      near_dedup(scored, "text", "doc_id",
                                 threshold=0.5, keep_by="quality")
                      .collect())
    # cluster {0,1,2,3}: doc 2 has the top score -> it survives, not 0
    assert kept == [2, 4]

    # ties: all equal scores -> smallest id, matching the default
    tied = corpus.withColumn("quality", F.lit(1.0))
    with cache_scope():
        kept = sorted(r.doc_id for r in
                      near_dedup(tied, "text", "doc_id",
                                 threshold=0.5, keep_by="quality")
                      .collect())
    assert kept == [0, 4]


def test_duplicate_passages_finds_shared_spans(spark):
    """A quoted passage inside otherwise-distinct documents is found
    with correct offsets and length; short overlaps below min_run and
    unrelated docs produce nothing."""
    import pytest

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import duplicate_passages

    quote = "the quick brown fox jumps over the lazy dog again and again"
    a = "intro words here " + quote + " closing remarks"
    b = "completely different opening text that runs on " + quote
    c = "no shared passages live in this document at all whatsoever"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string")
    out = duplicate_passages(df, "text", "doc_id",
                             shingle_n=4, min_run=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    # quote = 12 tokens -> 9 shingles of 4; offsets: a has 3 lead
    # tokens, b has 7
    assert (r.start_a, r.start_b) == (3, 7)
    assert r.n_shingles == 9 and r.n_tokens == 12

    with pytest.raises(ValueError):
        duplicate_passages(df, "text", "doc_id", min_run=0)


def test_duplicate_passages_against_duckdb_oracle(spark, duck):
    """Random corpus with planted repeats: the diagonal-run output
    matches an independent SQL formulation (string-equality shingles,
    gaps-and-islands) on DuckDB."""
    import random

    from tests.conftest import assert_df_matches_oracle
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import duplicate_passages

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    boiler = " ".join(rng.choice(vocab) for _ in range(10))
    docs = []
    for i in range(12):
        words = [rng.choice(vocab) for _ in range(rng.randrange(15, 40))]
        if i % 3 == 0:      # plant the boilerplate block in a third
            at = rng.randrange(0, len(words))
            words[at:at] = boiler.split()
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    duck.sql("drop table if exists pdocs")
    duck.sql("create table pdocs as select * from (values "
             + ",".join(f"({i}, '{t}')" for i, t in docs)
             + ") t(doc_id, text)")
    got = duplicate_passages(df, "text", "doc_id",
                             shingle_n=5, min_run=2)
    assert got.count() > 0  # the planted block is found
    assert_df_matches_oracle(got, duck, """
        with tk as (select doc_id, string_split(text, ' ') as a
                    from pdocs),
        tok as (
          select doc_id, a[i] as w, i - 1 as pos
          from tk, unnest(range(1, len(a) + 1)) as r(i)),
        sh as (
          select t0.doc_id, t0.pos,
                 t0.w || ' ' || t1.w || ' ' || t2.w || ' ' || t3.w
                      || ' ' || t4.w as g
          from tok t0
          join tok t1 on t1.doc_id = t0.doc_id and t1.pos = t0.pos + 1
          join tok t2 on t2.doc_id = t0.doc_id and t2.pos = t0.pos + 2
          join tok t3 on t3.doc_id = t0.doc_id and t3.pos = t0.pos + 3
          join tok t4 on t4.doc_id = t0.doc_id and t4.pos = t0.pos + 4),
        hits as (
          select a.doc_id as id_a, b.doc_id as id_b,
                 a.pos as pos_a, b.pos as pos_b,
                 a.pos - b.pos as diag
          from sh a join sh b on a.g = b.g and a.doc_id < b.doc_id),
        runs as (
          select id_a, id_b, diag,
                 pos_a - row_number() over (partition by id_a, id_b, diag
                                            order by pos_a) as grp,
                 pos_a, pos_b
          from hits)
        select id_a, id_b, min(pos_a) as start_a, min(pos_b) as start_b,
               count(*) as n_shingles, count(*) + 4 as n_tokens
        from runs group by id_a, id_b, diag, grp
        having count(*) >= 2
    """)


def test_remove_duplicate_spans_cuts_later_doc_only(spark):
    """The id_b side loses exactly the duplicated tokens (overlapping
    spans coalesce first), the id_a side and untouched docs keep their
    ORIGINAL text verbatim, and a fully-duplicated doc empties."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        duplicate_passages, remove_duplicate_spans,
    )

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    a = "unique head " + quote + " unique tail"
    b = "other opening words " + quote
    c = quote                       # fully duplicated vs a and b
    d = "completely unrelated content lives here"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string")
    spans = duplicate_passages(df, "text", "doc_id",
                               shingle_n=3, min_run=2)
    out = {r.doc_id: r for r in
           remove_duplicate_spans(df, spans, "text", "doc_id").collect()}
    assert out[1].text == a and out[1].n_removed_tokens == 0
    assert out[4].text == d and out[4].n_removed_tokens == 0
    assert out[2].text == "other opening words"
    assert out[2].n_removed_tokens == 8
    assert out[3].text == "" and out[3].n_removed_tokens == 8


def test_sessionize_rejects_session_id_collision(spark):
    """Silently overwriting a caller's session_id would funnel over
    different attempt boundaries than asked — both operators raise."""
    import pytest

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        funnel_per_session, sessionize,
    )

    df = spark.createDataFrame([(1, 1.0, "view", 7)],
                               "u long, t double, e string, session_id int")
    with pytest.raises(ValueError, match="session_id"):
        sessionize(df, ["u"], "t", gap=10.0)
    with pytest.raises(ValueError, match="session_id"):
        funnel_per_session(df, ["u"], "t", "e", ["view", "click"],
                           gap=10.0)


def test_decontaminate_drops_benchmark_leaks(spark):
    """A doc embedding a full benchmark question vanishes at the
    conservative default; a doc sharing nothing survives with ratio 0;
    raising max_ratio re-admits lightly-overlapping docs."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import decontaminate

    bench_q = ("what is the capital of france and when was it founded "
               "by the romans")
    filler = ("totally unrelated prose about spark window aggregation "
              "strategies and shuffle partitioning behaviour at scale")
    docs = spark.createDataFrame([
        (1, f"intro text {bench_q} trailing text words here"),  # leak
        (2, filler),                                            # clean
        (3, filler + " what is the capital of france and when"),  # 1 shingle
    ], "doc_id int, text string")
    bench = spark.createDataFrame([(100, bench_q)],
                                  "doc_id int, text string")

    strict = decontaminate(docs, bench, "doc_id", "text")
    assert sorted(r.doc_id for r in strict.collect()) == [2]
    loose = decontaminate(docs, bench, "doc_id", "text", max_ratio=0.5)
    got = {r.doc_id: r.contamination_ratio for r in loose.collect()}
    assert set(got) == {2, 3}
    assert got[2] == 0.0 and 0.0 < got[3] <= 0.5
    # original columns survive the filter
    assert "text" in strict.columns
    import pytest as _pt
    with _pt.raises(ValueError, match="max_ratio"):
        decontaminate(docs, bench, "doc_id", "text", max_ratio=1.0)
    with _pt.raises(ValueError, match="unique per-row id"):
        decontaminate(docs, bench.drop("doc_id"), "doc_id", "text")
