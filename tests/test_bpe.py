"""Portable subword tokenizer: exact equivalence between the pure-
Python reference loop, the Arrow UDF applier, the DuckDB recursive-CTE
mirror, and the trained-vocab round trip (VERDICT r7 item 3)."""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
    encode_word, make_subword_tokenizer, subword_vocab_sql,
    train_subword_vocab,
)

SF_DIR = "/root/testdata/sf0.001"

PINNED_PIECES = sorted(set(
    list(string.ascii_lowercase + string.digits)
    + ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
       "the", "ing", "and", "ion", "ent", "ati", "for", "ter"]))


def _oracle_count_sql(vocab_sql: str) -> str:
    """DuckDB recursive-CTE twin of encode_word's greedy loop: per
    DISTINCT word, strip the longest vocab piece prefixing the
    remainder (single-char fallback), count steps, join counts back
    to word occurrences. Shared shape with the q_chunk_documents
    gate fold."""
    best = f"""
      coalesce(
        case when len(list_filter({vocab_sql}, p -> starts_with(rem, p))) = 0
             then null
             else list_reduce(
                list_filter({vocab_sql}, p -> starts_with(rem, p)),
                (a, b) -> case when length(b) > length(a)
                          then b else a end)
        end,
        substr(rem, 1, 1))"""
    return f"""
with recursive
tk as (select doc_id,
              unnest(list_filter(string_split_regex(lower(text),
                     '[^a-z0-9]+'), t -> t <> '')) as w
       from documents),
dw as (select distinct w from tk),
seg as (
  select w, w as rem, 0 as n from dw
  union all
  select w, substr(rem, length(best) + 1) as rem, n + 1 as n
  from (select w, rem, n, {best} as best from seg where rem <> '')
),
wc as (select w, max(n) as np from seg where rem = '' group by w)
select tk.doc_id, coalesce(sum(wc.np), 0)::BIGINT as n_bpe
from tk join wc using (w) group by tk.doc_id
"""


words_st = st.text(alphabet="abc0", min_size=1, max_size=12)
vocab_st = st.sets(st.text(alphabet="abc0", min_size=1, max_size=4),
                   min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(word=words_st, extra=vocab_st)
def test_encode_word_properties(word, extra):
    """Lossless segmentation (concat == word), every piece is either a
    vocab entry or a single-char fallback, and greediness: the first
    piece is the LONGEST vocab prefix of the word."""
    vocab = frozenset(extra)
    max_len = max(len(p) for p in vocab)
    pieces = encode_word(word, vocab, max_len)
    assert "".join(pieces) == word
    for p in pieces:
        assert p in vocab or len(p) == 1
    matches = [p for p in vocab
               if word.startswith(p) and len(p) <= max_len]
    if matches:
        assert pieces[0] == max(matches, key=len)
    else:
        assert pieces[0] == word[0]


def test_udf_applier_matches_python_reference(spark):
    """pieces_of/count_of (Arrow UDF, memoized) equal the pure-Python
    loop on real corpus text, including null and empty texts."""
    tok = make_subword_tokenizer(PINNED_PIECES)
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(80)
            .select("doc_id", "text"))
    extra = spark.createDataFrame(
        [(100001, None), (100002, ""), (100003, "The?! 42nd;rule")],
        "doc_id long, text string")
    df = docs.unionByName(extra)
    got = {r["doc_id"]: (r["p"], r["n"]) for r in
           df.select("doc_id", tok.pieces_of("text").alias("p"),
                     tok.count_of("text").alias("n")).collect()}
    for r in df.collect():
        exp = tok.encode(r["text"]) if r["text"] is not None else []
        assert got[r["doc_id"]] == (exp, len(exp)), r["doc_id"]


def test_duckdb_recursive_cte_mirror(spark, duck):
    """The gate-fold shape: per-doc exact subword counts from Spark
    (UDF applier) hash-match the DuckDB recursive CTE over the SAME
    pinned vocab — segmentation is deterministic, so two independent
    implementations agree on every document."""
    tok = make_subword_tokenizer(PINNED_PIECES)
    sdf = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
           .select("doc_id", tok.count_of("text").alias("n_bpe")))
    spark_rows = sorted(tuple(r) for r in sdf.collect())
    duck_rows = sorted(tuple(r) for r in duck.sql(
        _oracle_count_sql(subword_vocab_sql(PINNED_PIECES))).fetchall())
    assert spark_rows == duck_rows and len(spark_rows) > 0


def test_train_subword_vocab_learns_frequent_merges(spark):
    """Training on a corpus dominated by repeated words must learn
    those words as single pieces; the artifact reports its cap stats
    and the trained vocab round-trips through the applier with fewer
    tokens than the char baseline. Deterministic across runs."""
    rows = [(i, "the cat and the hat and the bat") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string")
    art = train_subword_vocab(df, "text", num_merges=12)
    assert "the" in art["pieces"] and "and" in art["pieces"]
    assert art["stats"]["words_dropped"] == 0
    assert art["stats"]["occurrence_coverage"] == 1.0
    art2 = train_subword_vocab(df, "text", num_merges=12)
    assert art["pieces"] == art2["pieces"]
    assert art["merges"] == art2["merges"]

    tok = make_subword_tokenizer(art)
    n = tok.count("the cat and the hat")
    assert n < len("thecatandthehat")        # better than chars
    assert tok.encode("the") == ["the"]

    # top_words cap is reported, never silent
    capped = train_subword_vocab(df, "text", num_merges=4, top_words=2)
    assert capped["stats"]["words_dropped"] > 0
    assert 0 < capped["stats"]["occurrence_coverage"] < 1.0


def test_chunk_documents_with_subword_token_fn(spark):
    """chunk_documents(token_fn=pieces_of) budgets by exact subword
    tokens: equivalent to default chunking over the pre-segmented
    text (pieces are [a-z0-9]+ strings, so space-joining them makes
    tokens() recover exactly the piece stream)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import chunk_documents

    tok = make_subword_tokenizer(PINNED_PIECES)
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(60).select("doc_id", "text"))
    got = chunk_documents(docs, "doc_id", "text", chunk_tokens=16,
                          overlap=4, token_fn=tok.pieces_of)
    pre = docs.select(
        "doc_id",
        F.concat_ws(" ", tok.pieces_of("text")).alias("text"))
    exp = chunk_documents(pre, "doc_id", "text", chunk_tokens=16,
                          overlap=4)
    as_set = lambda d: {tuple(r) for r in d.collect()}  # noqa: E731
    assert as_set(got) == as_set(exp)
    assert got.count() > docs.count()        # chunking happened


def test_vocab_validation():
    with pytest.raises(ValueError, match="empty subword vocab"):
        make_subword_tokenizer([])
    with pytest.raises(ValueError, match="empty piece"):
        make_subword_tokenizer(["a", ""])


def test_pack_and_mix_budget_by_exact_counts(spark):
    """The token-budget consumers run off exact subword counts: bins
    respect capacity w.r.t. the REAL counts (not the whitespace or
    ceil(len/4) proxies), and temperature mixing weights strata by
    exact token mass."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import pack_sequences
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sampling import (
        temperature_mix_rates,
    )

    tok = make_subword_tokenizer(PINNED_PIECES)
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(100)
            .select("doc_id", "lang", "text",
                    tok.count_of("text").alias("n_bpe")))
    packed = pack_sequences(docs, "doc_id", "n_bpe", capacity=512)
    joined = {r["doc_id"]: r for r in packed.collect()}
    counts = {r["doc_id"]: r["n_bpe"] for r in docs.collect()}
    assert set(joined) == set(counts)
    # offsets are mod capacity and bins change exactly when the
    # running exact-count crosses a capacity boundary
    for r in joined.values():
        assert 0 <= r["offset"] < 512

    rates = temperature_mix_rates(docs, "lang", alpha=0.5,
                                  target_rows=50, size_col="n_bpe")
    assert len(rates) >= 2
    # exact-mass weighting: every stratum got a positive rate
    assert all(v > 0 for v in rates.values())


def test_merge_rank_mode_matches_classic_bpe_reference(spark):
    """mode='merges' applies the artifact's merges in RANK order —
    equal to an independent classic-BPE reference loop on the trained
    artifact, and demonstrably DIFFERENT from longest-match on a
    vocab whose merge order matters (the imported-merges.txt case)."""
    rows = [(i, "the cat and the hat and the bat") for i in range(10)]
    art = train_subword_vocab(
        spark.createDataFrame(rows, "id long, text string"),
        "text", num_merges=10)
    tok = make_subword_tokenizer(art, mode="merges")

    def ref(word):
        pieces = list(word)
        ranks = {tuple(p): i for i, p in enumerate(art["merges"])}
        while True:
            cands = [(ranks[(a, b)], i) for i, (a, b)
                     in enumerate(zip(pieces, pieces[1:]))
                     if (a, b) in ranks]
            if not cands:
                return pieces
            _, i = min(cands)
            pieces[i:i + 2] = [pieces[i] + pieces[i + 1]]

    for w in ("the", "cat", "hat", "thecat", "batbat", "xyz", "a"):
        got = tok._encode_word(w)
        assert got == ref(w), w
        assert "".join(got) == w

    # order-sensitivity: merges=[(b,c),(a,b)] -> 'abc' = [a, bc];
    # greedy longest-match over the same piece set takes 'ab' first
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
        encode_word, encode_word_merges,
    )
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert encode_word_merges("abc", ranks) == ["a", "bc"]
    pieces = frozenset({"a", "b", "c", "ab", "bc"})
    assert encode_word("abc", pieces, 2) == ["ab", "c"]

    # the Spark applier runs the same rule (UDF == python, both modes)
    df = spark.createDataFrame(rows[:3], "id long, text string")
    got_rows = df.select(tok.pieces_of("text").alias("p"),
                         tok.count_of("text").alias("n")).collect()
    exp = tok.encode(rows[0][1])
    for r in got_rows:
        assert r["p"] == exp and r["n"] == len(exp)

    with pytest.raises(ValueError, match="merges"):
        make_subword_tokenizer(["a", "b"], mode="merges")
