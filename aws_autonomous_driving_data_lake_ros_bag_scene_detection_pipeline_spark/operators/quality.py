"""Corpus-quality repetition signals (Gopher-style filtering rules).

LLM training corpora are filtered on intra-document repetition: a page
whose text is dominated by one repeated phrase, or whose token stream
has few distinct tokens, is boilerplate/spam. The two standard signals
(duplicate-token fraction and most-frequent-n-gram fraction) have no
counterpart in the reference (its text handling stops at YAML parsing,
service/app/main.py:51-58) but are first-class here alongside
``functions.text``.

Scale notes: the unigram signal is pure narrow expressions (no shuffle
at all). The bigram mode needs an aggregation — expressed as
explode → two-level hash agg keyed (id, bigram) then (id), both with
map-side partial aggregation, joined back on the id. No window sort, no
self-join; every shuffle key includes the document id, so skew is
bounded by the largest single document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def token_repetition(df: DataFrame, id_col: str,
                     text_col: str) -> DataFrame:
    """Per-document repetition stats:

    - ``dup_token_ratio``   = 1 - distinct_tokens / total_tokens
    - ``top_bigram_ratio``  = occurrences of the most frequent word
      bigram / total bigrams (0.0 for documents with < 2 tokens)

    Documents with zero tokens are dropped (no denominator).
    """
    base = df.select(id_col, tokens(text_col).alias("tk")) \
        .where(F.size("tk") > 0)
    # unigram signal: array expressions only — stays in the scan stage
    uni = base.select(
        id_col,
        F.size("tk").alias("n_toks"),
        F.size(F.array_distinct("tk")).alias("n_distinct"))
    # bigrams built in-array (adjacent pairs), then exploded into the
    # (id, bigram) hash-agg; the per-element lambda cost is one concat
    bi = base.where(F.size("tk") >= 2).select(
        id_col,
        F.explode(F.zip_with(
            F.slice("tk", 1, F.size("tk") - 1),
            F.slice("tk", 2, F.size("tk") - 1),
            lambda a, b: F.concat_ws(" ", a, b))).alias("bigram"))
    bistats = (bi.groupBy(id_col, "bigram")
               .agg(F.count(F.lit(1)).alias("c"))
               .groupBy(id_col)
               .agg(F.max("c").alias("top_n"), F.sum("c").alias("n_bi")))
    return (uni.join(bistats, id_col, "left")
            .select(
                id_col,
                F.round(F.lit(1.0) - F.col("n_distinct")
                        / F.col("n_toks").cast("double"), 6)
                .alias("dup_token_ratio"),
                F.coalesce(
                    F.round(F.col("top_n")
                            / F.col("n_bi").cast("double"), 6),
                    F.lit(0.0)).alias("top_bigram_ratio")))


def lm_bigram_score(df: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
    """Corpus-trained bigram LM fluency score per document —
    ``(id, n_bigrams, avg_logprob)`` where ``avg_logprob`` is the mean
    ln P(w2|w1) under the maximum-likelihood bigram model of the corpus
    itself. The cheap stand-in for the perplexity filter every LLM
    corpus pipeline runs (low mean log-prob ⇒ disfluent/garbled text;
    no smoothing needed — every document bigram is in the corpus by
    construction, so probabilities are never zero). Documents with < 2
    tokens are omitted (no bigrams to score).

    Two-pass shape, all hash aggregates: corpus bigram counts
    C(w1,w2) come from one (w1,w2)-keyed agg over the exploded bigram
    stream; context counts C(w1·) reduce those same counts (not the
    raw stream) by w1. Both join back on vocabulary-sized keys —
    unhinted, same AQE reasoning as :func:`tfidf_top_terms` — and the
    final per-document mean is an (id)-keyed agg. Skew is bounded by
    the hottest bigram, which AQE's skew-join splitting handles."""
    base = df.select(F.col(id_col), tokens(text_col).alias("_tk")) \
        .where(F.size("_tk") >= 2)
    bi = base.select(
        F.col(id_col),
        F.explode(F.zip_with(
            F.slice("_tk", 1, F.size("_tk") - 1),
            F.slice("_tk", 2, F.size("_tk") - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))).alias("_bg")
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = c2.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    return (bi.join(c2, ["w1", "w2"]).join(c1, "w1")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg(F.log(F.col("_c2") / F.col("_c1"))), 6)
                  .alias("avg_logprob")))


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF terms per document
    (``id, term, score, rank``), smoothed
    ``idf = ln((N + 1) / (df + 1))``, ties broken by term for
    determinism.

    Scale shape: term frequencies are one (id, term)-keyed hash agg
    over the exploded tokens; document frequencies reduce the same
    relation to vocabulary size and join back on ``term`` with NO
    broadcast hint — on a web-scale corpus the vocabulary (noise
    tokens, typos, numbers) is 10^8+ terms and would blow any broadcast
    threshold, so the plan must degrade to a shuffle join keyed on the
    same ``term`` the df aggregation just hashed on. When the
    vocabulary IS small, AQE's runtime size estimate converts the join
    to broadcast on its own (verified in tests/test_plans.py). The
    corpus row count N joins as a broadcast 1-row literal, not a driver
    collect. The only wide ops are the two hash aggs and the final
    per-document top-k window.
    """
    tf = (df.select(id_col, F.explode(tokens(text_col)).alias("term"))
          .groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .join(F.broadcast(n_docs))
              .withColumn("score", F.round(
                  F.col("tf") * F.log((F.col("n_docs") + 1.0)
                                      / (F.col("df") + 1.0)), 6)))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(id_col, "term", "score", "rank"))


def corpus_report(df: DataFrame, text_col: str) -> DataFrame:
    """One-scan corpus overview → ``(metric, value)`` rows — the first
    thing run on any new corpus: sizes (docs, tokens, chars), mean
    heuristic quality, each Gopher rule's PASS fraction (which rule
    gates what share — per-rule diagnostics, not one opaque number),
    the keep fraction, language mix (the lang-id set is fixed and
    small, so per-language fractions are plain conditional averages),
    and the PII incidence.

    Plan shape: every metric is an aggregate over pure Catalyst
    expressions — ONE scan, ONE aggregate row, melted to long format
    with ``stack`` (driver never sees data, only the final ≤ 20-row
    report). Text expressions are evaluated once per metric family via
    a projection, not re-derived per aggregate."""
    from ..functions.text import (
        LANG_STOPWORDS, gopher_rules, lang_id, pii_count, quality_score,
        token_count,
    )

    rules = gopher_rules(text_col)
    proj = df.select(
        token_count(text_col).alias("_nt"),
        F.length(text_col).cast("bigint").alias("_nc"),
        quality_score(text_col).alias("_q"),
        lang_id(text_col).alias("_lang"),
        (sum((pii_count(text_col, k) for k in ("email", "ipv4", "phone")),
             F.lit(0)) > 0).alias("_pii"),
        *[v.alias(f"_r_{k}") for k, v in rules.items()])
    keep = F.lit(True)
    for k in rules:
        keep = keep & F.col(f"_r_{k}")
    aggs = {
        "n_docs": F.count(F.lit(1)).cast("double"),
        "total_tokens": F.sum("_nt").cast("double"),
        "total_chars": F.sum("_nc").cast("double"),
        "mean_tokens": F.avg("_nt"),
        "mean_quality": F.avg("_q"),
        "frac_pii": F.avg(F.col("_pii").cast("double")),
        "frac_keep": F.avg(keep.cast("double")),
        **{f"frac_pass_{k}": F.avg(F.col(f"_r_{k}").cast("double"))
           for k in rules},
        **{f"frac_lang_{lang}": F.avg((F.col("_lang") == lang)
                                      .cast("double"))
           for lang in sorted([*LANG_STOPWORDS, "und"])},
    }
    wide = proj.agg(*[expr.alias(name) for name, expr in aggs.items()])
    stack_args = ", ".join(f"'{name}', {name}" for name in aggs)
    return (wide.selectExpr(
        f"stack({len(aggs)}, {stack_args}) as (metric, value)")
        .select("metric", F.round("value", 6).alias("value")))
