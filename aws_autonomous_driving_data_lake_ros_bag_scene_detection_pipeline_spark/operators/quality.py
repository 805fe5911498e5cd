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

from pyspark.sql import DataFrame
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
