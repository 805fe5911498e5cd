"""Deterministic hash-based corpus sampling.

Training-data pipelines subsample and re-mix corpora constantly
(ablations, per-source mixture weights, held-out splits). At 100 TB the
sample must be (a) a pure narrow filter — no shuffle, no RNG state, no
driver coordination — and (b) reproducible: the same row lands in the
same split on every run, machine, and engine. Spark's ``df.sample`` is
neither (partition-seeded RNG changes with partitioning), so these
operators hash a stable row key instead: row kept iff
``hash64(key) mod 10_000 < rate * 10_000``. The hash is the
DuckDB-portable md5 family (functions/hashing.py), so samples are
oracle-checkable row-for-row.

The reference has no sampling surface at all; this generalizes its
"process a fixed batch" manifest slicing (trigger.py:150-165) to
fractional, stratified slicing of unbounded corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql

_BUCKETS = 10_000


def _bucket(key: Column, salt: str) -> Column:
    """Stable bucket in [0, 10000) from a row key (+ salt so different
    samples of the same corpus are independent)."""
    return F.pmod(hash64(F.concat(F.lit(f"{salt}|"), key.cast("string"))),
                  F.lit(_BUCKETS))


def hash_sample(df: DataFrame, key_col: str, rate: float,
                salt: str = "sample") -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, keyed by
    ``key_col``. Pure filter: runs inside the scan stage, pushes no
    shuffle, and is reproducible across runs and engines."""
    return df.where(_bucket(F.col(key_col), salt)
                    < int(rate * _BUCKETS))


def stratified_hash_sample(df: DataFrame, key_col: str, strata_col: str,
                           rates: dict[str, float],
                           default_rate: float = 0.0,
                           salt: str = "sample") -> DataFrame:
    """Per-stratum sampling rates (source-mixture weighting): each
    stratum value gets its own keep-fraction; unlisted strata get
    ``default_rate``. Still a pure narrow filter — the rate table is
    compiled into a CASE expression, not joined."""
    rate_expr: Column = F.lit(default_rate)
    for value, rate in sorted(rates.items()):
        rate_expr = F.when(F.col(strata_col) == value,
                           F.lit(rate)).otherwise(rate_expr)
    return df.where(_bucket(F.col(key_col), salt)
                    < (rate_expr * _BUCKETS).cast("int"))


def hash_sample_sql(key_expr: str, rate: float,
                    salt: str = "sample") -> str:
    """DuckDB mirror of :func:`hash_sample`'s predicate."""
    h = hash64_sql(f"'{salt}|' || cast({key_expr} as varchar)")
    return f"(({h} % {_BUCKETS} + {_BUCKETS}) % {_BUCKETS})" \
           f" < {int(rate * _BUCKETS)}"


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 128,
                    overlap: int = 32,
                    token_fn=None) -> DataFrame:
    """Split documents into overlapping fixed-token windows —
    ``(id, chunk_idx, n_tokens, chunk_text)`` — the
    pretraining/RAG chunking step (stride = ``chunk_tokens − overlap``;
    chunk k covers token positions ``[k·stride, k·stride +
    chunk_tokens)``; the last chunk may be short; docs shorter than one
    chunk yield a single chunk 0).

    Relational shape: ``posexplode`` the tokens, explode each token to
    the (at most ``⌈chunk/stride⌉``) chunk ids covering its position,
    then one (id, chunk)-keyed aggregate rebuilds each window's text
    with an order-restoring ``sort_array(collect_list(struct))``. The
    token stream is materialized once, every expression around the
    ObjectHashAggregate is codegen, and the only shuffle key is
    (id, chunk) — skew bounded by the chunk size itself.

    ``token_fn`` overrides the tokenization (default
    ``text.tokens`` — whitespace-ish words): pass a
    :class:`~..functions.bpe.SubwordTokenizer`'s ``pieces_of`` (or
    :func:`~..functions.bpe.token_fn`) to budget chunks by EXACT
    model-tokenizer counts instead of word counts — same relational
    shape, the explode source is just the pieces array."""
    from ..functions.text import tokens
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    if token_fn is None:
        token_fn = tokens
    stride = chunk_tokens - overlap
    tok = df.select(F.col(id_col),
                    F.posexplode(token_fn(text_col)).alias("_pos", "_w"))
    k_lo = F.greatest(
        F.lit(0).cast("long"),
        F.ceil((F.col("_pos") - chunk_tokens + 1) / float(stride)).cast("long"))
    k_hi = F.floor(F.col("_pos") / stride).cast("long")
    ch = tok.select(id_col, "_pos", "_w",
                    F.explode(F.sequence(k_lo, k_hi)).alias("chunk_idx"))
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("_pos", "_w"))),
        lambda s: s["_w"])
    return (ch.groupBy(id_col, "chunk_idx")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.concat_ws(" ", ordered).alias("chunk_text")))


def chunk_documents_sentences(df: DataFrame, id_col: str,
                              text_col: str,
                              chunk_tokens: int = 128,
                              token_fn=None,
                              boundary: str = "bin") -> DataFrame:
    """Sentence-boundary chunking (r9) — the RAG-friendly splitter
    that never cuts mid-sentence: documents split into sentences
    (:func:`~..functions.text.split_sentences`, Java∩RE2 heuristic),
    then consecutive sentences group into chunks under a token
    budget. Output ``(id, chunk_idx, n_sentences, n_tokens,
    chunk_text)``; ``chunk_text`` joins the chunk's sentences with
    one space.

    Two disciplines:

    - ``boundary="bin"`` (default) — PURE CATALYST and
      SQL-mirrorable (driver-gated): sentence s belongs to chunk
      ``floor(tokens_before_s / chunk_tokens)``, i.e. fixed
      token-position bins snapped to sentence starts. One window
      cumsum + one (id, chunk) aggregate; a chunk may overrun the
      budget by at most one sentence's tokens (deterministic,
      documented).
    - ``boundary="greedy"`` — EXACT greedy reset packing (a chunk
      closes when the next sentence would overflow; a single
      sentence longer than the budget gets its own chunk). The reset
      is inherently sequential per document, so this runs as one
      Arrow-batched ``applyInPandas`` over (id)-grouped sentence
      rows — per-doc state only, one shuffle on id; never expressible
      as a fixed-depth relational plan, hence the honest Python
      fallback (module discipline: Arrow where a builtin genuinely
      can't).

    ``token_fn`` as in :func:`chunk_documents` (pass a
    :class:`~..functions.bpe.SubwordTokenizer`'s ``pieces_of`` for
    exact model-tokenizer budgets)."""
    from ..functions.text import split_sentences, tokens
    if boundary not in ("bin", "greedy"):
        raise ValueError(f"boundary must be 'bin' or 'greedy', "
                         f"got {boundary!r}")
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if token_fn is None:
        token_fn = tokens
    sent = (df.select(F.col(id_col),
                      F.posexplode(split_sentences(text_col))
                      .alias("_sidx", "_sent"))
            .withColumn("_ntok",
                        F.size(token_fn(F.col("_sent")))
                        .cast("long")))
    if boundary == "bin":
        w = (Window.partitionBy(id_col).orderBy("_sidx")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
        before = (F.sum("_ntok").over(w) - F.col("_ntok"))
        ch = sent.withColumn(
            "chunk_idx",
            F.floor(before / chunk_tokens).cast("long"))
        ordered = F.transform(
            F.sort_array(F.collect_list(F.struct("_sidx", "_sent"))),
            lambda x: x["_sent"])
        return (ch.groupBy(id_col, "chunk_idx")
                .agg(F.count(F.lit(1)).alias("n_sentences"),
                     F.sum("_ntok").alias("n_tokens"),
                     F.array_join(ordered, " ").alias("chunk_text")))

    import pandas as pd
    out_schema = (f"{id_col} {dict(df.dtypes)[id_col]}, "
                  f"chunk_idx long, n_sentences long, "
                  f"n_tokens long, chunk_text string")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_sidx")
        rows, cur, cur_tok = [], [], 0
        idx = 0

        def close():
            nonlocal idx, cur, cur_tok
            if cur:
                rows.append((pdf[id_col].iloc[0], idx, len(cur),
                             cur_tok, " ".join(t for t, _ in cur)))
                idx += 1
                cur, cur_tok = [], 0
        for sent_text, ntok in zip(pdf["_sent"], pdf["_ntok"]):
            if cur and cur_tok + ntok > chunk_tokens:
                close()
            cur.append((sent_text, ntok))
            cur_tok += int(ntok)
            if cur_tok >= chunk_tokens:
                close()
        close()
        return pd.DataFrame(rows, columns=[id_col, "chunk_idx",
                                           "n_sentences", "n_tokens",
                                           "chunk_text"])

    return sent.groupBy(id_col).applyInPandas(pack, out_schema)


def pack_sequences(df: DataFrame, id_col: str, size_col: str,
                   capacity: int, shards: int = 256) -> DataFrame:
    """Assign each document to a training bin of ~``capacity`` tokens:
    output ``id, shard, bin_id, offset`` where ``offset`` is the
    document's start position inside its bin's token budget.

    Greedy bin packing is inherently sequential, so the scalable form
    shards first: documents are hashed into ``shards`` independent
    streams, and each stream packs by running token count in a
    deterministic order (hash bucket, then id). A bin is
    ``(shard, floor(cum_before / capacity))`` — documents larger than
    ``capacity`` spill over a bin boundary, matching the "pack then
    split at max_seq_len" convention of LLM pretraining loaders.

    Scale shape: ONE shuffle, keyed by the shard hash — each shard's
    window cumsum sorts only |corpus|/shards rows, so there is no
    global-sort single-partition bottleneck, and determinism survives
    repartitioning because the order key is data-derived (hash, id),
    not ``monotonically_increasing_id``.
    """
    shard = F.pmod(hash64(F.concat(F.lit("pack|"),
                                   F.col(id_col).cast("string"))),
                   F.lit(shards))
    w = (Window.partitionBy("shard")
         .orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (df.select(id_col, F.col(size_col).alias("_n"),
                     shard.alias("shard"))
           .withColumn("_cum", F.sum("_n").over(w)))
    cum_before = F.col("_cum") - F.col("_n")
    return out.select(
        id_col,
        F.col("shard"),
        F.floor(cum_before / capacity).cast("bigint").alias("bin_id"),
        F.pmod(cum_before, F.lit(capacity)).cast("bigint").alias("offset"))


def deterministic_shuffle(df: DataFrame, key_col: str,
                          salt: str = "shuffle",
                          num_partitions: int | None = None) -> DataFrame:
    """Reproducible pseudo-random training order: every row gets
    ``_order = hash64(salt|key)`` and the frame comes back
    range-partitioned + sorted on it — globally shuffled for the data
    loader, identical on every run/engine/input-partitioning (the
    property ``df.orderBy(rand())`` loses the moment anything moves),
    and a different ``salt`` (e.g. ``"epoch3"``) is a fresh
    independent permutation of the same corpus.

    Scale shape: ``repartitionByRange`` on the hash + per-partition
    sort — physically the same distributed range-exchange + local
    sort a global ``orderBy`` plans, but with the order key PERSISTED
    (``_order`` survives the write, so a reader can verify the order
    or merge shards) and derived from data, not a RNG. Range
    boundaries are sampled, so exact row→file placement may vary
    between runs while the cross-file order stays fixed. DuckDB
    mirror: ``order by md5-hash64(salt|key)``."""
    h = hash64(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string")))
    out = df.withColumn("_order", h)
    if num_partitions is not None:
        out = out.repartitionByRange(num_partitions, "_order")
    else:
        out = out.repartitionByRange("_order")
    return out.sortWithinPartitions("_order")


def hash_split(df: DataFrame, key_col: str,
               fractions: dict[str, float],
               salt: str = "split",
               split_col: str = "split") -> DataFrame:
    """Deterministic, disjoint train/val/test assignment: one
    ``split_col`` label per row, allocated by consecutive hash-bucket
    ranges in sorted-label order. The same row gets the same split on
    every run, engine, and partitioning (the property random splits
    lose the moment data moves), and membership is a pure projection —
    no shuffle, no RNG. Fractions must sum to ≤ 1; remainder rows get
    NULL (i.e. held out entirely)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = _bucket(F.col(key_col), salt)
    expr: Column = F.lit(None).cast("string")
    hi = 0
    for label, frac in sorted(fractions.items()):
        lo, hi = hi, hi + int(frac * _BUCKETS)
        expr = F.when((b >= lo) & (b < hi), F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)


def reservoir_sample(df: DataFrame, key_col: str, k: int,
                     by: list[str] | None = None,
                     salt: str = "reservoir") -> DataFrame:
    """Fixed-**size** deterministic uniform sample: exactly
    ``min(k, group_size)`` rows (per group when ``by`` is given, else
    globally). The distributed equivalent of reservoir sampling — keep
    the ``k`` rows whose salted hash priority is smallest — except the
    "reservoir" is a pure order statistic of a stable hash, so the
    result is identical on every run, engine, and partitioning, and a
    row's membership survives corpus growth unless a lower-priority row
    displaces it (the same subset-stability hash_sample has, but with a
    guaranteed output size instead of a rate).

    Scale shape: the global form compiles to ``TakeOrderedAndProject``
    — each task keeps its local top-``k`` and the driver merges
    ``k × partitions`` candidates, no global sort, no single-partition
    shuffle. The grouped form is one ``row_number`` window keyed on
    ``by`` (one exchange; skew bounded by group size, same stance as
    top_k_per_group)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pri = hash64(F.concat(F.lit(f"{salt}|"),
                          F.col(key_col).cast("string")))
    if not by:
        return (df.withColumn("_pri", pri)
                .orderBy("_pri", key_col).limit(k).drop("_pri"))
    w = Window.partitionBy(*by).orderBy(pri.asc(), F.col(key_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn"))


def weighted_sample(df: DataFrame, key_col: str, weight_col: str, k: int,
                    by: list[str] | None = None,
                    salt: str = "wsample") -> DataFrame:
    """Deterministic weighted sample without replacement of exactly
    ``min(k, group_size)`` rows — Efraimidis–Spirakis A-ES: each row
    draws ``u ∈ (0,1)`` and is ranked by ``ln(u) / w`` (descending ⇔
    ``u^(1/w)`` descending), so a row's inclusion probability scales
    with its weight and the sample is drawn *without replacement* in
    one pass. ``u`` is derived from the salted row-key hash instead of
    an RNG, making the draw reproducible across runs, engines, and
    partitioning. Rows with NULL or non-positive weight are excluded
    (they can never be sampled).

    Scale shape: identical to :func:`reservoir_sample` —
    ``TakeOrderedAndProject`` globally, one ``row_number`` window per
    group."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = 1 << 40
    u = (F.pmod(hash64(F.concat(F.lit(f"{salt}|"),
                                F.col(key_col).cast("string"))),
                F.lit(m)) + 0.5) / float(m)
    score = F.log(u) / F.col(weight_col).cast("double")
    out = df.where(F.col(weight_col).isNotNull()
                   & (F.col(weight_col) > 0))
    if not by:
        return (out.withColumn("_sc", score)
                .orderBy(F.col("_sc").desc(), F.col(key_col).asc())
                .limit(k).drop("_sc"))
    w = Window.partitionBy(*by).orderBy(F.col("_sc").desc(),
                                        F.col(key_col).asc())
    return (out.withColumn("_sc", score)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn", "_sc"))


def reservoir_sample_sql(key_expr: str, k: int, by_exprs: list[str],
                         salt: str = "reservoir") -> str:
    """DuckDB mirror of :func:`reservoir_sample`'s grouped predicate —
    a ``QUALIFY row_number()`` clause fragment (the caller supplies the
    surrounding SELECT)."""
    h = hash64_sql(f"'{salt}|' || cast({key_expr} as varchar)")
    part = f"partition by {', '.join(by_exprs)} " if by_exprs else ""
    return (f"row_number() over ({part}order by {h} asc, "
            f"{key_expr} asc) <= {k}")


def temperature_mix_rates(df: DataFrame, strata_col: str,
                          alpha: float = 0.7,
                          target_rows: int | None = None,
                          size_col: str | None = None
                          ) -> dict[str, float]:
    """Per-stratum sampling rates from temperature-scaled counts — the
    multilingual/multi-domain mixing rule (sample stratum s
    proportionally to ``count(s)^alpha``; alpha<1 up-weights small
    domains). Returns a rates dict for
    :func:`stratified_hash_sample`.

    ``size_col`` switches the unit of account from rows to that
    column's sum (e.g. a token count): published pretraining mixtures
    are sized in TOKENS, and a domain of few huge documents would
    otherwise be over-weighted by a row-count rule. With it,
    ``target_rows`` is interpreted in the same unit (a token budget).

    Driver-side by design: the grouped counts are one aggregate row
    per stratum (domains/languages — thousands at most, the same class
    of metadata as a batch manifest), and the resulting dict compiles
    into the sampler's CASE expression. With ``target_rows`` the rates
    are scaled so the expected sample size is ~that many units
    (rates cap at 1.0 — a stratum can't yield more than it has).
    """
    measure = (F.sum(F.col(size_col)) if size_col
               else F.count(F.lit(1)))
    raw = {r["s"]: r["n"] for r in
           df.groupBy(F.col(strata_col).alias("s"))
             .agg(measure.alias("n")).collect()}
    # a stratum whose size sum is 0/NULL (all-empty or all-NULL
    # size_col) has nothing to sample: rate 0.0, excluded from weights
    zero = {s for s, n in raw.items() if not n}
    counts = {s: n for s, n in raw.items() if n}
    if not counts:
        return {s: 0.0 for s in zero}
    weights = {s: n ** alpha for s, n in counts.items()}
    wsum = sum(weights.values())
    n_total = sum(counts.values())
    target = n_total if target_rows is None else target_rows
    rates = {s: min(1.0, (weights[s] / wsum) * target / counts[s])
             for s in counts}
    rates.update({s: 0.0 for s in zero})
    return rates
