"""Portable subword tokenization: a trained vocab artifact applied by
greedy longest-prefix match — tokenizer-ACCURATE token counts for the
operators that budget by tokens (``chunk_documents``,
``pack_sequences``, ``temperature_mix_rates(size_col=)``), replacing
the ``subword_count`` ceil(len/4) proxy (text.py) wherever a real
vocabulary artifact exists.

Why this flavor
---------------
An LLM pipeline prices, packs, and truncates by the MODEL's tokenizer.
The portable core of every production tokenizer (BPE at inference
time, WordPiece, unigram-with-vocab) is: pre-tokenize into words, then
deterministically segment each word against a finite piece vocabulary.
This module implements that core as

1. a **trainer** (:func:`train_subword_vocab`) — classic BPE merge
   learning over a word-frequency table, the frequency aggregation
   distributed and the merge loop driver-side (see Scale below);
2. an **applier** (:func:`make_subword_tokenizer`) with two inference
   modes: the default greedy LONGEST-PREFIX-MATCH segmentation
   (WordPiece-inference style, without the ``##`` continuation
   alphabet): at each step consume the longest vocab piece that
   prefixes the remainder; an unmatched leading character is emitted
   as its own single-char piece (byte fallback), so segmentation
   always terminates with ``concat(pieces) == word`` — deterministic,
   hence SQL-mirrorable (the DuckDB oracle recomputes the exact
   counts with a recursive CTE over the same vocab; see
   tests/test_bpe.py and the q_chunk_documents gate fold). And
   ``mode="merges"`` (:func:`encode_word_merges`): apply the learned
   merges in RANK order — the GPT-2-style rule, byte-faithful to
   ``merges.txt`` artifacts imported from real tokenizers, whose
   merge ORDER longest-match does not always reproduce (tested).

Word pre-tokenization reuses the engine-wide convention
(``text.tokens``: lowercase, split on ``[^a-z0-9]+``) so subword
counts compose with every other text operator.

Scale (100 TB)
--------------
- **Applying** is the hot path and runs fully distributed: one
  Arrow-batched pandas UDF per text batch (this is the brief's case
  (b) — iterative longest-match over a set is not expressible in
  Catalyst built-ins). The vocab rides the pickled UDF closure, which
  PySpark automatically ships via broadcast when large; per-batch word
  memoization exploits the Zipfian repeat rate (most batch tokens are
  cache hits, so per-row cost is a dict lookup, not a segmentation).
- **Training** aggregates word frequencies with ONE distributed
  map-side-combinable groupBy, then caps to the ``top_words`` most
  frequent words before collecting — the standard tokenizer-training
  move (HF tokenizers train on capped/sampled corpora), bounded driver
  state of O(top_words). The cap is REPORTED, not silent: the returned
  artifact's ``stats`` records words kept/dropped and the coverage
  fraction of total word occurrences. The merge loop is classic BPE
  with a pair→words inverted index so each merge touches only the
  words containing the winning pair.

No counterpart exists in the reference (its text handling stops at
JSON field extraction — detect_scenes.py's flattened topic columns);
this is part of the beyond-reference LLM-data surface.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_SPLIT_RE

__all__ = [
    "train_subword_vocab",
    "make_subword_tokenizer",
    "encode_word",
    "encode_word_merges",
]

_WORD_RE = re.compile(TOKEN_SPLIT_RE)


def _words(text: str) -> list[str]:
    """Python twin of text.tokens(): lowercase, split on non-[a-z0-9],
    drop empties. Kept trivially small so the equivalence with the
    Catalyst expression is checkable by eye (and pinned by test)."""
    if not text:
        return []
    return [w for w in _WORD_RE.split(text.lower()) if w]


def encode_word_merges(word: str,
                       merge_ranks: dict[tuple[str, str], int]
                       ) -> list[str]:
    """TRUE BPE inference: start from characters and repeatedly apply
    the LOWEST-RANK adjacent merge (ties to the leftmost) until no
    learned merge applies — the GPT-2-style rule, byte-for-byte what
    a ``merges.txt`` imported from a real tokenizer means. Use
    ``mode="merges"`` when the artifact's merge ORDER is the
    contract; greedy longest-match (:func:`encode_word`) can segment
    differently on such vocabs (tested), though both are lossless."""
    pieces = list(word)
    while len(pieces) > 1:
        best_rank, best_i = None, -1
        for i in range(len(pieces) - 1):
            r = merge_ranks.get((pieces[i], pieces[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pieces[best_i:best_i + 2] = [pieces[best_i]
                                     + pieces[best_i + 1]]
    return pieces


def encode_word(word: str, vocab: frozenset[str] | set[str],
                max_piece_len: int) -> list[str]:
    """Greedy longest-prefix-match segmentation of one word. The
    single deterministic definition every surface shares: the Spark
    UDF, the pure-Python oracle in tests, and the DuckDB recursive-CTE
    mirror all implement exactly this loop."""
    pieces = []
    i, n = 0, len(word)
    while i < n:
        step = None
        for ln in range(min(max_piece_len, n - i), 0, -1):
            cand = word[i:i + ln]
            if cand in vocab:
                step = cand
                break
        if step is None:
            step = word[i]          # unknown char: single-char fallback
        pieces.append(step)
        i += len(step)
    return pieces


def _vocab_set(vocab) -> frozenset[str]:
    pieces = vocab["pieces"] if isinstance(vocab, dict) else vocab
    out = frozenset(pieces)
    if not out:
        raise ValueError("empty subword vocab")
    if any(not p for p in out):
        raise ValueError("subword vocab contains an empty piece")
    return out


class SubwordTokenizer:
    """Applier bound to one vocab artifact. ``pieces_of``/``count_of``
    are Column factories usable anywhere a Catalyst expression is
    (select lists, ``chunk_documents(token_fn=)``); both are ONE
    Arrow-batched pandas UDF with per-batch word memoization.

    ``mode="longest_match"`` (default) segments by greedy longest
    vocab prefix — deterministic and SQL-mirrorable (the gate-verified
    mode). ``mode="merges"`` applies the artifact's learned merges in
    RANK order (:func:`encode_word_merges`) — the faithful inference
    rule for merge lists imported from real BPE tokenizers; requires
    a ``{"merges": [...]}`` artifact (or an explicit pair list)."""

    def __init__(self, vocab, *, mode: str = "longest_match"):
        if mode not in ("longest_match", "merges"):
            raise ValueError("mode must be 'longest_match' or "
                             "'merges'")
        self.mode = mode
        if mode == "merges":
            merges = vocab.get("merges") if isinstance(vocab, dict) \
                else list(vocab)
            if not merges or not all(
                    isinstance(m, (tuple, list)) and len(m) == 2
                    and all(isinstance(s, str) and s for s in m)
                    for m in merges):
                raise ValueError("mode='merges' needs a vocab artifact "
                                 "with a non-empty 'merges' list of "
                                 "(left, right) string pairs")
            self.merge_ranks = {(a, b): i
                                for i, (a, b) in enumerate(merges)}
            # pieces set still exposed (chars + merged symbols)
            pieces = {a + b for a, b in merges} \
                | {s for pair in merges for s in pair}
            self.vocab = frozenset(pieces)
        else:
            self.vocab = _vocab_set(vocab)
            self.merge_ranks = None
        self.max_piece_len = max(len(p) for p in self.vocab)

    def _encode_word(self, w: str) -> list[str]:
        if self.mode == "merges":
            return encode_word_merges(w, self.merge_ranks)
        return encode_word(w, self.vocab, self.max_piece_len)

    # -- pure-Python (driver/tests) surface -----------------------------
    def encode(self, text: str) -> list[str]:
        out = []
        for w in _words(text):
            out.extend(self._encode_word(w))
        return out

    def count(self, text: str) -> int:
        return len(self.encode(text))

    # -- Spark surface --------------------------------------------------
    def pieces_of(self, col: Column | str) -> Column:
        """array<string> of subword pieces for a full text column."""
        enc = self._encode_word

        @F.pandas_udf("array<string>")
        def _enc(texts: pd.Series) -> pd.Series:
            memo: dict[str, list[str]] = {}
            out = []
            for t in texts:
                if t is None:
                    out.append([])
                    continue
                row = []
                for w in _words(t):
                    got = memo.get(w)
                    if got is None:
                        got = enc(w)
                        memo[w] = got
                    row.extend(got)
                out.append(row)
            return pd.Series(out)

        return _enc(F.col(col) if isinstance(col, str) else col)

    def count_of(self, col: Column | str) -> Column:
        """bigint exact token count — the drop-in replacement for
        ``subword_count``'s proxy wherever the vocab exists."""
        enc = self._encode_word

        @F.pandas_udf("long")
        def _cnt(texts: pd.Series) -> pd.Series:
            memo: dict[str, int] = {}
            out = []
            for t in texts:
                if t is None:
                    out.append(0)
                    continue
                n = 0
                for w in _words(t):
                    got = memo.get(w)
                    if got is None:
                        got = len(enc(w))
                        memo[w] = got
                    n += got
                out.append(n)
            return pd.Series(out)

        return _cnt(F.col(col) if isinstance(col, str) else col)


def make_subword_tokenizer(vocab, *,
                           mode: str = "longest_match"
                           ) -> SubwordTokenizer:
    """Bind a vocab artifact (a list of pieces, or
    :func:`train_subword_vocab`'s dict) to an applier; see
    :class:`SubwordTokenizer` for the two inference modes."""
    return SubwordTokenizer(vocab, mode=mode)


def train_subword_vocab(df: DataFrame, text_col: str, *,
                        num_merges: int,
                        top_words: int = 100_000,
                        min_pair_freq: int = 2) -> dict:
    """Learn a BPE piece vocabulary from a corpus.

    Distributed part: ONE word-frequency aggregation (explode →
    groupBy word — map-side combinable, shuffle keyed on the word) cut
    to the ``top_words`` most frequent words. Driver part: classic BPE
    — start from single characters, repeatedly merge the most frequent
    adjacent symbol pair (ties broken lexicographically for
    determinism), ``num_merges`` times or until no pair reaches
    ``min_pair_freq``. Cost O(num_merges × words containing the
    winning pair) via a pair→words inverted index; at real vocab sizes
    (30-50k merges) train on a corpus sample — the standard practice —
    or import an externally trained vocab; the APPLIER is the part
    that must scale, and does.

    Returns ``{"pieces": [...], "stats": {...}}`` where stats reports
    the top_words cap's coverage (kept/dropped words and the fraction
    of total word OCCURRENCES the kept words represent) — the cap is
    never silent."""
    from .text import tokens

    if num_merges < 0:
        raise ValueError("num_merges must be >= 0")
    freq_df = (df.select(F.explode(tokens(text_col)).alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("n")))
    total_occ, total_words = (freq_df.agg(
        F.sum("n"), F.count(F.lit(1))).collect()[0])
    top = freq_df.orderBy(F.desc("n"), F.asc("w")).limit(top_words) \
        .collect()
    word_freq = {r["w"]: r["n"] for r in top}
    kept_occ = sum(word_freq.values())

    seqs: dict[str, list[str]] = {w: list(w) for w in word_freq}
    pieces: set[str] = {c for w in word_freq for c in w}
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)
    for w, seq in seqs.items():
        f = word_freq[w]
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic best: max count, then lexicographic pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_freq:
            break
        merged = a + b
        pieces.add(merged)
        merges.append((a, b))
        for w in list(pair_words[(a, b)]):
            seq, f = seqs[w], word_freq[w]
            # remove old pair contributions for this word
            for x, y in zip(seq, seq[1:]):
                pair_counts[(x, y)] -= f
                if pair_counts[(x, y)] <= 0:
                    del pair_counts[(x, y)]
                pair_words[(x, y)].discard(w)
            # apply the merge left-to-right
            new_seq, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    new_seq.append(merged)
                    i += 2
                else:
                    new_seq.append(seq[i])
                    i += 1
            seqs[w] = new_seq
            for x, y in zip(new_seq, new_seq[1:]):
                pair_counts[(x, y)] += f
                pair_words[(x, y)].add(w)

    return {
        "pieces": sorted(pieces),
        "merges": merges,
        "stats": {
            "words_kept": len(word_freq),
            "words_dropped": int(total_words) - len(word_freq),
            "occurrence_coverage": (kept_occ / total_occ
                                    if total_occ else 1.0),
            "num_merges_applied": len(merges),
        },
    }


def subword_vocab_sql(vocab) -> str:
    """DuckDB list literal for the vocab — splice into oracle SQL so
    the gate recomputes the exact same segmentation relationally
    (recursive CTE over :func:`encode_word`'s loop)."""
    pieces = sorted(_vocab_set(vocab))
    quoted = ", ".join("'" + p.replace("'", "''") + "'" for p in pieces)
    return f"[{quoted}]"


def token_fn(vocab) -> Callable[[Column | str], Column]:
    """Convenience: the ``token_fn=`` argument for
    :func:`~..operators.sampling.chunk_documents` — chunk budgets then
    count EXACT subword tokens instead of whitespace words."""
    return make_subword_tokenizer(vocab).pieces_of
