"""Text-analysis column functions for the training-data pipeline surface.

All pure Catalyst expressions (split / higher-order array functions /
regexp) — no Python UDFs — so they run inside whole-stage codegen at any
scale. Each helper has a documented DuckDB-SQL mirror used by the oracle
queries in ``__spark_entry__``; tokenization is pinned to a regex both
engines interpret identically (``[^a-z0-9]+`` on lowered text, empties
dropped).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import hash64

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately short — the point is the operator shape
# (argmax over per-language evidence counts), not linguistic coverage.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "und", "die", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "del"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"] + [
    "it", "for", "on", "with", "as", "at", "by", "an", "be", "this",
]


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens, empty strings dropped.

    DuckDB mirror:
    ``list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '')``
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def split_sentences(col: Column | str) -> Column:
    """``array<string>`` of sentences: a separator is inserted after
    every sentence-ender run (``.!?`` plus trailing quotes/brackets)
    followed by whitespace, then the text splits on it — capture +
    re-insert instead of lookbehind, so the pattern stays in the
    Java-regex ∩ RE2 subset and the DuckDB oracle replays it verbatim
    (driver gate: q_chunk_documents ``sent`` branch). A cheap
    heuristic by design (abbreviations like "e.g." split — the
    chunking consumers only need CONSISTENT boundaries, not
    linguistic truth); empty fragments drop. The separator is the
    ASCII record separator (0x1e), which ``normalize_text`` strips
    from real corpora upstream.

    DuckDB mirror::

        list_filter(string_split(regexp_replace(x,
            '([.!?]+["'')\\]]*)[ \\t\\r\\n]+', '\\1' || chr(30), 'g'),
            chr(30)), s -> trim(s) <> '')
    """
    c = F.col(col) if isinstance(col, str) else col
    marked = F.regexp_replace(
        c, "([.!?]+[\"')\\]]*)[ \\t\\r\\n]+", "$1\x1e")
    return F.filter(F.split(marked, "\x1e"),
                    lambda s: F.trim(s) != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def subword_count(col: Column | str, piece_len: int = 4) -> Column:
    """BPE-ish token-count proxy: each word contributes
    ``ceil(len/piece_len)`` subword pieces — the deterministic stand-in
    for a learned-merges tokenizer (which needs a vocabulary artifact
    this engine doesn't ship). Tracks real BPE counts closely enough
    for length-based corpus filtering/pricing, and is exactly
    SQL-mirrorable:
    ``coalesce(list_sum(list_transform(toks, t ->
    ceil(length(t)/4.0))), 0)::BIGINT``."""
    t = tokens(col)
    # coalesce: null text → 0, matching the documented SQL mirror (the
    # aggregate otherwise propagates null through tokens(null))
    return F.coalesce(
        F.aggregate(
            t, F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.ceil(F.length(x) / F.lit(float(piece_len)))
        ).cast("bigint"),
        F.lit(0).cast("bigint"))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), the unit of Jaccard/minhash dedup.

    Built as ``transform(sequence(0, size-n), i -> concat_ws(' ', slice))``
    over the token array; DuckDB mirror uses 1-based ``list_transform(
    range(1, len - n + 2), i -> t[i] || ' ' || ...)``.
    """
    t = tokens(col)
    idx = F.sequence(F.lit(0), F.size(t) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)])
    return F.when(F.size(t) >= n,
                  F.array_distinct(F.transform(idx, gram))
                  ).otherwise(F.array().cast("array<string>"))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.when(F.length(c) > 0,
                  F.length(stripped) / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or ENGLISH_STOPWORDS
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: x.isin(sw)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length in a sane band, low
    punctuation, some stopwords, mean token length in a natural range.
    Mirrors common LLM-corpus filters (C4/Gopher-style rules) as a pure
    expression."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    mean_len = F.when(n_tok > 0, F.length(c) / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.2, 1.0).otherwise(0.0)
    sw_ok = F.when(stopword_ratio(c) >= 0.01, 1.0).otherwise(0.0)
    tok_ok = F.when((mean_len >= 2.0) & (mean_len <= 12.0), 1.0).otherwise(0.0)
    return (len_ok + punct_ok + sw_ok + tok_ok) / 4.0


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts (evidence for :func:`lang_id`)."""
    t = tokens(col)

    def hits(sw):
        return lambda x: x.isin(sw)

    return {lang: F.size(F.filter(t, hits(sw)))
            for lang, sw in LANG_STOPWORDS.items()}


def lang_id(col: Column | str) -> Column:
    """Stopword-evidence language ID: argmax over per-language hit
    counts, 'und' when no list scores > 0; ties break to the first
    language code alphabetically.

    Built as ``greatest(...)`` + a first-match CASE chain so each score
    subexpression appears twice, not once per pairwise comparison —
    keeps the plan tree small enough to read in a 100-TB scan's explain.
    DuckDB mirror: compute scores in a subquery, then the same
    greatest/CASE."""
    scores = lang_scores(col)
    m = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        out = F.when(scores[lang] == m, F.lit(lang)).otherwise(out)
    return F.when(m > 0, out).otherwise(F.lit("und"))


# PII patterns pinned to the Java-regex ∩ RE2 common subset so Spark
# (java.util.regex) and the DuckDB oracle (RE2) count/replace the exact
# same spans: character classes, bounded repetition, \b, \d only — no
# backrefs, no lookaround.
PII_PATTERNS = {
    # local@domain.tld
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad (no octet-range check — detection, not validation)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # international-ish: optional +, then ≥9 digits/spaces/hyphens
    # ending in a digit
    "phone": r"\+?\d[\d -]{7,}\d",
}

# longest-span types first so e.g. the digits of an already-redacted
# email's domain can't be re-matched as a phone; both engines apply the
# same order
PII_REDACTION_ORDER = ("email", "ipv4", "phone")


def pii_count(col: Column | str, kind: str) -> Column:
    """Non-overlapping match count of one PII pattern.

    DuckDB mirror: ``len(regexp_extract_all(x, '<pattern>'))::BIGINT``
    (both engines scan left-to-right, non-overlapping)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind])).cast("bigint")


def pii_redact(col: Column | str) -> Column:
    """Replace every PII span with ``<TYPE>`` placeholders, applying
    :data:`PII_REDACTION_ORDER`.

    DuckDB mirror: nested ``regexp_replace(..., '<pattern>', '<TYPE>',
    'g')`` in the same order."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in PII_REDACTION_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: 60-bit hash of whitespace-normalized lowered
    text — the exact-dedup key that survives formatting noise."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.concat_ws(" ", tokens(c))
    return hash64(normalized)


def normalize_text(col: Column | str, *, lower: bool = False) -> Column:
    """Canonical whitespace/control normalization for web-corpus text:
    strip C0/C1 control characters (keeping \\t \\n), collapse runs of
    horizontal whitespace to one space, collapse 3+ newlines to two
    (paragraph break), trim. Pure regexp chain (codegen; Java∩RE2
    syntax like the PII patterns). ``lower=True`` also case-folds —
    OFF by default because dedup fingerprints already fold case and
    models want original casing."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    c = F.regexp_replace(c, "[ \\t]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")
    c = F.trim(c)
    return F.lower(c) if lower else c


#: query parameters that identify a CLICK, not a page — the standard
#: tracking families stripped by canonical_url
_TRACKING_PARAM_RE = ("(utm_[a-z]+|fbclid|gclid|gclsrc|dclid|msclkid|"
                      "mc_cid|mc_eid|igshid|ref_src|ref_url|_ga|yclid)")


def canonical_url(col: Column | str, *,
                  strip_tracking_params: bool = True) -> Column:
    """Canonical URL form for URL-keyed dedup/grouping (r8): the same
    page fetched via ``HTTP://Example.COM:80/a/?utm_source=x#frag``
    and ``http://example.com/a`` must key identically or URL-level
    dedup silently splits. Pure Catalyst regexp chain (codegen — runs
    at scan speed over crawl manifests):

    - scheme + host lowercased (path/query case PRESERVED — it is
      significant on most servers);
    - default ports dropped (``:80`` http, ``:443`` https);
    - fragment dropped (client-side only);
    - tracking params stripped (``utm_*``, ``fbclid``, ``gclid``, …;
      disable via ``strip_tracking_params=False``), ``?``/``&`` runs
      re-normalized, empty query dropped;
    - trailing slash dropped from non-root paths.

    Deliberately NOT done (correctness over aggression): no
    percent-decoding (decoding can change meaning), no param
    re-sorting (order occasionally matters), no www-stripping (a
    different host). Deterministic, so two crawls of the same page
    agree."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    # lowercase scheme://host[:port] only
    c = F.concat(F.lower(F.regexp_extract(c, "^([^/?#]*://[^/?#]*)", 1)),
                 F.regexp_replace(c, "^[^/?#]*://[^/?#]*", ""))
    # capture-and-restore instead of lookahead (RE2-mirrorable, like
    # the PII patterns): group 3 is the boundary char or empty at $
    c = F.regexp_replace(c, "^(https?://[^/?#:]+):(80|443)([/?#]|$)",
                         "$1$3")
    c = F.regexp_replace(c, "#.*$", "")
    if strip_tracking_params:
        c = F.regexp_replace(c, "([?&])" + _TRACKING_PARAM_RE
                             + "=[^&#]*", "$1")
        c = F.regexp_replace(c, "&{2,}", "&")      # ...&&... runs
        c = F.regexp_replace(c, "\\?&+", "?")      # ?&x -> ?x
        c = F.regexp_replace(c, "[?&]+$", "")      # dangling ?/&
    # trailing slash only off a real path segment — the root slash
    # ("https://example.com/") is left alone (the [^/] guard keeps the
    # "//" of the authority from reading as a segment boundary)
    c = F.regexp_replace(c, "([^/])(/[^/?#]+)/+$", "$1$2")
    return c


def url_host(col: Column | str) -> Column:
    """Lowercased registrable-host column (``parse_url`` JVM builtin)
    — the groupBy key for per-domain corpus stats and crawl-politeness
    accounting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.parse_url(c, F.lit("HOST")))


def strip_boilerplate_lines(col: Column | str,
                            min_words: int = 4,
                            max_link_ratio: float = 0.5) -> Column:
    """Drop boilerplate LINES from a document: lines with fewer than
    ``min_words`` words (nav items, buttons, bullets) or where more
    than ``max_link_ratio`` of the words are URLs (link farms). The
    line filter runs as split → higher-order ``filter`` →
    ``array_join`` — per-line logic without exploding rows, so the doc
    row count (and any id-keyed join downstream) is untouched.

    A deliberately simple, deterministic stand-in for trafilatura-class
    extraction: the Spark-side shape (line-wise predicates inside one
    projection) is the part that matters at 100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")

    def keep(line):
        words = F.filter(F.split(F.trim(line), "[ \\t]+"),
                         lambda w: w != F.lit(""))
        n = F.size(words)
        links = F.size(F.filter(
            words, lambda w: w.rlike("^https?://|^www\\.")))
        return (n >= F.lit(min_words)) & \
            (links <= F.lit(max_link_ratio) * n)

    return F.array_join(F.filter(lines, keep), "\n")


def html_to_text(col: Column | str) -> Column:
    """Relational HTML → plain text (r8): the extraction step between
    :func:`~..sources.warc.read_warc` and ``strip_boilerplate_lines``
    — one chain of JVM ``regexp_replace`` projections, zero Python
    workers, so it runs at scan speed over 10⁵ archive files.

    Passes: (1) drop non-content elements wholesale (script / style /
    noscript / template / head, plus comments); (2) turn
    block-closing tags into newlines so block boundaries survive as
    line boundaries (what ``strip_boilerplate_lines``' line
    predicates key on); (3) erase remaining tags; (4) decode the
    common named entities (``&amp;`` LAST so ``&amp;lt;`` decodes to
    the literal ``&lt;``, not ``<``); (5) normalize whitespace to
    single spaces / single newlines. A deterministic, auditable
    stand-in for trafilatura-class extraction — the Spark-side shape
    (pure Catalyst, composes with the quality/dedup operators) is the
    100 TB point; numeric character references are left as-is
    (documented limitation).

    Patterns are pinned to the Java-regex ∩ RE2 subset (no
    backreferences, no lookaround) — same discipline as the PII
    patterns — so the DuckDB oracle replays the chain verbatim
    (driver gate: q_text_stats ``web_fp``)."""
    c = F.col(col) if isinstance(col, str) else col
    # one pass per non-content element instead of a backreferenced
    # alternation (`</\1>` is Java-only; RE2 has no backreferences)
    for tag in ("script", "style", "noscript", "template", "head"):
        c = F.regexp_replace(
            c, rf"(?is)<{tag}\b.*?</{tag}[ \t\n\r\f]*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/table|/section"
           r"|/article|/blockquote|/ul|/ol|/header|/footer|/nav)"
           r"\b[^>]*/?>",
        "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", "\""), ("&#39;", "'"),
                     ("&apos;", "'"), ("&amp;", "&")):
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, "[ \\t\\x0B\\f\\r]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    c = F.regexp_replace(c, "\\n{2,}", "\n")
    # Spark's trim strips spaces only — newlines need the regex form
    return F.regexp_replace(F.trim(c), "^\\n+|\\n+$", "")


def text_feature_vector(col: Column | str) -> Column:
    """Cheap per-document feature vector (``array<double>``, fixed
    order) for the trainable quality head
    (:func:`~..operators.classifier.fit_logistic`): log length, token
    count, mean token length, punctuation / stopword / digit /
    uppercase ratios, and the per-language stopword-hit scores. All
    Catalyst expressions — featurizing 100 TB is a projection inside
    the scan. Feature order is part of the contract (a fitted model
    encodes it): [log1p_chars, log1p_tokens, mean_tok_len, punct,
    stop_en, digit, upper, lang_scores…alphabetical]."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tok = token_count(c).cast("double")
    digits = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    uppers = F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast("double")
    feats = [
        F.log1p(n_chars),
        F.log1p(n_tok),
        F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0)),
        punct_ratio(c).cast("double"),
        stopword_ratio(c).cast("double"),
        F.when(n_chars > 0, digits / n_chars).otherwise(F.lit(0.0)),
        F.when(n_chars > 0, uppers / n_chars).otherwise(F.lit(0.0)),
    ]
    scores = lang_scores(c)
    feats += [scores[k].cast("double") for k in sorted(scores)]
    return F.array(*feats)


# The published Gopher corpus-filter thresholds (Rae et al. 2021,
# "Scaling Language Models: Methods, Analysis & Insights from Training
# Gopher", table A1). Kept as a visible dict so a pipeline can tighten/
# loosen individual rules without re-deriving the expressions.
GOPHER_THRESHOLDS = {
    "min_words": 50, "max_words": 100_000,
    "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_ratio": 0.9,
    "max_ellipsis_line_ratio": 0.3,
    "min_alpha_word_ratio": 0.8,
    "min_stopword_hits": 2,
}

# the paper's 8-word "required word" list for the stopword rule
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]


def gopher_rules(col: Column | str,
                 thresholds: dict | None = None) -> dict[str, Column]:
    """The Gopher quality-filter rules as named boolean columns — the
    standard first-pass LLM corpus filter, with per-rule diagnostics
    instead of one opaque keep bit (so a corpus report can say WHICH
    rule rejects what fraction). All Catalyst expressions; each rule's
    DuckDB mirror is the same split/list arithmetic (list_filter /
    string_split / length), hash-checked in tests.

    Rules (each True = passes):
    ``word_count_ok``  50 ≤ words ≤ 100k; ``mean_word_len_ok`` mean
    word length in [3, 10]; ``symbol_ratio_ok`` (# + …/...) per word
    ≤ 0.1; ``bullet_ratio_ok`` ≤ 90% of lines start with a bullet;
    ``ellipsis_ratio_ok`` ≤ 30% of lines end with an ellipsis;
    ``alpha_word_ratio_ok`` ≥ 80% of words contain a letter;
    ``stopword_hits_ok`` ≥ 2 distinct required words present.

    Words here are WHITESPACE-split (the paper's unit — punctuation
    stays attached), not :func:`tokens`' alphanumeric runs; both
    engines split on ``\\s+`` and drop empties."""
    th = {**GOPHER_THRESHOLDS, **(thresholds or {})}
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n = F.size(words).cast("double")
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("double")

    mean_len = F.when(
        n > 0,
        F.aggregate(words, F.lit(0).cast("double"),
                    lambda acc, w: acc + F.length(w)) / n)
    hashes = (F.length(c) - F.length(F.replace(c, F.lit("#")))) \
        .cast("double")
    # unicode ellipsis counts once; '...' counts per three dots
    uni_ell = (F.length(c) - F.length(F.replace(c, F.lit("…")))) \
        .cast("double")
    dot_ell = ((F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit(""))))
               / 3).cast("double")
    bullet_lines = F.size(F.filter(
        lines, lambda l: F.ltrim(l).rlike(r"^[-*•]"))).cast("double")
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))) \
        .cast("double")
    alpha_words = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
    stop_hits = F.size(F.array_intersect(
        F.transform(words, F.lower),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))

    return {
        "word_count_ok": (n >= th["min_words"]) & (n <= th["max_words"]),
        "mean_word_len_ok": F.coalesce(
            (mean_len >= th["min_mean_word_len"])
            & (mean_len <= th["max_mean_word_len"]), F.lit(False)),
        "symbol_ratio_ok": F.coalesce(
            F.when(n > 0, (hashes + uni_ell + dot_ell) / n
                   <= th["max_symbol_word_ratio"]), F.lit(False)),
        "bullet_ratio_ok": F.coalesce(
            F.when(n_lines > 0, bullet_lines / n_lines
                   <= th["max_bullet_line_ratio"]), F.lit(False)),
        "ellipsis_ratio_ok": F.coalesce(
            F.when(n_lines > 0, ellipsis_lines / n_lines
                   <= th["max_ellipsis_line_ratio"]), F.lit(False)),
        "alpha_word_ratio_ok": F.coalesce(
            F.when(n > 0, alpha_words / n
                   >= th["min_alpha_word_ratio"]), F.lit(False)),
        "stopword_hits_ok": stop_hits >= th["min_stopword_hits"],
    }


def gopher_keep(col: Column | str,
                thresholds: dict | None = None) -> Column:
    """AND of every :func:`gopher_rules` rule — the keep bit."""
    rules = gopher_rules(col, thresholds)
    out = F.lit(True)
    for r in rules.values():
        out = out & r
    return out
