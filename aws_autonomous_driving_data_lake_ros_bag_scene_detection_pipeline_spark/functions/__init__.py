from .bpe import (
    SubwordTokenizer, encode_word, encode_word_merges,
    make_subword_tokenizer,
    subword_vocab_sql, train_subword_vocab,
)
from .hashing import hash64, hash64_seeded, hash64_seeded_sql, hash64_sql
from .text import (
    ENGLISH_STOPWORDS, LANG_STOPWORDS, PII_PATTERNS, PII_REDACTION_ORDER,
    canonical_url, url_host,
    fingerprint, gopher_keep, gopher_rules, html_to_text, lang_id,
    normalize_text,
    pii_count, pii_redact, punct_ratio,
    quality_score, shingles, stopword_ratio, strip_boilerplate_lines,
    subword_count, text_feature_vector, token_count, tokens,
)
from .geo import (
    NAVSATFIX_DEFINITION, WGS84_A, WGS84_F, ecef_from_wgs84,
    enu_from_wgs84,
)
from .vectors import cosine, dot, l2_distance, norm

__all__ = [
    "SubwordTokenizer", "encode_word", "encode_word_merges",
    "make_subword_tokenizer",
    "subword_vocab_sql", "train_subword_vocab",
    "ENGLISH_STOPWORDS", "LANG_STOPWORDS", "PII_PATTERNS",
    "PII_REDACTION_ORDER", "cosine", "dot", "fingerprint",
    "hash64", "hash64_seeded", "hash64_seeded_sql", "hash64_sql", "l2_distance",
    "NAVSATFIX_DEFINITION", "WGS84_A", "WGS84_F", "ecef_from_wgs84",
    "enu_from_wgs84",
    "canonical_url", "url_host",
    "gopher_keep", "gopher_rules", "html_to_text",
    "lang_id", "norm", "normalize_text", "pii_count", "pii_redact", "punct_ratio",
    "quality_score", "shingles",
    "stopword_ratio", "strip_boilerplate_lines", "subword_count",
    "text_feature_vector",
    "token_count", "tokens",
]
