"""Text/vector column functions: hand-checkable values + DuckDB-mirror
parity for the tokenization the dedup oracles depend on."""

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
    cosine, fingerprint, lang_id, punct_ratio, quality_score, shingles,
    token_count, tokens,
)


def _one(spark, text, col):
    return (spark.createDataFrame([(text,)], "text string")
            .select(col.alias("v")).collect()[0].v)


def test_tokens_drop_empties(spark):
    assert _one(spark, "  Hello,  world!! 42 ", tokens("text")) == \
        ["hello", "world", "42"]
    assert _one(spark, "", tokens("text")) == []


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count("text")) == 3


def test_shingles_3gram(spark):
    got = _one(spark, "a b c d", shingles("text", 3))
    assert sorted(got) == ["a b c", "b c d"]
    assert _one(spark, "a b", shingles("text", 3)) == []


def test_tokenization_matches_duckdb(spark, duck):
    texts = ["Hello, World! foo-bar 42", "  x ", "", "a.b.c", "ümlaut ok"]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.t for r in sdf.select(tokens("text").alias("t")).collect()]
    for text, s_toks in zip(texts, got):
        d = duck.execute(
            "select list_filter(string_split_regex(lower(?), '[^a-z0-9]+'),"
            " t -> t <> '')", [text]).fetchone()[0]
        assert s_toks == d, text


def test_punct_and_quality(spark):
    assert _one(spark, "!!!!", punct_ratio("text")) == 1.0
    clean = ("the quick brown fox jumps over the lazy dog and runs far " * 3)
    assert _one(spark, clean, quality_score("text")) == 1.0


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog is here", lang_id("text")) == "en"
    assert _one(spark, "der hund und die katze ist da", lang_id("text")) == "de"
    assert _one(spark, "qqq zzz www", lang_id("text")) == "und"


def test_fingerprint_normalizes_whitespace_case(spark):
    a = _one(spark, "Hello   World", fingerprint("text"))
    b = _one(spark, "hello world", fingerprint("text"))
    c = _one(spark, "hello worlds", fingerprint("text"))
    assert a == b and a != c


def test_cosine_identity(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])],
                               "a array<float>, b array<float>")
    v = df.select(cosine("a", "b").alias("c")).collect()[0].c
    assert abs(v - 1.0) < 1e-9


def test_token_repetition_hand_computed(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import token_repetition
    df = spark.createDataFrame(
        [(1, "a b a b a"),       # tokens: 5, distinct 2; bigrams: ab,ba,ab,ba -> top 2/4
         (2, "x y z"),           # all distinct; bigrams xy,yz -> top 1/2
         (3, "solo"),            # 1 token, no bigrams
         (4, ""),                # zero tokens -> dropped
         ], "doc_id long, text string")
    out = {r.doc_id: (r.dup_token_ratio, r.top_bigram_ratio)
           for r in token_repetition(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] == (round(1 - 2 / 5, 6), 0.5)
    assert out[2] == (0.0, 0.5)
    assert out[3] == (0.0, 0.0)


def test_tfidf_top_terms_hand_computed(spark):
    import math
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import tfidf_top_terms
    # "rare" appears in 1 of 3 docs; "common" in all 3
    df = spark.createDataFrame(
        [(1, "common rare rare"), (2, "common x"), (3, "common y")],
        "doc_id long, text string")
    out = tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    top = {r.doc_id: (r.term, r.score) for r in out}
    assert top[1][0] == "rare"
    assert top[1][1] == round(2 * math.log(4 / 2), 6)
    # "common" (df=3) scores ln(4/4)=0 -> beaten by the unique terms
    assert top[2][0] == "x" and top[3][0] == "y"


def test_pii_count_and_redact(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
        pii_count, pii_redact,
    )
    text = ("mail a.user+tag@sub.example.org or admin@x.io, "
            "server at 192.168.1.100, call +44 20 7946 0958 now")
    df = spark.createDataFrame([(text,), ("clean text, no pii",)],
                               "text string")
    got = df.select(
        pii_count("text", "email").alias("e"),
        pii_count("text", "ipv4").alias("i"),
        pii_count("text", "phone").alias("p"),
        pii_redact("text").alias("r")).collect()
    assert (got[0].e, got[0].i, got[0].p) == (2, 1, 1)
    assert got[0].r == ("mail <EMAIL> or <EMAIL>, "
                        "server at <IPV4>, call <PHONE> now")
    assert (got[1].e, got[1].i, got[1].p) == (0, 0, 0)
    assert got[1].r == "clean text, no pii"


def test_pii_matches_duckdb_regex_semantics(spark, duck):
    """The pinned patterns must count/replace identical spans in Java
    regex (Spark) and RE2 (DuckDB) — the oracle contract for q_pii."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
        PII_PATTERNS, PII_REDACTION_ORDER, pii_count, pii_redact,
    )
    texts = [
        "a@b.co c@d.org 1.2.3.4 +1 555 123 4567",
        "no pii at all", "10.0.0.1x not-a-word-boundary 999.999.999.999",
        "edge@case.museum trailing +123456789",
        "double..dot@ex.com 1.2.3.4.5.6",
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = sdf.select(
        "text",
        *[pii_count("text", k).alias(f"n_{k}") for k in PII_PATTERNS],
        pii_redact("text").alias("red")).collect()
    for r in rows:
        for kind, pat in PII_PATTERNS.items():
            d = duck.execute(
                "select len(regexp_extract_all(?, ?))",
                [r.text, pat]).fetchone()[0]
            assert d == r[f"n_{kind}"], (r.text, kind)
        red = r.text
        for kind in PII_REDACTION_ORDER:
            red = duck.execute(
                "select regexp_replace(?, ?, ?, 'g')",
                [red, PII_PATTERNS[kind], f"<{kind.upper()}>"]).fetchone()[0]
        assert red == r.red, r.text


def test_lm_bigram_score_hand_computed(spark):
    import math
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import lm_bigram_score
    # corpus bigrams: "a b" x2 (docs 1,2), "a c" x1 (doc 2) -> C(a.)=3
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b a c"), (3, "solo")],
        "doc_id long, text string")
    out = {r.doc_id: (r.n_bigrams, r.avg_logprob)
           for r in lm_bigram_score(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}          # doc 3 has no bigrams
    assert out[1] == (1, round(math.log(2 / 3), 6))
    # doc 2: ln(2/3) [a b] + ln(1/1) [b a] + ln(1/3) [a c]
    assert out[2] == (3, round((math.log(2 / 3) + 0.0 + math.log(1 / 3)) / 3, 6))


def test_normalize_text(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions.text import (
        normalize_text,
    )
    rows = [("  a\tb  c \n\n\n\n d\x00e\x1f \n f  ",)]
    df = spark.createDataFrame(rows, "t string")
    out = df.select(normalize_text("t").alias("n")).first()["n"]
    assert out == "a b c\n\nde\nf"
    low = df.select(normalize_text("t", lower=True).alias("n")).first()["n"]
    assert low == "a b c\n\nde\nf"
    # idempotent
    again = df.select(normalize_text(normalize_text("t")).alias("n")) \
        .first()["n"]
    assert again == out


def test_strip_boilerplate_lines(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions.text import (
        strip_boilerplate_lines,
    )
    doc = "\n".join([
        "Home",                                        # < 4 words
        "This is a real paragraph with actual content here.",
        "click http://x.com see www.y.com go http://z.com now",  # 3/7 links ok
        "a http://a.com http://b.com http://c.com",    # 3/4 links -> drop
        "Buy now",                                     # < 4 words
        "Another genuine sentence follows the navigation chrome.",
    ])
    df = spark.createDataFrame([(doc,)], "t string")
    out = df.select(strip_boilerplate_lines("t").alias("s")).first()["s"]
    kept = out.split("\n")
    assert kept == [
        "This is a real paragraph with actual content here.",
        "click http://x.com see www.y.com go http://z.com now",
        "Another genuine sentence follows the navigation chrome.",
    ]
    # plan stays Python-free
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    plan = formatted_plan(df.select(strip_boilerplate_lines("t")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_rules_each_rule_isolates_its_failure(spark):
    """Handcrafted docs each violating exactly one Gopher rule: the
    per-rule diagnostic columns pinpoint it and gopher_keep rejects."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
        gopher_keep, gopher_rules,
    )

    good = ("The quick brown fox jumps over the lazy dog and then "
            "walks back to the barn with a friend that it has known "
            "for years. " * 3)        # ~75 words, natural prose
    docs = {
        "good": good,
        "too_short": "The cat sat with me and that was that to be.",
        "long_words": "The " + " ".join(
            ["knowledge" + "x" * 20] * 80) + " to of and that be have with",
        "symbols": good + " " + "# " * 20,
        "bullets": "\n".join("- item of the list to be that have with"
                             for _ in range(10)) + "\nplain line " +
                   " ".join(["word"] * 60),
        "ellipses": "\n".join(f"line {i} of the story that trails "
                              f"off..." for i in range(10)),
        "numeric": "The data to be of and that have with " +
                   " ".join(str(i) for i in range(60)),
        "no_stopwords": " ".join(f"word{i}" for i in range(60)),
    }
    df = spark.createDataFrame(list(docs.items()), "name string, body string")
    rules = gopher_rules("body")
    out = {r["name"]: r.asDict() for r in
           df.select("name", *[v.alias(k) for k, v in rules.items()],
                     gopher_keep("body").alias("keep")).collect()}

    assert out["good"]["keep"] is True
    assert all(v for k, v in out["good"].items() if k != "name")
    expect_fail = {
        "too_short": "word_count_ok",
        "long_words": "mean_word_len_ok",
        "symbols": "symbol_ratio_ok",
        "bullets": "bullet_ratio_ok",
        "ellipses": "ellipsis_ratio_ok",
        "numeric": "alpha_word_ratio_ok",
        "no_stopwords": "stopword_hits_ok",
    }
    for name, rule in expect_fail.items():
        assert out[name][rule] is False, (name, rule, out[name])
        assert out[name]["keep"] is False


def test_gopher_rules_against_duckdb_oracle(spark, duck):
    """Every rule recomputed as DuckDB list arithmetic on the documents
    table — the per-rule booleans hash-match row for row."""
    from tests.conftest import SF_DIR, assert_df_matches_oracle
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
        gopher_keep, gopher_rules,
    )

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rules = gopher_rules("text")
    got = df.select("doc_id",
                    *[v.alias(k) for k, v in rules.items()],
                    gopher_keep("text").alias("keep"))
    assert_df_matches_oracle(got, duck, r"""
        with w as (
          select doc_id, text,
            list_filter(string_split_regex(text, '\s+'),
                        w -> w <> '') as words,
            string_split(text, chr(10)) as lines
          from documents),
        m as (
          select doc_id, text, words, lines,
            len(words)::double as n, len(lines)::double as n_lines,
            list_sum(list_transform(words,
                     w -> length(w)::double)) / len(words) as mean_len,
            (length(text) - length(replace(text, '#', '')))::double
              + (length(text) - length(replace(text, '…', '')))::double
              + (length(text) - length(replace(text, '...', '')))
                  ::double / 3 as symbols,
            len(list_filter(lines, l ->
                regexp_matches(ltrim(l), '^[-*•]')))::double as bullets,
            len(list_filter(lines, l ->
                regexp_matches(rtrim(l), '(\.\.\.|…)$')))::double as ell,
            len(list_filter(words, w ->
                regexp_matches(w, '[A-Za-z]')))::double as alpha,
            len(list_intersect(list_transform(words, w -> lower(w)),
                ['the','be','to','of','and','that','have','with']))
              as hits
          from w)
        select doc_id,
          n >= 50 and n <= 100000 as word_count_ok,
          coalesce(mean_len >= 3.0 and mean_len <= 10.0, false)
            as mean_word_len_ok,
          coalesce(case when n > 0 then symbols / n <= 0.1 end, false)
            as symbol_ratio_ok,
          coalesce(case when n_lines > 0
                   then bullets / n_lines <= 0.9 end, false)
            as bullet_ratio_ok,
          coalesce(case when n_lines > 0
                   then ell / n_lines <= 0.3 end, false)
            as ellipsis_ratio_ok,
          coalesce(case when n > 0 then alpha / n >= 0.8 end, false)
            as alpha_word_ratio_ok,
          hits >= 2 as stopword_hits_ok,
          (n >= 50 and n <= 100000)
            and coalesce(mean_len >= 3.0 and mean_len <= 10.0, false)
            and coalesce(case when n > 0 then symbols / n <= 0.1 end,
                         false)
            and coalesce(case when n_lines > 0
                         then bullets / n_lines <= 0.9 end, false)
            and coalesce(case when n_lines > 0
                         then ell / n_lines <= 0.3 end, false)
            and coalesce(case when n > 0 then alpha / n >= 0.8 end,
                         false)
            and hits >= 2 as keep
        from m
    """)


def test_corpus_report_exact_on_handcrafted_corpus(spark):
    """Every metric hand-computable on a 4-doc corpus: sizes, quality,
    rule-pass fractions, keep, language mix, PII incidence."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import corpus_report

    good = ("The quick brown fox jumps over the lazy dog and then "
            "walks back to the barn with a friend that it has known "
            "for years. " * 3)
    docs = [
        good,                                        # en, keeps
        "le la et les des est un une " * 4,          # fr, too short
        "contact me at bob@example.com for details", # pii, too short
        " ".join(f"w{i}" for i in range(60)),        # und, no stopwords
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = {r.metric: r.value for r in
           corpus_report(df, "text").collect()}
    assert got["n_docs"] == 4.0
    assert got["frac_lang_en"] == 0.25 and got["frac_lang_fr"] == 0.25
    # docs 3 and 4 hit no language's stopword list -> und
    assert got["frac_lang_und"] == 0.5
    assert got["frac_pii"] == 0.25
    assert got["frac_keep"] == 0.25            # only the good doc
    assert got["frac_pass_word_count_ok"] == 0.5   # good + w0..w59
    assert got["frac_pass_stopword_hits_ok"] == 0.25
    n_tok = sum(len([t for t in d.lower().split() if t]) for d in docs)
    # token_count uses alphanumeric runs; emails split into pieces —
    # just sanity-bound the totals rather than re-deriving the regex
    assert got["total_tokens"] >= n_tok
    assert got["total_chars"] == float(sum(len(d) for d in docs))
    assert 0.0 <= got["mean_quality"] <= 1.0
    assert abs(got["mean_tokens"] - got["total_tokens"] / 4) < 1e-6


def test_corpus_report_single_aggregate_plan(spark, duck):
    """One scan, one aggregate, no Python, no shuffle beyond the final
    1-row agg — and spot-check two metrics against DuckDB on the real
    documents table."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import corpus_report
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = corpus_report(docs, "text")
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        read_schema_columns,
    )

    plan = formatted_plan(rep)
    assert "Python" not in plan
    assert len(read_schema_columns(rep)) == 1      # one leaf scan
    got = {r.metric: r.value for r in rep.collect()}
    want_docs, want_chars = duck.sql(
        "select count(*), sum(length(text)) from documents").fetchone()
    assert got["n_docs"] == float(want_docs)
    assert got["total_chars"] == float(want_chars)


def test_canonical_url_normalization(spark):
    """URL-keyed dedup's canonical form: case/port/fragment/tracking
    variants of one page collapse to one key; genuinely different
    pages stay distinct; path case, param order, and www are
    deliberately preserved."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import canonical_url, url_host

    cases = [
        ("HTTP://Example.COM:80/a/?utm_source=x#frag",
         "http://example.com/a"),
        ("http://example.com/a", "http://example.com/a"),
        ("https://Example.com:443/b?id=1&utm_medium=m&x=2",
         "https://example.com/b?id=1&x=2"),
        ("https://example.com/b?utm_source=a&utm_medium=b",
         "https://example.com/b"),
        ("https://example.com/?fbclid=abc", "https://example.com/"),
        ("https://example.com:8080/c", "https://example.com:8080/c"),
        ("https://example.com/Path/Case", "https://example.com/Path/Case"),
        ("https://www.example.com/a", "https://www.example.com/a"),
        ("https://example.com/a?b=1&a=2", "https://example.com/a?b=1&a=2"),
        ("https://example.com/x/#sec", "https://example.com/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    assert got == [e for _, e in cases]

    hosts = df.select(url_host("url").alias("h")).distinct().collect()
    assert {r["h"] for r in hosts} == {"example.com",
                                       "www.example.com"}

    # tracking stripping is opt-out
    keep = spark.createDataFrame(
        [("https://e.com/a?utm_source=x",)], "url string") \
        .select(canonical_url(
            "url", strip_tracking_params=False).alias("c")) \
        .collect()[0]["c"]
    assert keep == "https://e.com/a?utm_source=x"
