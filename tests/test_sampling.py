"""Deterministic hash-sampling operators (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    hash_sample, stratified_hash_sample,
)


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string"))
        .alias("source"))


def test_hash_sample_rate_and_determinism(spark):
    df = _corpus(spark)
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.25).collect()}
    b = {r.doc_id for r in hash_sample(df, "doc_id", 0.25).collect()}
    assert a == b                       # reproducible, not RNG-seeded
    assert 0.18 < len(a) / 2000 < 0.32  # ~rate (hash-binomial spread)
    # nested property: a lower-rate sample with the same salt is a
    # subset of the higher-rate one (bucket < threshold is monotone)
    c = {r.doc_id for r in hash_sample(df, "doc_id", 0.10).collect()}
    assert c <= a
    # different salt -> independent sample
    d = {r.doc_id for r in
         hash_sample(df, "doc_id", 0.25, salt="other").collect()}
    assert d != a


def test_stratified_rates_per_stratum(spark):
    df = _corpus(spark)
    out = stratified_hash_sample(
        df, "doc_id", "source",
        {"src0": 1.0, "src1": 0.5}, default_rate=0.0).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, 0)
        by_src[r.source] += 1
    assert by_src.get("src0") == 500          # rate 1.0 keeps everything
    assert 180 < by_src.get("src1", 0) < 320  # ~0.5 of 500
    assert "src2" not in by_src and "src3" not in by_src


def test_hash_sample_is_narrow_filter(spark):
    """No exchange in the plan — the sample must run in the scan stage."""
    df = _corpus(spark)
    plan = hash_sample(df, "doc_id", 0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_invariants(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import pack_sequences
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 * 100 + 50).alias("n_tok"))
    out = pack_sequences(df, "doc_id", "n_tok", capacity=1000,
                         shards=4).collect()
    assert len(out) == 100
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    sizes = {r.doc_id: r.n_tok for r in df.collect()}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:  # offsets replay the per-shard running sum
            assert r.bin_id == cum // 1000
            assert r.offset == cum % 1000
            cum += sizes[r.doc_id]
    # deterministic across recomputation
    again = pack_sequences(df, "doc_id", "n_tok", capacity=1000,
                           shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_chunk_documents_windows(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import chunk_documents
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),   # 10 tokens
         (2, "a b"),                              # shorter than one chunk
         (3, "")],                                # no tokens -> no chunks
        "doc_id long, text string")
    got = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
           for r in chunk_documents(df, "doc_id", "text",
                                    chunk_tokens=4, overlap=2).collect()}
    # stride 2: chunks cover [0,4) [2,6) [4,8) [6,10) [8,12)
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (4, "t2 t3 t4 t5")
    assert got[(1, 2)] == (4, "t4 t5 t6 t7")
    assert got[(1, 3)] == (4, "t6 t7 t8 t9")
    assert got[(1, 4)] == (2, "t8 t9")            # short tail
    assert got[(2, 0)] == (2, "a b")
    assert {k[0] for k in got} == {1, 2}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_hash_split_disjoint_deterministic_and_sized(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import hash_split

    df = _corpus(spark, 5000)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(df, "doc_id", fr)
    rows = out.collect()
    # total coverage (fractions sum to 1) and per-split sizing
    by = {}
    for r in rows:
        by.setdefault(r.split, set()).add(r.doc_id)
    assert set(by) == {"train", "val", "test"}
    assert abs(len(by["train"]) / 5000 - 0.8) < 0.04
    assert abs(len(by["val"]) / 5000 - 0.1) < 0.03
    # disjoint and exhaustive
    assert sum(len(v) for v in by.values()) == 5000
    # deterministic under repartitioning
    again = {(r.doc_id, r.split)
             for r in hash_split(df.repartition(17), "doc_id", fr).collect()}
    assert again == {(r.doc_id, r.split) for r in rows}
    # membership is decided per row key, independent of which other
    # rows are present (the streaming/sharded-ingest property)
    half = hash_split(df.where("doc_id < 2500"), "doc_id", fr).collect()
    assert {(r.doc_id, r.split) for r in half} == \
        {(r.doc_id, r.split) for r in rows if r.doc_id < 2500}


def test_hash_split_remainder_is_held_out(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import hash_split

    out = hash_split(_corpus(spark), "doc_id", {"train": 0.5})
    n_null = out.where(F.col("split").isNull()).count()
    assert abs(n_null / 2000 - 0.5) < 0.05
    import pytest
    with pytest.raises(ValueError):
        hash_split(_corpus(spark), "doc_id", {"a": 0.7, "b": 0.4})


def test_temperature_mix_rates_upweights_small_domains(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        stratified_hash_sample, temperature_mix_rates,
    )
    # skewed corpus: src0 has 8x the rows of src3
    df = spark.range(4400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 3200, "big").when(F.col("id") < 4000, "mid")
         .otherwise("small").alias("source"))
    rates = temperature_mix_rates(df, "source", alpha=0.5,
                                  target_rows=1000)
    # alpha<1: small domains keep a larger fraction of themselves
    assert rates["small"] > rates["mid"] > rates["big"]
    # expected sample size ~ target
    exp = sum(rates[s] * n for s, n in
              {"big": 3200, "mid": 800, "small": 400}.items())
    assert abs(exp - 1000) < 1
    # rates cap at 1.0 even when the target exceeds the corpus
    capped = temperature_mix_rates(df, "source", alpha=0.1,
                                   target_rows=100_000)
    assert all(v <= 1.0 for v in capped.values())
    # and the rates drive the actual sampler
    got = stratified_hash_sample(df, "doc_id", "source", rates).count()
    assert abs(got - exp) < 0.15 * exp


def test_profile_table_one_pass_long_format(spark):
    """profile_table: per-column stats from ONE scan (single agg),
    correct null/distinct/range/moment values, long-format output."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import profile_table
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    import pytest

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 4.0), (4, "a", 9.0)],
        "id long, s string, v double")
    prof = {r.column: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert prof["id"].n_rows == 4 and prof["id"].n_null == 0
    assert prof["s"].n_null == 1 and abs(prof["s"].null_frac - 0.25) < 1e-9
    assert prof["s"].approx_distinct == 2
    assert prof["id"].min_str == "1" and prof["id"].max_str == "4"
    assert abs(prof["v"].mean - 14.0 / 3) < 1e-9
    assert prof["s"].mean is None and prof["s"].stddev is None
    # one scan, no per-column jobs: exactly one leaf node in the plan
    import re
    plan = formatted_plan(profile_table(df))
    leaves = [n for n in re.findall(r"^\(\d+\) (\w+)", plan, re.M)
              if "Scan" in n]
    assert len(leaves) == 1
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])


def _py_hash64(s: str) -> int:
    """Pure-Python mirror of functions.hashing.hash64 (md5 60-bit)."""
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_reservoir_sample_exact_size_and_membership(spark):
    """reservoir_sample: exactly min(k, n) rows, and the EXACT row set
    the hash order statistic predicts (reproduced in pure Python)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import reservoir_sample

    df = _corpus(spark, 500)
    got = sorted(r.doc_id for r in
                 reservoir_sample(df, "doc_id", 40).collect())
    assert len(got) == 40
    expected = sorted(
        sorted(range(500),
               key=lambda i: (_py_hash64(f"reservoir|{i}"), i))[:40])
    assert got == expected
    # k >= n degrades to the full input
    assert reservoir_sample(df, "doc_id", 10_000).count() == 500


def test_reservoir_sample_per_group_and_repartition_stable(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import reservoir_sample

    df = _corpus(spark, 400)
    out = reservoir_sample(df, "doc_id", 7, by=["source"])
    sizes = {r.source: r.n for r in
             out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {f"src{i}": 7 for i in range(4)}
    # identical membership regardless of physical partitioning
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in
               reservoir_sample(df.repartition(13), "doc_id", 7,
                                by=["source"]).collect())
    assert a == b


def test_reservoir_sample_global_is_take_ordered(spark):
    """Global fixed-k compiles to TakeOrderedAndProject — per-task
    local top-k merged on the driver, no global sort exchange."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import reservoir_sample
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )

    plan = formatted_plan(reservoir_sample(_corpus(spark), "doc_id", 10))
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_matches_python_a_es(spark):
    """weighted_sample reproduces the Efraimidis–Spirakis draw computed
    in pure Python, excludes non-positive weights, and a 100x-weight
    row is (near-)always included while being absent from most uniform
    samples of the same size."""
    import math

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import weighted_sample

    n, m = 300, 1 << 40
    rows = [(i, "s", 100.0 if i == 7 else 1.0) for i in range(n)]
    rows.append((n, "s", 0.0))      # never sampled
    rows.append((n + 1, "s", None))  # never sampled
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")

    def score(i, w):
        u = (_py_hash64(f"wsample|{i}") % m + 0.5) / m
        return math.log(u) / w

    expected = sorted(
        sorted(range(n), key=lambda i: (-score(i, 100.0 if i == 7 else 1.0),
                                        i))[:25])
    got = sorted(r.doc_id for r in
                 weighted_sample(df, "doc_id", "w", 25).collect())
    assert got == expected
    # the heavy row survives: P(miss) = (1 - 100/399)^25-ish ~ 0
    assert 7 in got
    grouped = weighted_sample(df, "doc_id", "w", 25, by=["source"])
    assert sorted(r.doc_id for r in grouped.collect()) == expected


def test_temperature_mix_rates_token_budget(spark):
    """size_col sizes the mixture in tokens: a domain of few huge docs
    stops being over-weighted by the row rule, and target sizes are
    honored in the token unit."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import temperature_mix_rates

    rows = ([("big", 10_000)] * 10          # 10 docs x 10k tokens
            + [("small", 100)] * 100)       # 100 docs x 100 tokens
    df = spark.createDataFrame(rows, "src string, n_tokens long")

    # alpha<1 up-weights the SMALL stratum — but "small" differs by
    # unit: by rows, big (10 docs) is the minority and gets the boost;
    # by tokens, small (10k tokens vs 100k) is the minority instead
    by_rows = temperature_mix_rates(df, "src", alpha=0.5,
                                    target_rows=50)
    by_tokens = temperature_mix_rates(df, "src", alpha=0.5,
                                      size_col="n_tokens",
                                      target_rows=5000)
    assert by_rows["big"] > by_rows["small"]
    assert by_tokens["small"] > by_tokens["big"]

    # token budget: expected sampled tokens ~ target
    budget = 20_000
    rates = temperature_mix_rates(df, "src", alpha=1.0,
                                  size_col="n_tokens",
                                  target_rows=budget)
    expected = rates["big"] * 100_000 + rates["small"] * 10_000
    assert abs(expected - budget) / budget < 0.01


def test_profile_drift_flags_and_silence(spark):
    """profile_drift: schema/nulls/cardinality/mean drifts are flagged
    with before->after detail; identical profiles emit nothing."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        profile_drift, profile_table,
    )

    old = spark.createDataFrame(
        [(i, float(i % 50), "x") for i in range(1000)],
        "id long, v double, s string")
    new = spark.createDataFrame(
        # v's mean shifts hard; s gains nulls; id becomes string; drop
        # nothing, add column w
        [(str(i), float(i % 50) + 100.0,
          None if i % 4 == 0 else "x", 1.0) for i in range(1000)],
        "id string, v double, s string, w double")
    po, pn = profile_table(old), profile_table(new)
    got = {(r.column, r.drift): r.detail
           for r in profile_drift(po, pn).collect()}
    assert ("id", "schema") in got and "bigint -> string" in got[("id", "schema")]
    assert ("w", "schema") in got and "(absent)" in got[("w", "schema")]
    assert ("s", "nulls") in got
    assert ("v", "mean") in got
    # no drift -> no rows
    assert profile_drift(po, profile_table(old)).count() == 0


def test_profile_drift_null_stats_still_flag(spark):
    """A NULL old stddev (single-row profile) must not suppress a mean
    drift into a false all-clear, and the plan runs the join once."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        profile_drift, profile_table,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )

    old = spark.createDataFrame([(1, 5.0)], "id long, v double")
    new = spark.createDataFrame([(i, 1000.0) for i in range(100)],
                                "id long, v double")
    got = {(r.column, r.drift) for r in
           profile_drift(profile_table(old), profile_table(new)).collect()}
    assert ("v", "mean") in got
    import re
    plan = formatted_plan(profile_drift(profile_table(old),
                                        profile_table(new)))
    # count plan NODES (the formatted output also repeats each node in
    # its detail section)
    joins = re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)\w* \w+ \(\d+\)",
        plan)
    assert len(joins) == 1, joins


def test_deterministic_shuffle_order_matches_duckdb_and_is_stable(spark, duck):
    """The global training order equals DuckDB's order-by on the same
    portable hash, survives input repartitioning, and a different salt
    (epoch) yields a genuinely different permutation."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import deterministic_shuffle
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id")
    seq = [r.doc_id for r in
           deterministic_shuffle(docs, "doc_id").select("doc_id")
           .toLocalIterator()]
    want = [r[0] for r in duck.sql("""
        select doc_id from documents
        order by ('0x' || substring(
            md5('shuffle|' || doc_id::varchar), 1, 15))::BIGINT
    """).fetchall()]
    assert seq == want
    # repartition-stability: same order from a differently-laid-out input
    seq7 = [r.doc_id for r in
            deterministic_shuffle(docs.repartition(7), "doc_id")
            .select("doc_id").toLocalIterator()]
    assert seq7 == seq
    # epoch independence: a different salt is a different permutation
    seq_e2 = [r.doc_id for r in
              deterministic_shuffle(docs, "doc_id", salt="epoch2")
              .select("doc_id").toLocalIterator()]
    assert seq_e2 != seq and sorted(seq_e2) == sorted(seq)


def test_split_sentences_heuristic(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions.text import split_sentences
    df = spark.createDataFrame(
        [(1, 'One two. Three four! "Five?" Six seven.'),
         (2, "no enders at all"),
         (3, "")],
        "id long, text string")
    got = {r["id"]: r["s"] for r in
           df.select("id", split_sentences("text").alias("s"))
           .collect()}
    assert got[1] == ["One two.", "Three four!", '"Five?"',
                      "Six seven."]
    assert got[2] == ["no enders at all"]
    assert got[3] == []


def test_chunk_sentences_bin_and_greedy(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sampling import (
        chunk_documents_sentences,
    )
    # sentences of 2 tokens each; budget 5
    text = "a b. c d. e f. g h. i j."
    df = spark.createDataFrame([(1, text)], "doc long, text string")
    for mode in ("bin", "greedy"):
        rows = sorted(
            chunk_documents_sentences(df, "doc", "text",
                                      chunk_tokens=5,
                                      boundary=mode).collect(),
            key=lambda r: r["chunk_idx"])
        # both modes: sentences never split; all 5 sentences covered
        assert sum(r["n_sentences"] for r in rows) == 5
        joined = " ".join(r["chunk_text"] for r in rows)
        assert joined == text
        if mode == "greedy":
            # exact greedy: 2+2=4 <= 5, +2 would overflow -> chunks
            # of 2,2,1 sentences; no chunk exceeds the budget
            assert [r["n_sentences"] for r in rows] == [2, 2, 1]
            assert all(r["n_tokens"] <= 5 for r in rows)
        else:
            # bin: boundaries at cumulative 5-token marks snapped to
            # sentence starts: before-counts 0,2,4,6,8 -> bins 0,0,0,1,1
            assert [r["n_sentences"] for r in rows] == [3, 2]
            assert [r["n_tokens"] for r in rows] == [6, 4]


def test_chunk_sentences_oversized_sentence(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sampling import (
        chunk_documents_sentences,
    )
    text = "a b c d e f g h. x y."
    df = spark.createDataFrame([(1, text)], "doc long, text string")
    rows = sorted(
        chunk_documents_sentences(df, "doc", "text", chunk_tokens=4,
                                  boundary="greedy").collect(),
        key=lambda r: r["chunk_idx"])
    # the 8-token sentence stands alone (never split), then "x y."
    assert [r["n_tokens"] for r in rows] == [8, 2]
    assert rows[0]["chunk_text"] == "a b c d e f g h."


def test_chunk_sentences_boundary_validation(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sampling import (
        chunk_documents_sentences,
    )
    df = spark.createDataFrame([(1, "x.")], "doc long, text string")
    import pytest as _pt
    with _pt.raises(ValueError, match="boundary"):
        chunk_documents_sentences(df, "doc", "text", boundary="x")
