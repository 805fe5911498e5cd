"""End-to-end pretraining-data pipeline over the real documents table:
profile → temperature-mixed sampling → exact + MinHash dedup with
cluster delete-lists → quality/PII filtering → chunking → sequence
packing → train/val/test split — every stage a composable
DataFrame → DataFrame operator from this engine, with invariants
asserted at each step. This is the integration shape a user would
actually run; it catches cross-operator schema and semantics drift
that per-operator tests cannot.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    cache_scope, chunk_documents, dup_clusters, hash_split,
    minhash_lsh_pairs, pack_sequences, profile_table,
    stratified_hash_sample, temperature_mix_rates,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions.text import (
    pii_redact, quality_score, tokens,
)
from tests.conftest import SF_DIR


def test_pretraining_pipeline_end_to_end(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    # 1. profile: sanity gates a new source would be checked against
    prof = {r.column: r for r in profile_table(docs).collect()}
    assert prof["doc_id"].n_null == 0
    assert prof["text"].null_frac < 0.01

    # 2. temperature-scaled language mixing, sized to ~70% of corpus
    rates = temperature_mix_rates(docs, "lang", alpha=0.6,
                                  target_rows=int(n_docs * 0.7))
    mixed = stratified_hash_sample(docs, "doc_id", "lang", rates)
    n_mixed = mixed.count()
    assert 0.5 * n_docs < n_mixed <= n_docs

    with cache_scope():
        # 3. near-dup mining -> clusters -> delete list (keep min id)
        pairs = minhash_lsh_pairs(mixed, "text", "doc_id", threshold=0.5)
        clusters = dup_clusters(pairs, "id_a", "id_b")
        # cluster_id IS the min id of each component: drop non-reps
        drop = (clusters.where(F.col("id") != F.col("cluster_id"))
                .select(F.col("id").alias("drop_id")))
        deduped = mixed.join(drop, mixed.doc_id == drop.drop_id,
                             "left_anti")
        n_dedup, n_drop = deduped.count(), drop.count()
        assert n_dedup == n_mixed - n_drop
        assert n_drop > 0              # the corpus does contain dups

        # 4. quality + PII scrub (pure expressions, no shuffle)
        clean = (deduped
                 .withColumn("q", quality_score("text"))
                 .where(F.col("q") > 0.2)
                 .withColumn("text", pii_redact("text")))
        assert clean.where(F.col("text").rlike(
            r"[\w.+-]+@[\w-]+\.[A-Za-z]{2,}")).count() == 0

        # 5. chunk -> token-count -> pack into 256-token bins
        chunks = chunk_documents(clean, "doc_id", "text",
                                 chunk_tokens=64, overlap=16)
        chunks = chunks.withColumn(
            "chunk_id",
            F.col("doc_id") * 10_000 + F.col("chunk_idx"))
        packed = pack_sequences(chunks, "chunk_id", "n_tokens",
                                capacity=256, shards=16)
        assert packed.count() == chunks.count()   # every chunk placed
        # no bin overflows its shard-local token budget at bin start
        bin_tok = (packed.join(chunks, "chunk_id")
                   .groupBy("shard", "bin_id")
                   .agg(F.min("offset").alias("o0")))
        assert bin_tok.where(F.col("o0") >= 256).count() == 0

        # 6. deterministic split of the PACKED units by document
        final = hash_split(packed, "chunk_id",
                           {"train": 0.9, "val": 0.1})
        counts = {r.split: r.n for r in
                  final.groupBy("split").agg(F.count("*").alias("n"))
                  .collect()}
        total = sum(counts.values())
        assert total == packed.count()
        assert 0.8 < counts["train"] / total < 0.97
    spark.catalog.clearCache()


def test_governed_pipeline_end_to_end(spark, tmp_path):
    """The operational/governance companion to the pretraining e2e:
    expectations gate → passage-level cut → quality-classifier scoring
    → best-member near-dedup → token-budget mixing → partitioned sink
    maintained by upsert → drift check against the original profile.
    Every stage is an operator from this engine."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        cache_scope, check_expectations, duplicate_passages, fit_logistic,
        near_dedup, profile_drift, profile_table, remove_duplicate_spans,
        score_logistic, temperature_mix_rates,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
        text_feature_vector, token_count,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        merge_upsert,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. gate the source on declared expectations
    rep = {r.rule: r for r in check_expectations(docs, [
        {"type": "unique", "cols": ["doc_id"]},
        {"type": "not_null", "col": "text"},
        {"type": "row_count_min", "n": 100},
    ]).collect()}
    assert all(r.passed for r in rep.values())

    with cache_scope():
        # 2. cut duplicated passages (keep first occurrence)
        spans = duplicate_passages(docs, "text", "doc_id",
                                   shingle_n=8, min_run=3)
        cut = remove_duplicate_spans(docs, spans, "text", "doc_id")
        assert cut.count() == docs.count()
        assert cut.where("n_removed_tokens > 0").count() > 0

        # 3. quality classifier over engine-built features (noise-
        #    salted labels teach it; the scored column then filters)
        labeled = cut.withColumn(
            "y", (F.col("doc_id") % 2 == 0).cast("int")).withColumn(
            "text2",
            F.when(F.col("y") == 1,
                   F.concat(F.col("text"), F.lit(" !! 000 $$ 111 %%")))
            .otherwise(F.col("text")))
        feats = labeled.select("doc_id", "y",
                               text_feature_vector("text2").alias("f"))
        model = fit_logistic(feats, "f", "y", iters=20, lr=1.0)
        scored = (score_logistic(feats, "f", model)
                  .join(cut, "doc_id")
                  .withColumn("quality", 1.0 - F.col("score")))

        # 4. near-dedup keeping the HIGHEST-quality member
        kept = near_dedup(scored, "text", "doc_id", threshold=0.5,
                          keep_by="quality")
        assert 0 < kept.count() <= scored.count()

        # 5. token-budget mixing rates over the deduped corpus
        sized = kept.withColumn("n_tok", token_count("text"))
        rates = temperature_mix_rates(sized, "lang", alpha=0.7,
                                      size_col="n_tok",
                                      target_rows=10_000)
        assert rates and all(0.0 <= v <= 1.0 for v in rates.values())

    # 6. land in a partitioned table via upsert; re-upsert is a no-op
    path = str(tmp_path / "corpus")
    out = kept.select("doc_id", "lang", "text",
                      F.lit(1).cast("long").alias("ver"))
    out.write.partitionBy("lang").parquet(path)
    merge_upsert(spark, path, out, ["doc_id"], partition_cols=["lang"],
                 order_col="ver")
    assert spark.read.parquet(path).count() == kept.count()

    # 7. drift check: the landed corpus vs the raw profile — doc count
    #    and text stats moved (rows dropped, passages cut), which drift
    #    detection must surface rather than bless
    drifts = profile_drift(
        profile_table(docs.select("doc_id", "lang", "text")),
        profile_table(spark.read.parquet(path)
                      .select("doc_id", "lang", "text")),
        # a governed corpus is monitored tightly: rewritten text
        # content (the passage cuts) IS the signal here
        distinct_rel_tol=0.02)
    assert ("text", "cardinality") in {(r.column, r.drift)
                                       for r in drifts.collect()}
    spark.catalog.clearCache()


def test_llm_curation_pipeline_end_to_end(spark, tmp_path):
    """The whole training-data curation surface composed as one
    pipeline on real testdata: report -> loosened quality filter ->
    decontaminate vs a planted eval set -> near-dedup (with planted
    near-copies) -> train/val/test split -> deterministic epoch
    shuffle -> sequence packing -> write. Invariants checked at each
    stage; the pipeline is deterministic end to end (second run
    byte-identical keeps)."""
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
        corpus_report, decontaminate, deterministic_shuffle, hash_split,
        near_dedup, pack_sequences,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import gopher_keep
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions.text import subword_count
    from tests.conftest import SF_DIR

    raw = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
           .select("doc_id", "text"))
    n_raw = raw.count()
    # plant near-duplicates: 10 docs re-appear with a one-word suffix
    dups = (raw.where("doc_id < 10")
            .select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat("text", F.lit(" suffix")).alias("text")))
    corpus = raw.unionByName(dups)

    # 0) report: loosen exactly the rule the report says gates everything
    rep = {r.metric: r.value for r in
           corpus_report(corpus, "text").collect()}
    assert rep["frac_pass_stopword_hits_ok"] < 0.05
    th = {"min_stopword_hits": 0, "min_words": 30}

    # 1) quality filter (loosened), then decontaminate vs planted evals
    filtered = corpus.where(gopher_keep("text", th))
    n_filtered = filtered.count()
    assert 0 < n_filtered < n_raw + 10
    bench = raw.where("doc_id % 97 = 3").select("doc_id", "text")
    clean = decontaminate(filtered, bench, "doc_id", "text")
    leaked = clean.join(bench.select("doc_id"), "doc_id").count()
    assert leaked == 0                       # no eval doc survives

    # 2) near-dedup removes the planted near-copies (keep smallest id)
    deduped = near_dedup(clean.drop("contamination_ratio"), "text",
                         "doc_id", threshold=0.7)
    spark.catalog.clearCache()
    assert deduped.where("doc_id >= 100000").count() == 0
    n_dedup = deduped.count()

    # 3) disjoint split + deterministic epoch order + packing
    split = hash_split(deduped, "doc_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1})
    sizes = {r.split: r["count"] for r in
             split.groupBy("split").count().collect()}
    assert sum(sizes.values()) == n_dedup
    train = split.where("split = 'train'") \
        .withColumn("n_sub", subword_count("text"))
    ordered = deterministic_shuffle(train, "doc_id", salt="epoch0")
    packed = pack_sequences(ordered, "doc_id", "n_sub",
                            capacity=512, shards=8)
    assert packed.count() == sizes.get("train", 0)
    assert packed.where("offset >= 512").count() == 0

    out = str(tmp_path / "train")
    ordered.join(packed, "doc_id").write.parquet(out)

    # 4) determinism: the same pipeline keeps the same documents
    again = near_dedup(
        decontaminate(corpus.where(gopher_keep("text", th)), bench,
                      "doc_id", "text").drop("contamination_ratio"),
        "text", "doc_id", threshold=0.7)
    spark.catalog.clearCache()
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) \
        == sorted(r.doc_id for r in deduped.select("doc_id").collect())
