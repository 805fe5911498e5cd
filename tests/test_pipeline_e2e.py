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
