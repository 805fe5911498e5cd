"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference surface (the reference pipeline has no dedup; SURVEY §7.2
step 6): exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup — each a
pure ``DataFrame -> DataFrame`` transform built from Catalyst expressions
(portable md5-based hashing, see functions/hashing.py) so every stage is
JVM-side and shuffle volume is the only cost.

Scale notes (100 TB corpus, 1000 executors):

- exact dedup: one shuffle on a 60-bit fingerprint; group sizes are tiny
  (true dup clusters), so no skew. ``min(doc_id)`` keeps a deterministic
  representative.
- minhash LSH: per-doc signature is an O(perms × shingles) map-side
  expression (no shuffle); the only shuffle is the band-bucket self-join,
  whose fan-out is controlled by (bands, rows-per-band). Banding with
  r rows makes P(candidate) = 1-(1-j^r)^b — tune so that the verify step
  (exact Jaccard on the candidate pairs only) stays ≪ all-pairs.
- hot buckets (boilerplate shingles) are bounded with ``max_bucket`` to
  keep the self-join skew-safe; AQE skew-join splitting handles the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_seeded
from ..functions.text import fingerprint, shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-identity dedup on the whitespace/case-normalized text
    fingerprint. Returns one row per distinct fingerprint:
    ``(fingerprint, keep_id, n_dups)`` with the smallest id kept."""
    return (df
            .select(fingerprint(text_col).alias("fingerprint"), F.col(id_col))
            .groupBy("fingerprint")
            .agg(F.min(id_col).cast("bigint").alias("keep_id"),
                 F.count(F.lit(1)).alias("n_dups")))


def duplicate_ids(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Ids that would be dropped by :func:`exact_dedup` (non-representative
    members of each fingerprint group)."""
    w = Window.partitionBy(fingerprint(text_col))
    return (df.withColumn("_keep", F.min(id_col).over(w))
              .where(F.col(id_col) != F.col("_keep"))
              .select(F.col(id_col).alias("dup_id"),
                      F.col("_keep").alias("kept_id")))


def minhash_signature(df: DataFrame, text_col: str, id_col: str,
                      num_perm: int = 16, shingle_n: int = 3) -> DataFrame:
    """Attach ``sig`` = array of ``num_perm`` minhash values.

    Each permutation i is min over shingles of a seeded 60-bit hash —
    one map-side expression, no shuffle, vectorized by codegen."""
    sh = shingles(text_col, shingle_n)
    out = df.select(F.col(id_col), sh.alias("_shingles"))

    def seeded(i):
        # factory keeps the lambda single-param (2-param = (elem, idx))
        return lambda s: hash64_seeded(s, i)

    sig = F.array(*[
        F.array_min(F.transform(F.col("_shingles"), seeded(i)))
        for i in range(num_perm)
    ])
    return out.select(id_col, F.col("_shingles").alias("shingles"),
                      sig.alias("sig"))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string-array columns."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      threshold: float = 0.8, num_perm: int = 16,
                      bands: int | None = None, rows_per_band: int = 1,
                      shingle_n: int = 3,
                      max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    Jaccard ≥ ``threshold``.

    Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b``. With the
    default 16 permutations × 1-row bands, a pair with true Jaccard 0.8
    is missed with probability (1-0.8)^16 ≈ 7e-12 — effectively exact,
    while only hash-equal candidates are verified."""
    bands = bands or num_perm // rows_per_band
    sig = minhash_signature(df, text_col, id_col, num_perm, shingle_n)

    band_key = F.explode(F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            hash64(F.concat_ws(",", *[
                F.col("sig")[b * rows_per_band + r].cast("string")
                for r in range(rows_per_band)])).alias("bh"),
        )
        for b in range(bands)
    ])).alias("bk")
    buckets = sig.where(F.size("shingles") > 0).select(id_col, "shingles", band_key)
    buckets = buckets.select(id_col, "shingles",
                             F.col("bk.band").alias("band"),
                             F.col("bk.bh").alias("bh"))

    # Bound pathological buckets (boilerplate-heavy corpora) to keep the
    # self-join skew-safe at scale.
    wcount = Window.partitionBy("band", "bh")
    buckets = (buckets.withColumn("_bn", F.count(F.lit(1)).over(wcount))
               .where(F.col("_bn") <= max_bucket).drop("_bn"))

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (a.join(b, ["band", "bh"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.shingles").alias("sh_a"),
                    F.col("b.shingles").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))

    return (cand
            .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        threshold: float = 0.8, shingle_n: int = 3) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via a shingle inverted index —
    the non-probabilistic reference answer for :func:`minhash_lsh_pairs`.

    Plan: explode distinct shingles → self-join on shingle (only docs
    sharing ≥1 shingle ever meet — never a full cross join) → count
    common shingles per pair → Jaccard from |A|+|B|-common. Shuffle is
    proportional to the inverted-index postings, not n²."""
    sh = (df.select(F.col(id_col), shingles(text_col, shingle_n).alias("sh"))
            .where(F.size("sh") > 0))
    sizes = sh.select(id_col, F.size("sh").alias("n_sh"), F.col("sh"))
    inv = sh.select(id_col, F.explode("sh").alias("shingle"))

    a = inv.alias("a")
    b = inv.alias("b")
    common = (a.join(b, "shingle")
              .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
              .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                       F.col(f"b.{id_col}").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("n_common")))

    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    return (common.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def simhash(df: DataFrame, text_col: str, id_col: str,
            bits: int = 16) -> DataFrame:
    """Per-doc SimHash: sign-aggregated token hashes, ``bits`` wide.

    Bit b of the signature is 1 iff more token hashes have bit b set
    than not. Pure bit-arithmetic expressions; ``bits`` defaults to 16 to
    keep the expression tree small (64 is fine at cluster scale)."""
    t = shingles(text_col, 1)  # distinct unigram tokens
    hashes = F.transform(t, lambda s: hash64(s))

    def bit_set(mask):
        # single-param lambda: a 2-arg lambda would be treated as
        # (element, index) by F.filter
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    bit_cols = []
    for b in range(bits):
        ones = F.size(F.filter(hashes, bit_set(1 << b)))
        bit = F.when(ones * 2 >= F.size(hashes), F.lit(1 << b)).otherwise(F.lit(0))
        bit_cols.append(bit.cast("bigint"))
    sig = bit_cols[0]
    for c in bit_cols[1:]:
        sig = sig + c
    return df.select(F.col(id_col),
                     F.when(F.size(t) > 0, sig).otherwise(F.lit(None))
                      .cast("bigint").alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  bits: int = 16, max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs whose SimHash Hamming distance ≤ ``max_hamming``.

    At this signature width a block join on the high half of the
    signature would be the scale path; with 16-bit signatures the
    self-join on signature proximity is done via a single equi-join on
    the top byte (candidates) + bit_count verify."""
    sh = simhash(df, text_col, id_col, bits).where(F.col("simhash").isNotNull())
    block = (F.col("simhash") / F.lit(1 << (bits // 2))).cast("bigint")
    sh = sh.withColumn("block", block)
    a, b = sh.alias("a"), sh.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, "block")
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    hamming.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))
