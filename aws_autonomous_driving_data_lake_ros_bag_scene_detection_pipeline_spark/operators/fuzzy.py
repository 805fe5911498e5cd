"""Edit-distance similarity join (fuzzy matching / record linkage).

Near-duplicate detection by *token overlap* (minhash / n-gram Jaccard,
operators/dedup.py) misses the short-string case — product names, file
paths, entity labels — where "similar" means a handful of character
edits. The standard primitive is the edit-distance join: all pairs with
``levenshtein(a, b) <= max_dist``. The reference has no string
matching at all; this is part of the beyond-reference training-data
surface (entity resolution / label canonicalization before dedup).

Naively this is an all-pairs O(n²) string comparison — the 100 TB
scale-killer. The scalable shape here is q-gram **pigeonhole
blocking** (the count/position filtering family of Gravano et al.,
"Approximate string joins in a database (almost) for free", VLDB 2001):

- one edit (insert/delete/substitute) destroys at most ``q``
  overlapping positional q-grams, so ``k`` edits destroy at most
  ``k·q``. A string with at least ``k·q + 1`` q-grams therefore keeps
  one *intact*, and net insertions/deletions before it shift its
  position by at most ``k``;
- restricting attention to each string's first ``k·q + k + 1``
  positional grams keeps that guarantee for the pair's prefix-role
  side (the surviving gram sits at position ≤ k·q, landing at
  ≤ k·q + k in the partner), so candidates come from ONE inverted
  index self-equi-joined on the gram with the ``|Δpos| ≤ k`` and
  ``|Δlen| ≤ k`` residuals — a hash join with bounded fan-out
  (``k·q + k + 1`` rows per string, independent of string length),
  never a nested-loop;
- strings too short to own ``k·q + 1`` grams can have every gram
  edited, so they flow through a separate short path: explode each
  short row to its ``2k + 1`` admissible partner lengths and equi-join
  on exact length — still no cartesian product, and the short set is
  a sliver of any real corpus;
- survivors are verified with Spark's built-in banded
  ``levenshtein(a, b, threshold)`` (O(k·len) per pair, JVM codegen,
  returns -1 past the threshold — no full DP matrix).

Skew note: the candidate join is an equi-join on the gram value, so a
corpus whose strings share a long common template prefix (all rows
"ITEM-2024-…") concentrates candidates on the template grams — AQE's
skew-join split absorbs moderate cases; for pathological templates
raise ``q`` (longer grams discriminate more) or strip the shared
prefix first, both noted here rather than silently sampled away,
because dropping hot grams would silently drop true pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positional_grams(df: DataFrame, id_col: str, text_col: str,
                      q: int, n_grams: int) -> DataFrame:
    """First ``n_grams`` positional q-grams per row → (id, len, pos,
    gram). Built from a static unrolled ``substring`` array (whole-stage
    codegen; no higher-order transform, which is CodegenFallback — same
    finding as ngram_jaccard_pairs)."""
    grams = F.array(*[F.substring(F.col(text_col), i + 1, q)
                      for i in range(n_grams)])
    return (df.select(F.col(id_col).alias("id"),
                      F.length(text_col).alias("len"),
                      F.posexplode(grams).alias("pos", "gram"))
            .where(F.length("gram") == q))


def edit_distance_pairs(df: DataFrame, text_col: str, id_col: str,
                        max_dist: int = 2, q: int = 2) -> DataFrame:
    """All unordered pairs with ``levenshtein <= max_dist`` →
    ``(id_a, id_b, distance)``, ``id_a < id_b``. Exact — the q-gram
    pigeonhole candidate set provably contains every true pair (module
    docstring), and every candidate is verified with the banded
    levenshtein. Pairs of empty/NULL strings rank as distance =
    partner length like the plain function."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    k = max_dist
    short_max = k * q + q - 1          # fewer than k*q + 1 grams
    window = k * q + k + 1             # prefix-role landing zone

    base = df.select(F.col(id_col).alias("id"),
                     F.col(text_col).alias("txt"),
                     F.length(text_col).alias("len")).where(
                         F.col("txt").isNotNull())

    inv = _positional_grams(base.where(F.col("len") > short_max),
                            "id", "txt", q, window)
    short = base.where(F.col("len") <= short_max)
    s_a = short.select(F.col("id").alias("id_a"),
                       F.explode(F.sequence(F.col("len") - k,
                                            F.col("len") + k))
                        .alias("_l"))
    s_b = short.select(F.col("id").alias("id_b"), F.col("len").alias("_l"))
    short_cand = (s_a.join(s_b, "_l")
                  .where(F.col("id_a") < F.col("id_b"))
                  .select("id_a", "id_b").distinct())
    # long x {long, short} pairs: the long side owns k*q + 1 grams, so
    # the pigeonhole holds with the long side in the prefix role — the
    # short side just has to be IN the index for the join to see it.
    inv_short = _positional_grams(
        short.where(F.col("len") >= q), "id", "txt", q, window)
    mixed = inv.unionByName(inv_short)
    la, lb = mixed.alias("a"), mixed.alias("b")
    mixed_cand = (la.join(lb, "gram")
                  .where((F.col("a.id") < F.col("b.id"))
                         & (F.abs(F.col("a.pos") - F.col("b.pos")) <= k)
                         & (F.abs(F.col("a.len") - F.col("b.len")) <= k))
                  .select(F.col("a.id").alias("id_a"),
                          F.col("b.id").alias("id_b"))
                  .distinct())
    # short strings with len < q (no grams at all) only reach pairs via
    # short_cand; a long string can never pair with len < q when
    # len_long > short_max >= q - 1 + k  fails for k >= ... guard:
    # |Δlen| <= k forces len_long <= len_short + k <= q - 1 + k
    # <= short_max (since k*q >= k), so no long x gramless pair exists.
    cand = mixed_cand.unionByName(short_cand).distinct()

    ta = base.select(F.col("id").alias("id_a"), F.col("txt").alias("_ta"))
    tb = base.select(F.col("id").alias("id_b"), F.col("txt").alias("_tb"))
    dist = F.levenshtein("_ta", "_tb", k)
    return (cand.join(ta, "id_a").join(tb, "id_b")
            .withColumn("distance", dist)
            .where(F.col("distance") >= 0)
            .select("id_a", "id_b",
                    F.col("distance").cast("int").alias("distance")))


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_col: str, right_col: str,
               left_id: str, right_id: str,
               max_dist: int = 2, q: int = 2,
               how: str = "inner") -> DataFrame:
    """Join two tables on approximate string equality:
    ``levenshtein(left_col, right_col) <= max_dist`` → one row per
    matching (left, right) pair with a ``distance`` column (record
    linkage / canonical-label lookup). Same q-gram pigeonhole blocking
    as :func:`edit_distance_pairs`; ``how='left'`` keeps unmatched left
    rows with NULL right columns. Identically-named non-key columns on
    the two sides are carried as-is (alias before joining if you need
    to select them unambiguously downstream)."""
    if how not in ("inner", "left"):
        raise ValueError(f"fuzzy_join supports inner/left, got {how!r}")
    # disjoint id spaces via a side tag, then one self-pair mining pass
    tagged = (left.select(F.col(left_id).cast("string").alias("_rid"),
                          F.col(left_col).alias("_txt"))
              .withColumn("_rid", F.concat(F.lit("L|"), F.col("_rid")))
              .unionByName(
                  right.select(
                      F.col(right_id).cast("string").alias("_rid"),
                      F.col(right_col).alias("_txt"))
                  .withColumn("_rid", F.concat(F.lit("R|"), F.col("_rid")))))
    pairs = edit_distance_pairs(tagged, "_txt", "_rid",
                                max_dist=max_dist, q=q)
    # keep only cross-side pairs, orient as (left, right). Identical
    # (left, right) texts pair at distance 0 like the plain predicate.
    cross = (pairs.where(F.substring("id_a", 1, 2)
                         != F.substring("id_b", 1, 2))
             .select(
                 F.when(F.col("id_a").startswith("L|"), F.col("id_a"))
                  .otherwise(F.col("id_b")).alias("_lid"),
                 F.when(F.col("id_a").startswith("L|"), F.col("id_b"))
                  .otherwise(F.col("id_a")).alias("_rid2"),
                 "distance")
             .select(F.expr("substring(_lid, 3)").alias("_lkey"),
                     F.expr("substring(_rid2, 3)").alias("_rkey"),
                     "distance"))
    lk = left.withColumn("_lkey", F.col(left_id).cast("string"))
    rk = right.withColumn("_rkey", F.col(right_id).cast("string"))
    out = (lk.join(cross, "_lkey", how)
           .join(rk, "_rkey", "inner" if how == "inner" else "left")
           .drop("_lkey", "_rkey"))
    return out
