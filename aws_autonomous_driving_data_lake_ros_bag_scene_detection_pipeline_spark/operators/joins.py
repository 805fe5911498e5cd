"""Skew-mitigated equi-join (salting).

The reference performs no equi-joins at all (SURVEY §2.3) — but at
100 TB a handful of hot keys (one bag file with 100× the frames, one
boilerplate document cluster) will stall a shuffle join on a single
reducer. AQE's skew-join splitting handles sort-merge joins after the
fact; salting is the plan-level tool when a dimension table is too big
to broadcast and the build side can be replicated.

Semantics are EXACTLY an inner/left equi-join — verified against the
plain join by test and oracle. Mechanics:

- the probe (skewed, large) side gets a deterministic salt in
  [0, salt): ``xxhash64`` of a caller-chosen disambiguating column
  (deterministic → retries/speculative tasks produce identical rows,
  unlike ``rand()``-based salting),
- the build side is replicated ``salt`` times via ``explode``,
- the join key becomes (keys…, salt), so each hot key's rows spread
  over ``salt`` reducers instead of one.

Cost model: replicating the build side multiplies its shuffle volume by
``salt`` — worth it iff build ≪ probe (the usual skew shape). For a
broadcastable build side, just use ``broadcast()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_interval_join(points: DataFrame, intervals: DataFrame,
                         t_col: str, start_col: str, end_col: str,
                         bin_width: float | int,
                         keys: list[str] | None = None,
                         how: str = "inner") -> DataFrame:
    """Point-in-interval join WITHOUT requiring an equi key: bucketize
    time into ``bin_width`` bins, equi-join on the bin (plus optional
    ``keys``), then apply the exact containment residual
    ``start ≤ t ≤ end``.

    Spark has no native band/interval join: a bare range predicate
    plans as BroadcastNestedLoopJoin — O(n·m) compares and a broadcast
    of one whole side — which is the classic 100 TB scale-killer. Each
    interval instead explodes into the ``⌈len/width⌉ + 1`` bins it
    overlaps and each point lands in exactly one bin, so the match
    becomes a hash join on bin with fan-out ``len/width`` per interval
    row. No pair dedup is needed: a (point, interval) pair meets on
    exactly one bin — the point's. Pick ``bin_width`` near the median
    interval length: smaller widths replicate intervals more, larger
    widths put more non-matching pairs through the residual filter.

    ``how='left'`` keeps pointless points (their interval columns
    null), matching ``points.join(intervals, pred, 'left')``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"binned_interval_join supports inner/left, got {how!r}")
    keys = keys or []
    t, s, e = F.col(t_col), F.col(start_col), F.col(end_col)
    p = points.withColumn("_bin", F.floor(t / F.lit(bin_width)))
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(s / F.lit(bin_width)),
                             F.floor(e / F.lit(bin_width)))))
    cond = [p["_bin"] == iv["_bin"],
            *[p[k] == iv[k] for k in keys],
            p[t_col] >= iv[start_col], p[t_col] <= iv[end_col]]
    joined = p.join(iv, reduce_and(cond), how)
    return joined.select(
        *[p[c] for c in points.columns],
        *[iv[c] for c in intervals.columns if c not in (*keys, "_bin")])


def reduce_and(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def salted_join(probe: DataFrame, build: DataFrame, on: list[str],
                salt_by: Column | str, how: str = "inner",
                salt: int = 16) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``on`` with the probe side salted
    ``salt`` ways. ``salt_by`` is any probe column (ideally
    high-cardinality — a row id, a timestamp) used to derive the
    deterministic salt. ``how`` in {inner, left}: the probe side must
    stay the preserved side, since the build side is replicated.

    Column set of the result matches ``probe.join(build, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    sb = F.col(salt_by) if isinstance(salt_by, str) else salt_by
    # null-proof the salt: a null _salt would silently drop probe rows
    # that the plain join keeps
    p = probe.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.coalesce(sb.cast("string"), F.lit(""))),
               F.lit(salt)).cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return p.join(b, [*on, "_salt"], how).drop("_salt")
