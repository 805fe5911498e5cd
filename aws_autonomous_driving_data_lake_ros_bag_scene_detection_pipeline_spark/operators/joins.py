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
