"""Top-k per group (SURVEY §2.6 #44 generalization).

The reference's only ranked access is ``row_number`` to find first/last
rows per bag (synchronize_topics.py:117-122). A general top-k-per-group
is a window rank + filter: map-side partial sort, one shuffle on the
group key, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, keys: list[str], order_by: list[Column],
                    k: int, method: str = "row_number",
                    keep_rank: bool = False, rank_col: str = "rank") -> DataFrame:
    """Keep the top ``k`` rows per key by ``order_by``.

    ``method`` in {row_number, rank, dense_rank}. Pass fully
    deterministic ``order_by`` (include a unique tiebreaker) when the
    result feeds an exact-match check. ``keep_rank`` exposes the rank as
    a bigint column (matching SQL row_number()).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    rank_fn = getattr(F, method)
    out = (df.withColumn("_rk", rank_fn().over(w))
             .where(F.col("_rk") <= k))
    if keep_rank:
        return out.withColumn(rank_col, F.col("_rk").cast("bigint")).drop("_rk")
    return out.drop("_rk")
