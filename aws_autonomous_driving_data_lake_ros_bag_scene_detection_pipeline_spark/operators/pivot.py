"""Long→wide pivot (SURVEY §2.3 #27; synchronize_topics.py:173-178).

The reference calls ``pivot("topic")`` without explicit values, which
costs an extra distinct scan. Here values are required when known
(they always are — the topic list is config; config.json:21-31), so the
pivot is a single groupBy pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(df: DataFrame, keys: list[str], pivot_col: str,
               value_col: str, values: list[str],
               agg: str = "first") -> DataFrame:
    """``groupBy(keys).pivot(pivot_col, values).agg(agg(value_col))``.

    ``agg='first'`` reproduces the reference's "first wins" dedup policy
    (synchronize_topics.py:177) — note that is nondeterministic without
    an upstream sort; prefer ``max``/``min``/``count`` for testable
    output.
    """
    agg_fn = getattr(F, agg)
    return df.groupBy(*keys).pivot(pivot_col, values).agg(agg_fn(value_col))
