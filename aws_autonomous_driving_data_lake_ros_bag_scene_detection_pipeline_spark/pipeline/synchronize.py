"""Topic synchronization: per-topic streams → one wide 10 Hz table.

Re-expresses the reference's first EMR job (synchronize_topics.py) as a
single lazy Catalyst plan:

| reference step | here |
|---|---|
| per-file loop + union (44-75) | one multi-path read / ``union_by_name`` |
| ``to_json(struct)`` payload (93-98) | optional — typed values by default |
| driver ``collect()`` + per-bag ``spark.range`` grid (111-157) | ``groupBy().agg(min,max)`` + ``sequence``/``explode`` (pure plan) |
| pivot without values (173-178) | pivot with explicit topic list (no distinct scan) |
| global ``orderBy(Time)`` (184) | dropped — the window sort suffices |
| per-topic window fill loop (189-191) | one Window operator (shared spec) |

Scale: two shuffles on the bag keys (bounds agg, window) + the pivot
agg; no driver round trip, no Python. Works unchanged for millions of
bags at 100 TB because the spine is generated executor-side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.timeseries import time_spine


def pack_payload(df: DataFrame, keys: list[str], time_col: str,
                 as_json: bool = False) -> DataFrame:
    """Collapse all non-key columns into one ``payload`` column — the
    reference's ``create_json_payload`` (synchronize_topics.py:93-98).
    ``as_json=True`` reproduces the reference's JSON-string payload;
    default keeps a typed struct so Catalyst can still prune/push."""
    data_cols = [c for c in df.columns if c not in set(keys) | {time_col}]
    payload = F.struct(*data_cols)
    if as_json:
        payload = F.to_json(payload)
    return df.select(*keys, time_col, payload.alias("payload"))


def synchronize_topics(topic_dfs: dict[str, DataFrame], keys: list[str],
                       time_col: str = "Time", step: float = 0.1,
                       as_json: bool = False) -> DataFrame:
    """Synchronize per-topic streams onto a regular ``step`` grid per key
    group, forward-filling each topic's latest payload — the whole sync
    job (synchronize_topics.py:200-223) as one composable transform.

    Output: ``keys + [time_col] + [<topic> ...]`` with one payload column
    per topic (struct, or JSON string with ``as_json`` for reference
    parity), one row per (keys, tick)."""
    topics = sorted(topic_dfs)
    long = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True),
        [pack_payload(df, keys, time_col, as_json=as_json)
         .withColumn("topic", F.lit(t))
         for t, df in topic_dfs.items()])

    # wide signal rows: one column per topic at observed times.
    # first() matches the reference's dedup policy for multiple samples in
    # one tick instant (synchronize_topics.py:177); values=topics skips
    # the pivot's distinct scan.
    wide = (long.groupBy(*keys, time_col)
            .pivot("topic", topics)
            .agg(F.first("payload")))

    spine = (time_spine(long, keys, time_col, step)
             .withColumn("_is_spine", F.lit(1)))
    unioned = wide.withColumn("_is_spine", F.lit(0)).unionByName(
        spine, allowMissingColumns=True)

    # one Window spec → Catalyst evaluates all topic fills in a single
    # physical Window operator. Signal rows at exactly a tick time sort
    # before the spine row (_is_spine asc) so their value lands on it.
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(time_col).asc(), F.col("_is_spine").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        *keys, time_col, "_is_spine",
        *[F.last(t, ignorenulls=True).over(w).alias(t) for t in topics])

    return (filled.where(F.col("_is_spine") == 1).drop("_is_spine"))
