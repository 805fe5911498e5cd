"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark built-ins ``hll_sketch_agg`` / ``hll_union_agg``).

``COUNT(DISTINCT x)`` is the one classic aggregate that is NOT
additive: exact distinct counts cannot be rolled up from finer
pre-aggregates, so at 100 TB every new grouping re-shuffles the raw
keys. Sketching restores additivity — build a per-(fine-group) HLL
sketch ONCE from the raw data, persist the (tiny, ~2^lg_k bytes)
binary sketches, and answer any coarser distinct-count rollup by
merging sketches instead of re-scanning raw rows. This is the distinct-
count analog of :func:`~.timeseries.downsample_cascade`'s continuous
aggregates: the raw table shuffles once, everything coarser folds the
pre-aggregated state.

Accuracy: relative standard error ≈ 1.04 / sqrt(2^lg_k) (DataSketches
HLL). The default ``lg_k=14`` gives RSE ≈ 0.8%, so a 3σ envelope of
±2.5% holds with ~99.7% confidence at any cardinality; sketches merge
losslessly (the union of per-partition sketches estimates the same as
one sketch over the union — pinned by test).

All plan nodes are JVM aggregates (ObjectHashAggregate over the
DataSketches state) — no Python in the path, and partial aggregation
(map-side sketch building) applies before the shuffle exactly as for
additive aggregates.

Reference parity note: the reference pipeline has no distinct-count
rollup surface (its aggregates are per-batch, ``detect_scenes.py``);
this module is part of the beyond-reference scale surface alongside
dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 14


def distinct_sketch(df: DataFrame, group_cols: list[str], value_col: str,
                    *, lg_k: int = DEFAULT_LG_K,
                    sketch_col: str = "sketch") -> DataFrame:
    """Per-group HLL sketch of ``value_col``'s distinct values.

    One shuffle on ``group_cols`` with map-side partial sketching; the
    output is the mergeable pre-aggregate to persist (a day's worth of
    (day, dim, sketch) rows replaces re-scanning that day forever).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty; for a global "
                         "sketch pass a constant grouping column")
    # hll_sketch_agg accepts int/bigint/string/binary; other types are
    # hashed through their canonical string form (a distinct-preserving
    # mapping — the sketch counts distincts, not values)
    supported = {"int", "bigint", "string", "binary"}
    dtype = dict(df.dtypes).get(value_col)
    v = F.col(value_col)
    if dtype not in supported:
        v = v.cast("string")
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(v, lg_k).alias(sketch_col)))


def rollup_distinct(sketches: DataFrame, group_cols: list[str],
                    *, sketch_col: str = "sketch",
                    estimate_col: str = "approx_distinct",
                    keep_sketch: bool = False) -> DataFrame:
    """Roll finer sketches up to a coarser grouping and estimate.

    Input is :func:`distinct_sketch` output (or a previous rollup —
    unions compose); ``group_cols`` must be a subset of the finer
    grouping. Shuffles only the sketch rows (bounded by the finer
    group cardinality × ~2^lg_k bytes), never the raw data.

    ``keep_sketch=True`` also carries the merged sketch so the result
    can itself be persisted as the next cascade tier.
    """
    merged = F.hll_union_agg(sketch_col)
    aggs = [F.hll_sketch_estimate(merged).alias(estimate_col)]
    if keep_sketch:
        aggs.append(merged.alias(sketch_col))
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*aggs)
    return sketches.agg(*aggs)


def distinct_rollup_check(df: DataFrame, group_cols: list[str],
                          fine_cols: list[str], value_col: str,
                          *, lg_k: int = DEFAULT_LG_K,
                          rel_tol: float = 0.025,
                          estimate_col: str = "approx_distinct",
                          ok_col: str = "sketch_ok") -> DataFrame:
    """Exact per-group distinct count, the sketch-rollup estimate
    (built at ``fine_cols`` granularity, merged up to ``group_cols``),
    and a boolean pinning the estimate inside ``rel_tol`` of exact.

    The verification shape used by the gate: the sketch path must land
    within the documented HLL error envelope of the exact aggregate it
    replaces at scale.
    """
    exact = (df.groupBy(*group_cols)
             .agg(F.countDistinct(value_col).alias("_exact")))
    est = rollup_distinct(
        distinct_sketch(df, fine_cols, value_col, lg_k=lg_k),
        group_cols, estimate_col=estimate_col)
    return (exact.join(est, group_cols)
            .withColumn(ok_col,
                        (F.abs(F.col(estimate_col) - F.col("_exact"))
                         <= F.lit(rel_tol) * F.col("_exact")))
            .drop("_exact"))
