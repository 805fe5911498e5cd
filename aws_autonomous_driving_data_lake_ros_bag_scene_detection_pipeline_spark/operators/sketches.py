"""Mergeable sketches: distinct counts (HLL) and frequencies (count-min).

Distinct counts use Apache DataSketches HLL via the Spark built-ins
``hll_sketch_agg`` / ``hll_union_agg``.

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

Frequencies use a **relational count-min sketch** (Cormode &
Muthukrishnan 2005): instead of a binary blob, the sketch IS a bounded
relation ``(group…, _d, _cell, cnt)`` — each value hashes to one cell
per depth row, and a cell's count is the exact sum of everything that
hashed there. That representation keeps every step a plain Spark
aggregate (map-side partials over a key space of at most
``depth × width`` cells per group, so the combine ratio approaches the
group's row count), merging is literally ``GROUP BY … SUM(cnt)``
(additive, lossless), and the whole thing is oracle-checkable because
the cell hash is the DuckDB-portable md5 family. Estimate for a value
= min over its ``depth`` cells; guarantees: estimate ≥ true count
always, and ≤ true + ε·N with probability ≥ 1 − δ per probe, where
ε = e/width and δ = e^(−depth) (defaults: width 2048 → ε ≈ 0.13%,
depth 5 → δ ≈ 0.7%). The use case is the same as HLL's: persist tiny
per-(fine-group) sketch relations once, answer any coarser
frequency/heavy-hitter question by summing cells — never re-shuffling
the raw token stream.

Reference parity note: the reference pipeline has no distinct-count
or frequency rollup surface (its aggregates are per-batch,
``detect_scenes.py``); this module is part of the beyond-reference
scale surface alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64_seeded

DEFAULT_LG_K = 14
DEFAULT_CM_DEPTH = 5
DEFAULT_CM_WIDTH = 2048


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


def _cm_cells(value, depth: int, width: int):
    """Array of (depth, cell) structs for a value — one md5-family hash
    per depth row, so the cell layout is engine-portable."""
    return F.array(*[
        F.struct(F.lit(d).alias("_d"),
                 F.pmod(hash64_seeded(value.cast("string"), d),
                        F.lit(width)).alias("_cell"))
        for d in range(depth)])


def freq_sketch(df: DataFrame, group_cols: list[str], value_col: str,
                *, depth: int = DEFAULT_CM_DEPTH,
                width: int = DEFAULT_CM_WIDTH,
                weight_col: str | None = None) -> DataFrame:
    """Per-group count-min sketch of ``value_col`` occurrences →
    ``(group…, _d, _cell, cnt)``, at most ``depth × width`` rows per
    group no matter how many distinct values flow in.

    One shuffle keyed on ``(group…, _d, _cell)`` with map-side partial
    sums — the tiny key space means almost everything combines before
    the exchange. ``weight_col`` counts each row with a weight instead
    of 1 (e.g. token counts pre-aggregated per document). NULL values
    are ignored (a NULL has no frequency)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    w = (F.col(weight_col).cast("bigint") if weight_col
         else F.lit(1).cast("bigint"))
    return (df.where(F.col(value_col).isNotNull())
            .select(*group_cols,
                    F.explode(_cm_cells(F.col(value_col), depth, width))
                     .alias("_c"),
                    w.alias("_w"))
            .groupBy(*group_cols, F.col("_c._d").alias("_d"),
                     F.col("_c._cell").alias("_cell"))
            .agg(F.sum("_w").alias("cnt")))


def rollup_freq(sketches: DataFrame, group_cols: list[str],
                *, count_col: str = "cnt") -> DataFrame:
    """Merge finer count-min sketches up to a coarser grouping —
    cells simply add (``GROUP BY … SUM``), so merging is lossless in
    the sketch sense: the merged relation is EXACTLY the sketch a
    direct build over the union would produce (pinned by test).
    ``group_cols`` may be empty for a global sketch. Only sketch rows
    shuffle — bounded by finer-groups × depth × width."""
    return (sketches.groupBy(*group_cols, "_d", "_cell")
            .agg(F.sum(count_col).alias(count_col)))


def freq_estimate(sketch: DataFrame, probes: DataFrame, value_col: str,
                  group_cols: list[str] | None = None,
                  *, depth: int = DEFAULT_CM_DEPTH,
                  width: int = DEFAULT_CM_WIDTH,
                  estimate_col: str = "approx_count") -> DataFrame:
    """Estimated frequency of each probe value →
    ``(group…, value_col, estimate_col)`` (probes deduplicated).
    ``depth``/``width`` must match the build. Estimate = min over the
    value's ``depth`` cells, with absent cells counting 0 — so the
    estimate is exactly 0 iff the value never occurred (one-sided
    error: never an undercount).

    Plan shape: probes explode to ``depth`` rows, LEFT-join the sketch
    on (group…, _d, _cell) — a sketch bounded at depth × width rows per
    group broadcasts under AQE — then a min-aggregate keyed by the
    probe row."""
    group_cols = group_cols or []
    p = (probes.select(*group_cols, F.col(value_col))
         .where(F.col(value_col).isNotNull()).distinct()
         .select(*group_cols, value_col,
                 F.explode(_cm_cells(F.col(value_col), depth, width))
                  .alias("_c"))
         .select(*group_cols, value_col, "_c._d", "_c._cell"))
    joined = p.join(sketch, [*group_cols, "_d", "_cell"], "left")
    return (joined.groupBy(*group_cols, value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias(estimate_col)))


def histogram_sketch(df: DataFrame, group_cols: list[str], value_col: str,
                     *, lo: float, hi: float, bins: int = 1024,
                     weight_col: str | None = None) -> DataFrame:
    """Per-group fixed-grid histogram of ``value_col`` →
    ``(group…, _bin, cnt)`` — the mergeable quantile/distribution
    state. ``percentile_approx`` merges internally but its state can't
    be persisted across tables; a fixed-bin histogram relation CAN: at
    most ``bins + 2`` rows per group, merge = ``GROUP BY … SUM`` (exact,
    like the count-min cells), and any quantile is answered from the
    persisted relation with absolute error ≤ ``(hi − lo) / bins``
    (one bin width) via :func:`quantile_estimate`.

    The grid ``[lo, hi)`` must be FIXED across everything that will
    ever merge — that is the mergeability contract (same stance as
    Prometheus-style histograms); pick bounds from
    :func:`~.profile.profile_table`'s min/max. Out-of-range values
    clamp into sentinel bins −1 (below ``lo``) and ``bins`` (at/above
    ``hi``), so mass is never dropped — quantiles falling in a sentinel
    report the clamped edge. One shuffle on ``(group…, _bin)`` with
    map-side partials, identical plan shape to :func:`freq_sketch`."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    w = (F.col(weight_col).cast("bigint") if weight_col
         else F.lit(1).cast("bigint"))
    width = (hi - lo) / bins
    raw = F.floor((F.col(value_col).cast("double") - lo) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(-1)), F.lit(bins)).cast("int")
    return (df.where(F.col(value_col).isNotNull())
            .select(*group_cols, b.alias("_bin"), w.alias("_w"))
            .groupBy(*group_cols, "_bin")
            .agg(F.sum("_w").alias("cnt")))


def rollup_histogram(sketches: DataFrame, group_cols: list[str],
                     *, count_col: str = "cnt") -> DataFrame:
    """Merge finer histogram sketches to a coarser grouping (bins add;
    exact — the merged relation equals a direct build over the union).
    Only sketch rows shuffle: finer-groups × (bins + 2) at most."""
    return (sketches.groupBy(*group_cols, "_bin")
            .agg(F.sum(count_col).alias(count_col)))


def quantile_estimate(sketch: DataFrame, group_cols: list[str],
                      probs: list[float], *, lo: float, hi: float,
                      bins: int = 1024) -> DataFrame:
    """Quantiles from a persisted histogram sketch →
    ``(group…, prob, quantile_est)``, one row per group × prob.
    ``lo``/``hi``/``bins`` must match the build.

    Estimate: invert the per-group CDF to the covering bin, then
    interpolate linearly inside it — absolute error ≤ one bin width
    for any in-range quantile (sentinel bins report the clamped grid
    edge). Plan shape: one cumulative-sum window over ≤ bins + 2 rows
    per group, a broadcast-sized probs literal, and a ``min_by``
    aggregate — nothing touches raw data."""
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probs must be in [0, 1], got {p}")
    width = (hi - lo) / bins
    from pyspark.sql import Window
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy("_bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot_w = (Window.partitionBy(*[F.col(c) for c in group_cols])
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    cum = (sketch.withColumn("_cum", F.sum("cnt").over(w))
           .withColumn("_tot", F.sum("cnt").over(tot_w)))
    pr = F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("prob")
    cand = (cum.select(*group_cols, "_bin", "cnt", "_cum", "_tot", pr)
            # target rank in [1, _tot]; the covering bin is the first
            # with _cum >= rank
            .withColumn("_rank",
                        F.greatest(F.lit(1.0), F.col("prob") * F.col("_tot")))
            .where(F.col("_cum") >= F.col("_rank")))
    pick = (cand.groupBy(*group_cols, "prob")
            .agg(F.min_by(F.struct("_bin", "cnt", "_cum", "_rank"), "_bin")
                 .alias("_s")))
    bin_, cnt, cum_, rank_ = (F.col("_s._bin"), F.col("_s.cnt"),
                              F.col("_s._cum"), F.col("_s._rank"))
    frac = F.least(F.lit(1.0), F.greatest(F.lit(0.0),
                   (rank_ - (cum_ - cnt)) / cnt))
    # sentinel bins clamp to the grid edge; interior bins interpolate
    est = (F.when(bin_ < 0, F.lit(float(lo)))
           .when(bin_ >= bins, F.lit(float(hi)))
           .otherwise(F.lit(lo) + F.lit(width) * (bin_ + frac)))
    return pick.select(*group_cols, "prob",
                       est.cast("double").alias("quantile_est"))


def histogram_psi(old_sketch: DataFrame, new_sketch: DataFrame,
                  group_cols: list[str], *,
                  count_col: str = "cnt",
                  smoothing: float = 0.5) -> DataFrame:
    """Population Stability Index between two histogram sketches on
    the SAME grid → ``(group…, psi, n_old, n_new)`` — the
    distribution-level drift metric (industry rule of thumb:
    < 0.1 stable, 0.1–0.25 shifting, > 0.25 shifted) completing
    :func:`~.profile.profile_drift`'s moment-level checks. Because the
    sketches are tiny persisted relations (≤ bins + 2 rows per group),
    comparing last month's distribution to today's costs a join of two
    metadata tables — the raw data is never re-scanned.

    ``PSI = Σ_bins (p_b − q_b)·ln(p_b / q_b)`` over the full-outer bin
    join (a bin present on one side only still contributes).
    ``smoothing`` is the standard additive fallback that keeps empty
    bins finite: each bin count gets ``+ smoothing`` before
    normalizing — deterministic, and its effect vanishes as counts
    grow. Groups present on only one side get NULL psi (no basis for
    comparison) rather than a fake extreme."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    o = old_sketch.groupBy(*group_cols, "_bin").agg(
        F.sum(count_col).alias("_oc"))
    n = new_sketch.groupBy(*group_cols, "_bin").agg(
        F.sum(count_col).alias("_nc"))
    j = o.join(n, [*group_cols, "_bin"], "full_outer")
    per_group = (Window.partitionBy(*group_cols) if group_cols
                 else Window.partitionBy(F.lit(1)))
    oc = F.coalesce(F.col("_oc"), F.lit(0)).cast("double")
    nc = F.coalesce(F.col("_nc"), F.lit(0)).cast("double")
    tot_o = F.sum(oc).over(per_group)
    tot_n = F.sum(nc).over(per_group)
    n_bins = F.count(F.lit(1)).over(per_group)
    p = (oc + smoothing) / (tot_o + smoothing * n_bins)
    q = (nc + smoothing) / (tot_n + smoothing * n_bins)
    term = (p - q) * F.log(p / q)
    return (j.select(*group_cols,
                     term.alias("_t"),
                     tot_o.alias("_to"), tot_n.alias("_tn"))
            .groupBy(*group_cols)
            .agg(F.when((F.max("_to") > 0) & (F.max("_tn") > 0),
                        F.sum("_t")).alias("psi"),
                 F.max("_to").cast("bigint").alias("n_old"),
                 F.max("_tn").cast("bigint").alias("n_new")))
