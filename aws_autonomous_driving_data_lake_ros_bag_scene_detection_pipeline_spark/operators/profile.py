"""One-pass table profiling: per-column completeness / cardinality /
range / moments, as a single aggregate over one scan.

The data-engineering preamble to every pipeline in this repo: before
deduping or mixing a new 100 TB source you want null rates, distinct
cardinalities, and value ranges per column — and you want them from ONE
pass, not |columns| separate jobs. ``profile_table`` builds every
per-column statistic as aggregate expressions in one ``agg`` (scan →
partial agg → single-row exchange), then explodes the wide row into a
long-format (one row per column) result without any driver collect.

Distinct counts use ``approx_count_distinct`` (HyperLogLog++, default
~2.3% RSD) — exact distincts per column would need a shuffle per
column; for exact mergeable counts on a chosen column, use
``operators.sketches``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_ORDERABLE = _NUMERIC + (T.StringType, T.DateType, T.TimestampType,
                         T.TimestampNTZType, T.BooleanType)


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  rsd: float = 0.023) -> DataFrame:
    """Profile ``columns`` (default: all) in one scan.

    Returns one row per column: ``column, dtype, n_rows, n_null,
    null_frac, approx_distinct, min_str, max_str, mean, stddev`` —
    min/max as strings so heterogeneous columns share a schema, and
    mean/stddev NULL for non-numeric columns. ``rsd`` is the target
    relative standard deviation of ``approx_count_distinct``.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(cols):
        dt = fields[c]
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_nn{i}"))
        aggs.append(F.approx_count_distinct(col, rsd).alias(f"_ad{i}"))
        if isinstance(dt, _ORDERABLE):
            aggs.append(F.min(col).cast("string").alias(f"_mn{i}"))
            aggs.append(F.max(col).cast("string").alias(f"_mx{i}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"_mn{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"_mx{i}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.avg(col).cast("double").alias(f"_av{i}"))
            aggs.append(F.stddev(col).cast("double").alias(f"_sd{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_av{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"_sd{i}"))
    wide = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(fields[c].simpleString()).alias("dtype"),
            F.col("_rows").alias("n_rows"),
            (F.col("_rows") - F.col(f"_nn{i}")).alias("n_null"),
            F.when(F.col("_rows") > 0,
                   (F.col("_rows") - F.col(f"_nn{i}")) / F.col("_rows"))
             .alias("null_frac"),
            F.col(f"_ad{i}").alias("approx_distinct"),
            F.col(f"_mn{i}").alias("min_str"),
            F.col(f"_mx{i}").alias("max_str"),
            F.col(f"_av{i}").alias("mean"),
            F.col(f"_sd{i}").alias("stddev"),
        )
        for i, c in enumerate(cols)
    ]
    return (wide.select(F.explode(F.array(*entries)).alias("p"))
            .select("p.*"))


def profile_drift(old_profile: DataFrame, new_profile: DataFrame,
                  *, null_frac_tol: float = 0.01,
                  distinct_rel_tol: float = 0.10,
                  mean_sigma_tol: float = 3.0) -> DataFrame:
    """Compare two :func:`profile_table` outputs →
    ``(column, drift, detail)`` rows for every drifted column — the
    monitoring step between pipeline runs: persisted profiles are tiny
    (one row per column), so drift detection costs a join of two
    metadata tables, never a second scan of either dataset.

    Flags, in severity order: ``schema`` (column added/removed or dtype
    changed), ``nulls`` (null fraction moved by more than
    ``null_frac_tol`` absolute), ``cardinality`` (approx distinct moved
    by more than ``distinct_rel_tol`` relative — beyond the sketch's
    own error), ``mean`` (mean moved by more than ``mean_sigma_tol``
    standard errors, using the old profile's stddev and row count).
    Columns with no drift emit nothing — output scales with drift."""
    o = old_profile.select(
        F.col("column"), F.col("dtype").alias("_odt"),
        F.col("n_rows").alias("_on"), F.col("null_frac").alias("_onf"),
        F.col("approx_distinct").alias("_oad"),
        F.col("mean").alias("_omean"), F.col("stddev").alias("_osd"),
        F.lit(True).alias("_in_old"))
    n = new_profile.select(
        F.col("column"), F.col("dtype").alias("_ndt"),
        F.col("null_frac").alias("_nnf"),
        F.col("approx_distinct").alias("_nad"),
        F.col("mean").alias("_nmean"),
        F.lit(True).alias("_in_new"))
    j = o.join(n, "column", "full_outer")

    # every predicate is made NULL-proof: a NULL statistic in a
    # MONITORING operator must never silently filter a real drift into
    # a false all-clear (where(NULL) drops the row)
    schema_drift = (F.col("_in_old").isNull() | F.col("_in_new").isNull()
                    | (F.col("_odt") != F.col("_ndt")))
    onf = F.coalesce(F.col("_onf"), F.lit(0.0))
    nnf = F.coalesce(F.col("_nnf"), F.lit(0.0))
    nulls_drift = F.abs(nnf - onf) > F.lit(null_frac_tol)
    oad = F.coalesce(F.col("_oad"), F.lit(0))
    nad = F.coalesce(F.col("_nad"), F.lit(0))
    card_drift = (F.abs(nad - oad)
                  > F.lit(distinct_rel_tol) * F.greatest(oad, F.lit(1)))
    # NULL old stddev (single-row/empty old profile) -> no band can be
    # established: ANY mean change flags (se falls back to 0)
    se = F.coalesce(F.col("_osd")
                    / F.sqrt(F.greatest(F.col("_on"), F.lit(1))),
                    F.lit(0.0))
    mean_drift = (F.col("_omean").isNotNull()
                  & F.col("_nmean").isNotNull()
                  & (F.abs(F.col("_nmean") - F.col("_omean"))
                     > F.lit(mean_sigma_tol) * se))

    def check(kind, cond, detail):
        return F.when(cond, F.struct(F.lit(kind).alias("drift"),
                                     detail.alias("detail")))

    # ONE pass: conditional structs -> array_compact -> explode, so the
    # join (and any non-materialized upstream profiling scan) runs once
    checks = F.array_compact(F.array(
        check("schema", schema_drift,
              F.concat_ws(" -> ",
                          F.coalesce(F.col("_odt"), F.lit("(absent)")),
                          F.coalesce(F.col("_ndt"), F.lit("(absent)")))),
        check("nulls", ~schema_drift & nulls_drift,
              F.concat_ws(" -> ", F.round(onf, 4).cast("string"),
                          F.round(nnf, 4).cast("string"))),
        check("cardinality", ~schema_drift & card_drift,
              F.concat_ws(" -> ", oad.cast("string"), nad.cast("string"))),
        check("mean", ~schema_drift & mean_drift,
              F.concat_ws(" -> ", F.round("_omean", 4).cast("string"),
                          F.round("_nmean", 4).cast("string"))),
    ))
    return (j.select("column", F.explode(checks).alias("_c"))
            .select("column", F.col("_c.drift").alias("drift"),
                    F.col("_c.detail").alias("detail")))
