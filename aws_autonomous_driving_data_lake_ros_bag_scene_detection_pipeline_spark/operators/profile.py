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
