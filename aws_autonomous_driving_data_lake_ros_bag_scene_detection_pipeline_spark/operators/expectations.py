"""Data-quality expectations: declarative constraint checking.

Every production table feed runs behind constraint checks — key
uniqueness, nullability, value ranges, enum membership, minimum volume
— and at 100 TB the check must be a handful of aggregates, not a
per-rule scan. :func:`check_expectations` evaluates a rule list and
returns one result row per rule (``rule, column, passed,
n_violations``): all row-level rules (not_null / range / values_in /
matches) fold into ONE aggregate pass over the table (conditional
counts share the scan), and each uniqueness rule adds one keyed
aggregate (duplicate groups can't be expressed as a row-wise
condition). Nothing collects raw rows; violation SAMPLES are a
separate, bounded helper (:func:`violation_samples`) so the report
itself stays metadata-sized.

The reference has no data-quality surface; its closest behavior is the
trigger's "enough topics present" gate (SURVEY §2 #36), which
streaming/gate.py already generalizes — this module is the batch-side
generalization of the same idea to content constraints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROW_RULES = ("not_null", "range", "values_in", "matches")


def _row_violation(rule: dict) -> Column:
    kind = rule["type"]
    c = F.col(rule["col"])
    if kind == "not_null":
        return c.isNull()
    if kind == "range":
        lo, hi = rule.get("min"), rule.get("max")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
        return c.isNotNull() & cond
    if kind == "values_in":
        return c.isNotNull() & ~c.isin(*rule["values"])
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown row rule type {kind!r}")


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate expectation rules → one row per rule:
    ``(rule, column, passed, n_violations)``.

    Rule dicts: ``{"type": "not_null", "col": c}``,
    ``{"type": "range", "col": c, "min": lo, "max": hi}`` (either bound
    optional; NULLs don't violate range — pair with not_null),
    ``{"type": "values_in", "col": c, "values": [...]}`,
    ``{"type": "matches", "col": c, "pattern": regex}``,
    ``{"type": "unique", "cols": [...]}`` (violations = rows beyond the
    first of each duplicated key), and
    ``{"type": "row_count_min", "n": N}``."""
    if not rules:
        raise ValueError("rules must be non-empty")
    for r in rules:
        if r.get("type") not in (*_ROW_RULES, "unique", "row_count_min"):
            raise ValueError(f"unknown rule type {r.get('type')!r}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    names = []
    for i, r in enumerate(rules):
        if r["type"] in _ROW_RULES:
            # coalesce: SUM over zero rows is NULL — an EMPTY table is
            # exactly what a quality gate must report on, not crash on
            aggs.append(F.coalesce(F.sum(_row_violation(r).cast("long")),
                                   F.lit(0)).alias(f"_v{i}"))
            names.append(i)
    base = df.agg(*aggs).first() if names or any(
        r["type"] == "row_count_min" for r in rules) else None

    spark = df.sparkSession
    out_rows = []
    for i, r in enumerate(rules):
        kind = r["type"]
        if kind in _ROW_RULES:
            v = int(base[f"_v{i}"])
            out_rows.append((kind, r["col"], v == 0, v))
        elif kind == "row_count_min":
            short = max(0, int(r["n"]) - int(base["_n"]))
            out_rows.append((kind, None, short == 0, short))
        else:  # unique — one keyed aggregate per rule
            v = (df.groupBy(*r["cols"])
                 .agg(F.count(F.lit(1)).alias("_c"))
                 .agg(F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)))
                 .first()[0])
            out_rows.append((kind, ",".join(r["cols"]), int(v) == 0,
                             int(v)))
    return spark.createDataFrame(
        out_rows, "rule string, column string, passed boolean, "
                  "n_violations bigint")


def violation_samples(df: DataFrame, rule: dict, limit: int = 20
                      ) -> DataFrame:
    """Up to ``limit`` offending rows for ONE row-level or unique rule
    — the drill-down companion to :func:`check_expectations` (bounded
    output by construction; never part of the report pass)."""
    kind = rule["type"]
    if kind in _ROW_RULES:
        return df.where(_row_violation(rule)).limit(limit)
    if kind == "unique":
        from pyspark.sql import Window
        w = Window.partitionBy(*rule["cols"]).orderBy(
            *[F.col(c) for c in rule["cols"]])
        return (df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") > 1).drop("_rn").limit(limit))
    raise ValueError(f"no samples for rule type {kind!r}")
