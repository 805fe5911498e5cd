"""Snapshot diff — keyed change detection between two table versions.

The operational companion to :func:`~..sources.tables.merge_upsert` and
the versioned streaming snapshots: given two snapshots of a keyed
table, emit what changed — ``added`` / ``removed`` / ``changed`` rows
plus the per-row list of changed columns. This is how a 100 TB
pipeline audits an upsert, builds a CDC feed out of plain parquet
snapshots, or validates a migration (old engine vs new engine output).

Shape: ONE full-outer shuffle join on the key columns; every
comparison is a null-safe Catalyst expression (``eqNullSafe``) inside
whole-stage codegen, and unchanged rows are filtered before anything
is materialized, so the output is proportional to the churn, not the
table. The reference has no table-versioning surface at all (its
pipeline is append-only per-bag); this generalizes its batch-manifest
"what did this run produce" bookkeeping (main.py tracking tables) to
content-level change capture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str] | None = None,
                  *, change_col: str = "change",
                  changed_cols_col: str = "changed_cols") -> DataFrame:
    """Diff two snapshots by key → one row per added / removed /
    changed key: ``(keys…, change, changed_cols, old_<c>…, new_<c>…)``.

    ``compare_cols`` defaults to every shared non-key column. NULLs
    compare null-safely (NULL → NULL is unchanged; NULL ↔ value is a
    change). Keys present in both snapshots with identical compared
    values produce no output row. Duplicate keys within a snapshot are
    the caller's bug (enforce upstream); the join would pair them
    cross-wise."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns
                  if c in set(new.columns) and c not in set(keys)]
        compare_cols = shared
    missing = [c for c in (*keys, *compare_cols)
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns missing from a snapshot: {missing}")
    # the diff plan introduces _in_old/_in_new markers plus old_<c>/
    # new_<c> prefixed copies of every compared column; a key column
    # with one of those names would collide — producing an ambiguous-
    # column error or, worse, a silently wrong added/removed/changed
    # classification. Fail loudly instead.
    from collections import Counter
    produced = [*keys,
                *(f"old_{c}" for c in compare_cols),
                *(f"new_{c}" for c in compare_cols),
                "_in_old", "_in_new", change_col, changed_cols_col]
    clashes = sorted(n for n, cnt in Counter(produced).items() if cnt > 1)
    if clashes:
        raise ValueError(
            f"snapshot_diff name collision: {clashes} — key columns must "
            f"not be named _in_old/_in_new, match an old_/new_-prefixed "
            f"compared column, or equal change_col/changed_cols_col; "
            f"rename the inputs or pass different change_col/"
            f"changed_cols_col")

    o = old.select(*keys,
                   *[F.col(c).alias(f"old_{c}") for c in compare_cols],
                   F.lit(True).alias("_in_old"))
    n = new.select(*keys,
                   *[F.col(c).alias(f"new_{c}") for c in compare_cols],
                   F.lit(True).alias("_in_new"))
    j = o.join(n, keys, "full_outer")

    diffs = F.array_compact(F.array(*[
        F.when(~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")),
               F.lit(c))
        for c in compare_cols])) if compare_cols else F.array()
    change = (F.when(F.col("_in_old").isNull(), F.lit("added"))
              .when(F.col("_in_new").isNull(), F.lit("removed"))
              .when(F.size(diffs) > 0, F.lit("changed")))
    return (j.withColumn(change_col, change)
            .where(F.col(change_col).isNotNull())
            .withColumn(changed_cols_col,
                        F.when(F.col(change_col) == "changed", diffs)
                        .otherwise(F.array().cast("array<string>")))
            .drop("_in_old", "_in_new"))
