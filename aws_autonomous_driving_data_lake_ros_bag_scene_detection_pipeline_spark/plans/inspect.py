"""Parse ``df.explain("formatted")`` output into checkable facts.

String-level inspection of the formatted plan is the stable public
surface (the same text a human reads when tuning); these helpers turn
the scale-critical properties into assertions:

- :func:`pushed_filters`      — which predicates reached the scan
  (PushedFilters; a filter evaluated post-scan reads 100 TB to drop
  99 TB).
- :func:`read_schema_columns` — which columns the scan materializes
  (ReadSchema; column pruning).
- :func:`broadcast_join_count` / :func:`shuffle_join_count` — join
  strategy actually chosen.
- :func:`count_exchanges`     — shuffle count of the plan.
- :func:`count_window_ops`    — window passes (N same-spec fills must
  collapse to 1).
- :func:`wholestage_codegen_spans` — codegen coverage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entries = [e.strip() for e in m.group(1).split(",") if e.strip()]
        out.extend(entries)
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan sets of column names the scan actually reads."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c}
        schemas.append(cols)
    return schemas


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def shuffle_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excludes broadcast exchanges)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan)) \
        or len([ln for ln in plan.splitlines()
                if re.search(r"\(\d+\) Exchange$", ln.strip())])


def count_window_ops(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Window\b", plan))


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)",
                              formatted_plan(df))))


def scan_output_rows(df: DataFrame) -> int:
    """Rows the plan's leaf scans actually produced — AFTER parquet
    row-group skipping (zone-map min/max pruning), BEFORE any post-scan
    Filter re-evaluation. The caller must have executed the DataFrame
    (e.g. ``df.collect()``) so the SQL metrics are populated; sums
    ``numOutputRows`` over all leaf scan nodes."""
    def leaves(node):
        children = node.children()
        if children.isEmpty():
            return [node]
        out = []
        it = children.iterator()
        while it.hasNext():
            out.extend(leaves(it.next()))
        return out

    total = 0
    for leaf in leaves(df._jdf.queryExecution().executedPlan()):  # noqa: SLF001
        metrics = leaf.metrics()
        if metrics.contains("numOutputRows"):
            total += metrics.apply("numOutputRows").value()
    return total
