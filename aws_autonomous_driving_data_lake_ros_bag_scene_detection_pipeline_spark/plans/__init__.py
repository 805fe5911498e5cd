"""Physical-plan inspection helpers (SURVEY §4).

The reference inherits Catalyst untuned and defeats it in places (JSON
packing kills column pruning, RDD maps kill codegen — SURVEY §4 table).
This engine treats the physical plan as part of the contract: tests
assert that filters reach the parquet scan, small dims broadcast, and
multi-column window fills collapse into one Window operator.
"""

from .inspect import (  # noqa: F401
    broadcast_join_count, count_exchanges, count_window_ops, formatted_plan,
    pushed_filters, read_schema_columns, scan_output_rows, shuffle_join_count,
    wholestage_codegen_spans,
)
