"""Portable deterministic hashing for dedup / fingerprint operators.

Spark's native ``xxhash64``/``hash`` have no DuckDB counterpart, so every
operator that must be oracle-checkable uses an md5-derived 64-bit hash
that both engines compute identically (pinned by tests/test_parity.py):

    Spark :  cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)
    DuckDB:  ('0x' || substring(md5(x), 1, 15))::BIGINT

15 hex chars = 60 bits, so the value always fits a signed 64-bit int and
``conv``'s unsigned parse can't overflow. All expressions here are
Catalyst built-ins — JVM-side, codegen'd, no Python in the hot path —
so they vectorize across a 1000-executor scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit hash of a string column (DuckDB-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: independent hash families for minhash permutations."""
    c = F.col(col) if isinstance(col, str) else col
    return hash64(F.concat(F.lit(f"{seed}|"), c))


def hash64_sql(expr: str) -> str:
    """DuckDB SQL mirror of :func:`hash64` for oracle queries."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def hash64_seeded_sql(expr: str, seed: int) -> str:
    return hash64_sql(f"'{seed}|' || {expr}")
