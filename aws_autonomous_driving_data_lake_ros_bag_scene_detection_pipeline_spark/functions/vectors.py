"""Vector math over ``array<float>`` embedding columns.

Pure higher-order-function expressions (``zip_with`` + ``aggregate``) —
JVM-side, no Python, no UDF — so a 100 TB scan of embeddings never
crosses the Arrow boundary. Arrays are cast to double before arithmetic
so results match DuckDB's ``list_dot_product``/``list_cosine_similarity``
to ≥6 decimal places (pinned in tests/test_parity.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(F.transform(_d(a), lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / norm(a) / norm(b)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v))
