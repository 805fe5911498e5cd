"""Scoped lifetime management for operator-internal caches.

Several operators ``persist()`` an intermediate both of their join
sides reuse (minhash/simhash signatures, n-gram shingle postings,
downsample tiers). The cache is a real plan-shape requirement — but its
*lifetime* is the caller's: the operator cannot know when the last
action over the returned lazy plan has run. Without scoping, a
long-lived session composing several dedup jobs accumulates cached
blocks until ``spark.catalog.clearCache()`` (r2's phantom ~15% bench
drift came exactly from such leaked blocks).

:func:`cache_scope` closes that foot-gun::

    with cache_scope():
        pairs = minhash_lsh_pairs(docs, "text", "doc_id")
        pairs.write.parquet(out)          # actions run inside the scope
    # signature cache blocks are unpersisted (blocking) here

Operators call :func:`register_persist` instead of ``DataFrame.persist``:
inside an active scope the frame is recorded and unpersisted at scope
exit; with no scope the behavior is exactly the old caller-owned
lifetime. Scopes nest (inner frames free at inner exit) and are
thread-local, so concurrent job threads don't free each other's caches.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_local = threading.local()


def _stack() -> list[list[DataFrame]]:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def register_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and, when a :func:`cache_scope` is active on this
    thread, hand its lifetime to the innermost scope."""
    df = df.persist()
    stack = _stack()
    if stack:
        stack[-1].append(df)
    return df


@contextmanager
def cache_scope():
    """Bound the lifetime of operator-internal caches to a ``with``
    block. On exit every frame persisted inside the block (via
    :func:`register_persist`) is unpersisted **blocking**, so storage
    is verifiably freed when the block closes — run all actions over
    the operators' results inside the scope (the plans recompute,
    correctly but slowly, if executed after it)."""
    frames: list[DataFrame] = []
    _stack().append(frames)
    try:
        yield frames
    finally:
        _stack().pop()
        for df in frames:
            try:
                df.unpersist(blocking=True)
            except Exception:  # session already stopped — nothing to free
                pass
