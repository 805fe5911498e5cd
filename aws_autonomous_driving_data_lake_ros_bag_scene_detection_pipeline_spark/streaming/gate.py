"""Completeness-gated micro-batching.

The reference fires its EMR pipeline only when the current bag has all
expected topics AND at least ``min_num_bags_to_process`` bags have
accumulated (trigger.py:150-165, the FIXME'd gate). That accumulation
lives in DynamoDB (trigger.py:110-147) with hand-rolled counters.

Here the same semantics run inside a Structured Streaming
``foreachBatch``: each micro-batch's new files update a (bag, topic)
ledger; bags whose topic set is complete are released downstream in
groups of ``min_bags``. The ledger is a driver-side dict checkpointed
to JSON — at real scale it would be a Delta/parquet state table, but
the gate logic itself (the part the reference got wrong) is identical.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame


class CompletenessGate:
    """Accumulate (bag, topic) arrivals; release complete bags in
    batches of ``min_bags``.

    Parameters
    ----------
    expected_topics : the full topic set a bag needs before it is
        processable (the reference's ``NUM_TOPICS`` / config.json:21-31).
    min_bags : release threshold (trigger.py:159-165's
        ``min_num_bags_to_process = 2``, hard-coded there, a parameter
        here).
    on_release : callback ``(batch_id: int, bags: list[str]) -> None``
        invoked with each released group (the reference's
        ``start_execution`` of the Step Function, trigger.py:168-202).
    state_path : optional JSON checkpoint so a restarted stream does not
        re-release processed bags (the reference's RUNNING-execution
        check, trigger.py:55-68, minus the race).
    """

    def __init__(self, expected_topics: set[str], min_bags: int = 2,
                 on_release: Callable[[int, list[str]], None] | None = None,
                 state_path: str | None = None):
        self.expected = set(expected_topics)
        self.min_bags = min_bags
        self.on_release = on_release
        self.state_path = state_path
        self.seen: dict[str, set[str]] = {}
        self.released: list[list[str]] = []
        self._load()

    # -- state checkpointing ------------------------------------------
    def _load(self) -> None:
        if self.state_path and os.path.exists(self.state_path):
            with open(self.state_path) as f:
                raw = json.load(f)
            self.seen = {b: set(t) for b, t in raw["seen"].items()}
            self.released = raw["released"]

    def _save(self) -> None:
        if self.state_path:
            tmp = self.state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"seen": {b: sorted(t) for b, t in self.seen.items()},
                           "released": self.released}, f)
            os.replace(tmp, self.state_path)

    # -- gate logic ----------------------------------------------------
    def observe(self, arrivals: list[tuple[str, str]]) -> list[str] | None:
        """Update the ledger with (bag, topic) pairs; return the released
        bag group if the gate fires, else None."""
        for bag, topic in arrivals:
            self.seen.setdefault(bag, set()).add(topic)
        complete = sorted(b for b, topics in self.seen.items()
                          if topics >= self.expected)
        if len(complete) >= self.min_bags:
            for b in complete:
                del self.seen[b]
            self.released.append(complete)
            self._save()
            return complete
        self._save()
        return None

    # -- foreachBatch adapter -----------------------------------------
    def foreach_batch(self, bag_col: str = "bag_file",
                      topic_col: str = "topic") -> Callable[[DataFrame, int], None]:
        """``writeStream.foreachBatch`` function: distinct (bag, topic)
        pairs of each micro-batch feed :meth:`observe`; releases invoke
        ``on_release`` with the epoch id."""
        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            pairs = [(r[bag_col], r[topic_col])
                     for r in batch_df.select(bag_col, topic_col)
                     .distinct().collect()]
            group = self.observe(pairs)
            if group and self.on_release:
                self.on_release(epoch_id, group)
        return fn
