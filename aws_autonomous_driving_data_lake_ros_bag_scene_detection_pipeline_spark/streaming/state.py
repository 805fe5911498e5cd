"""Custom stateful streaming operator: per-key change-point intervals.

The batch form is ``operators.sessionize.change_point_intervals``
(detect_scenes.py:192-222's lag/lead state machine). A stream can't
lag/lead across micro-batches, so the cross-batch state (current
boolean state + open interval start) lives in Spark's state store via
``applyInPandasWithState`` — Arrow-batched per group, bounded state
(two scalars per key).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "prev_state INT, open_start BIGINT"


def _output_schema(keys: list[str], key_types: list[str]) -> str:
    key_part = ", ".join(f"{k} {t}" for k, t in zip(keys, key_types))
    return (f"{key_part}, start_time BIGINT, end_time BIGINT, "
            f"interval_length BIGINT")


def change_points_stateful(stream: DataFrame, keys: list[str],
                           time_col: str, state_col: str) -> DataFrame:
    """Emit ``(keys..., start_time, end_time, interval_length)`` rows for
    each maximal run where boolean ``state_col`` holds, across
    micro-batch boundaries.

    ``state_col`` must already be a boolean/int column on the stream
    (compute it with ``withColumn`` first — e.g.
    ``F.col("value") >= 150``). Rows inside each group are processed in
    ``time_col`` order; an interval still open when the stream ends
    stays in state (matching the batch operator's ``end_time = NULL``
    semantics would require a timeout-based flush, which callers can add
    with ``GroupStateTimeout.ProcessingTimeTimeout``).

    Scale: state is two scalars per key; the shuffle is the one
    ``groupBy(keys)`` exchange. Arrow moves each group's batch to
    Python in one block, not per row (unlike the reference's
    ``df.rdd.map`` at detect_scenes.py:186-190).
    """
    key_types = [dict(stream.dtypes)[k] for k in keys]
    out_schema = _output_schema(keys, key_types)

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        prev, open_start = (state.get if state.exists else (0, None))
        intervals: list[tuple[int, int]] = []
        # A group's micro-batch data may arrive as several Arrow chunks;
        # sorting each chunk independently would run the state machine
        # out of global time order. Materialize the group, sort once.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(time_col)
            for t, s in zip(pdf[time_col], pdf[state_col]):
                s = int(bool(s))
                if s == 1 and prev == 0:
                    open_start = int(t)
                elif s == 0 and prev == 1 and open_start is not None:
                    intervals.append((open_start, int(t)))
                    open_start = None
                prev = s
        state.update((prev, open_start))
        yield pd.DataFrame(
            [key + (s, e, e - s) for s, e in intervals],
            columns=list(keys) + ["start_time", "end_time", "interval_length"])

    return (stream
            .groupBy(*[F.col(k) for k in keys])
            .applyInPandasWithState(fn, out_schema, _STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))


_ANOM_STATE_SCHEMA = "ring ARRAY<DOUBLE>"


def anomalies_stateful(stream: DataFrame, keys: list[str],
                       time_col: str, value_col: str, *, n: int,
                       threshold: float = 3.0,
                       min_points: int = 5) -> DataFrame:
    """Streaming twin of ``operators.timeseries.detect_anomalies(n=)``:
    score each arriving point against the trailing n-row baseline of
    its key, across micro-batch boundaries.

    State per key is a bounded ring of the last ``n`` values (null
    rows occupy a slot as NaN, exactly like the batch ROWS frame whose
    aggregates then skip them) — n doubles, not history. Identical
    arithmetic to the batch operator: leave-one-out is structural here
    too (the ring holds only PREVIOUS rows), sample variance
    ``(Σx² − n·μ²)/(n−1)`` clamped at 0, NULL zscore during warm-up /
    zero spread / null value.

    Same in-order caveat as :func:`change_points_stateful`: rows sort
    by ``time_col`` within a micro-batch, but a point arriving in a
    LATER batch than a newer point of its key is scored against the
    newer baseline (streams can't retro-sort); batch equivalence holds
    for in-order feeds (test-pinned)."""
    if n < 2:
        raise ValueError(f"n must be ≥ 2, got {n}")
    if min_points < 2:
        raise ValueError("min_points must be ≥ 2 (std needs 2 values)")
    import math

    dtypes = dict(stream.dtypes)
    key_part = ", ".join(f"{k} {dtypes[k]}" for k in keys)
    out_schema = (f"{key_part}, {time_col} {dtypes[time_col]}, "
                  f"{value_col} DOUBLE, baseline_mean DOUBLE, "
                  f"baseline_std DOUBLE, zscore DOUBLE, "
                  f"is_anomaly BOOLEAN")

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        ring: list[float] = list(state.get[0]) if state.exists else []
        out: list[tuple] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(time_col)
            for t, v in zip(pdf[time_col], pdf[value_col]):
                v = None if v is None or (isinstance(v, float)
                                          and math.isnan(v)) else float(v)
                base = [x for x in ring if not math.isnan(x)]
                cnt = len(base)
                mean = std = z = None
                if cnt >= min_points:
                    mean = sum(base) / cnt
                    var = max((sum(x * x for x in base)
                               - cnt * mean * mean) / (cnt - 1), 0.0)
                    std = math.sqrt(var)
                    if v is not None and std > 0:
                        z = (v - mean) / std
                out.append(key + (t, v, mean, std, z,
                                  bool(z is not None
                                       and abs(z) > threshold)))
                ring.append(math.nan if v is None else v)
                if len(ring) > n:
                    ring = ring[-n:]
        state.update((ring,))
        yield pd.DataFrame(out, columns=list(keys)
                           + [time_col, value_col, "baseline_mean",
                              "baseline_std", "zscore", "is_anomaly"])

    return (stream
            .groupBy(*[F.col(k) for k in keys])
            .applyInPandasWithState(fn, out_schema, _ANOM_STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
