"""Streaming transforms: watermark dedup, session windows, windowed aggs.

All operators take event time as **integer microseconds** (the engine's
native time representation, see ``__spark_entry__`` conventions) and
derive the TIMESTAMP column Structured Streaming needs internally.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_event_time(df: DataFrame, time_us_col: str,
                     out: str = "_event_time") -> DataFrame:
    return df.withColumn(out, F.timestamp_micros(F.col(time_us_col)))


def dedup_stream(stream: DataFrame, id_cols: list[str], time_us_col: str,
                 watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once-ish event dedup with bounded state.

    The reference's only dedup is "skip if a RUNNING execution with this
    BatchId exists" (trigger.py:55-68) and it has **no** late-data story
    (SURVEY #50). Here: watermark bounds state, duplicates of ``id_cols``
    arriving within the watermark are dropped. State size is
    O(distinct ids within watermark), independent of stream length.
    """
    return (_with_event_time(stream, time_us_col)
            .withWatermark("_event_time", watermark)
            .dropDuplicatesWithinWatermark(id_cols)
            .drop("_event_time"))


def sessionize_stream(stream: DataFrame, keys: list[str], time_us_col: str,
                      gap: str = "30 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming gap sessionization via event-time session windows —
    the streaming form of ``operators.sessionize`` (SURVEY #41).

    Emits one row per closed session:
    ``keys + [start_time, end_time, n_events]`` with times back in
    integer microseconds. Sessions close when the watermark passes the
    gap; state is per-open-session only.
    """
    ev = _with_event_time(stream, time_us_col)
    return (ev.withWatermark("_event_time", watermark)
            .groupBy(*keys, F.session_window("_event_time", gap))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(time_us_col).alias("start_time"),
                 F.max(time_us_col).alias("end_time"))
            .select(*keys, "start_time", "end_time", "n_events"))


def windowed_agg(stream: DataFrame, keys: list[str], time_us_col: str,
                 aggs: dict[str, Column], window: str = "1 hour",
                 slide: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Tumbling (or sliding) event-time aggregation with a watermark —
    the engine-native version of the trigger Lambda's per-batch counters
    (``NumFiles += 1``, ``FileSizeKb += size``; trigger.py:137-147,
    SURVEY #35), with late rows handled by the watermark instead of
    silently landing in the next batch (SURVEY #50).

    ``aggs`` maps output name → aggregate Column. Window bounds are
    returned as integer microseconds ``window_start``/``window_end``.
    """
    ev = _with_event_time(stream, time_us_col)
    win = (F.window("_event_time", window, slide)
           if slide else F.window("_event_time", window))
    return (ev.withWatermark("_event_time", watermark)
            .groupBy(*keys, win.alias("_w"))
            .agg(*[expr.alias(name) for name, expr in aggs.items()])
            .select(*keys,
                    F.unix_micros(F.col("_w.start")).alias("window_start"),
                    F.unix_micros(F.col("_w.end")).alias("window_end"),
                    *aggs.keys()))


def interval_join_stream(left: DataFrame, right: DataFrame,
                         keys: list[str], time_us_col: str,
                         tolerance_us: int,
                         watermark: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream inner interval join: each ``right`` row
    is matched to ``left`` rows with equal ``keys`` and
    ``right.time ∈ [left.time, left.time + tolerance_us]``.

    The reference has no stream-side join at all — its trigger Lambda
    correlates files to batches by key lookup in DynamoDB
    (trigger.py:110-147). This is the engine-native generalization:
    correlate two live event streams by key within a time tolerance.

    Scale contract: the range condition is expressed on the two
    **event-time** columns, which is what lets Spark bound the join
    state — each side buffers only rows younger than
    ``watermark + tolerance`` (state is O(rate × horizon), independent
    of stream length). Both inputs must carry ``time_us_col`` as
    integer microseconds; non-key columns come back prefixed ``l_`` /
    ``r_``. Stream-stream joins are append-mode only, so compose any
    downstream aggregation in the sink's batch (``foreachBatch``) or
    on the joined output table.
    """
    lt, rt = "_l_event_time", "_r_event_time"
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    l = (_with_event_time(left, time_us_col, lt)
         .withWatermark(lt, watermark)
         .select(*keys, *[F.col(c).alias(f"l_{c}") for c in lcols], lt)
         .alias("__l"))
    r = (_with_event_time(right, time_us_col, rt)
         .withWatermark(rt, watermark)
         .select(*keys, *[F.col(c).alias(f"r_{c}") for c in rcols], rt)
         .alias("__r"))
    conds = [F.col(f"__l.{k}") == F.col(f"__r.{k}") for k in keys]
    conds.append(F.col(rt) >= F.col(lt))
    conds.append(F.col(rt) <= F.col(lt) + F.expr(
        f"INTERVAL {int(tolerance_us)} MICROSECOND"))
    joined = l.join(r, functools.reduce(lambda a, b: a & b, conds), "inner")
    return joined.select(
        *[F.col(f"__l.{k}") for k in keys],
        *[f"l_{c}" for c in lcols],
        *[f"r_{c}" for c in rcols])
