"""Sessionization / change-point operators (SURVEY §2.5 #41).

The reference detects "person in lane" scenes with a lag → state
transition (start/end) → lead pairing (detect_scenes.py:192-222).
Both that change-point shape and classic gap-based sessionization are
gaps-and-islands window patterns: one shuffle on the entity key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tag_sessions(df: DataFrame, keys: list[str], time_col: str,
                  gap: float) -> DataFrame:
    """Gaps-and-islands session tagging shared by :func:`sessionize`
    and :func:`funnel_per_session`: appends ``session_id`` (0-based per
    key, split where the time gap exceeds ``gap``). Raises if the input
    already carries a ``session_id``/``_new`` column — silently
    overwriting caller-assigned sessions would answer a different
    question than the caller asked."""
    clash = {"session_id", "_new"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has column(s) {sorted(clash)}; "
                         "rename them (or funnel within your own "
                         "session column directly)")
    w = Window.partitionBy(*keys).orderBy(time_col)
    t = F.col(time_col)
    new_session = F.when(
        (t - F.lag(time_col, 1).over(w)) > F.lit(gap), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(time_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (df.withColumn("_new", new_session)
            .withColumn("session_id", F.sum("_new").over(run))
            .drop("_new"))


def sessionize(df: DataFrame, keys: list[str], time_col: str,
               gap: float, agg_cols: dict | None = None) -> DataFrame:
    """Split each key's event stream into sessions separated by more
    than ``gap`` time units; emit one interval row per session.

    Returns ``keys + [session_id, start_time, end_time, n_events]`` plus
    any extra aggregates from ``agg_cols`` ({out_name: Column}).
    """
    sessions = _tag_sessions(df, keys, time_col, gap)
    aggs = [
        F.min(time_col).alias("start_time"),
        F.max(time_col).alias("end_time"),
        F.count(F.lit(1)).alias("n_events"),
    ] + [expr.alias(name) for name, expr in (agg_cols or {}).items()]
    return sessions.groupBy(*keys, "session_id").agg(*aggs)


def change_point_intervals(df: DataFrame, keys: list[str], time_col: str,
                           state: Column,
                           extra_cols: list[str] | None = None) -> DataFrame:
    """Pair rising edges of a boolean ``state`` with the next falling
    edge, emitting ``(start_time, end_time)`` interval rows — the
    reference's scene summarization (detect_scenes.py:192-222) with
    ``when/otherwise`` instead of a scalar Python UDF
    (detect_scenes.py:192-193).

    A state still active at the last row yields ``end_time = NULL``
    (open interval), matching the reference's lead() behavior.
    """
    w = Window.partitionBy(*keys).orderBy(time_col)
    s = state.cast("int")
    marked = df.withColumn("_s", s).withColumn("_s_lag", F.lag("_s", 1).over(w))
    transition = (
        F.when((F.col("_s") == 1) & (F.col("_s_lag") == 0), F.lit("start"))
        .when((F.col("_s") == 0) & (F.col("_s_lag") == 1), F.lit("end"))
        .when((F.col("_s") == 1) & F.col("_s_lag").isNull(), F.lit("start"))
    )
    edges = (marked.withColumn("_tr", transition)
             .where(F.col("_tr").isNotNull()))
    w2 = Window.partitionBy(*keys).orderBy(time_col)
    paired = (edges
              .withColumn("_next_time", F.lead(time_col, 1).over(w2))
              .where(F.col("_tr") == "start"))
    out = paired.select(
        *keys,
        F.col(time_col).alias("start_time"),
        F.col("_next_time").alias("end_time"),
        *(extra_cols or []),
    )
    return out.withColumn("interval_length", F.col("end_time") - F.col("start_time"))


def merge_intervals(df: DataFrame, keys: list[str], start_col: str,
                    end_col: str) -> DataFrame:
    """Union overlapping-or-touching intervals per key into maximal
    disjoint spans — the cleanup step after interval-producing
    operators (scene intervals from ``change_point_intervals``,
    sessions, detection windows): output ``(keys…, start, end,
    n_merged)`` where consecutive inputs with ``start <= running
    max(end)`` coalesce.

    Gaps-and-islands shape: ONE window pass (running max of end over
    strictly-preceding rows flags island starts; a running sum numbers
    the islands) + one aggregate — both hash-partitioned on ``keys``,
    so the plan has a single exchange. SQL-portable (plain window
    functions), covered by a DuckDB oracle in tests/test_timeseries.py.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(start_col).asc(),
                                          F.col(end_col).asc())
    prev_max = (F.max(end_col)
                .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    new_island = F.when(prev_max.isNull()
                        | (F.col(start_col) > prev_max), 1).otherwise(0)
    island = (F.sum(new_island)
              .over(w.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)))
    return (df
            .withColumn("_island", island)
            .groupBy(*keys, "_island")
            .agg(F.min(start_col).alias(start_col),
                 F.max(end_col).alias(end_col),
                 F.count(F.lit(1)).cast("bigint").alias("n_merged"))
            .drop("_island"))


def funnel(df: DataFrame, keys: list[str], time_col: str,
           event_col: str, steps: list[str],
           horizon: float | None = None) -> DataFrame:
    """Ordered funnel completion per key: for the step sequence
    ``steps = [s1, s2, …]``, find each key's earliest ``s1``, then the
    earliest ``s2`` strictly after it, and so on → one row per key that
    reached step 1, with columns ``step_1_t … step_k_t`` (NULL once the
    funnel stalls) and ``steps_completed``. ``horizon`` bounds the whole
    funnel to ``step_1_t + horizon`` (the "converted within N minutes"
    form). The classic product-analytics sequence query, expressed as
    (k−1) chained earliest-occurrence joins.

    Shape: step i is ``filter(event = sᵢ) ⋈ keys`` against the
    accumulated prefix, then a min-aggregate over (keys, prefix times)
    — prefix times are functionally dependent on the keys, so the
    grouping key stays the entity key. k−1 key-hash shuffles total,
    each over only that step's event subset (the filter runs in the
    scan), never a window over the whole stream, and no driver
    iteration count depends on data — only on ``len(steps)``.

    Greedy earliest-match semantics — the standard funnel definition,
    with its standard caveat: the funnel anchors at each key's EARLIEST
    s1, so with a ``horizon`` set, a user who abandons one attempt and
    restarts later (view@day0, view@day4, click@day5, horizon=3d) is
    counted against the day-0 anchor and reported as stalled even
    though the day-4 attempt converted. Windowed/per-attempt funnels
    are a different (sessionize-then-funnel) query: split attempts
    with :func:`sessionize` first and funnel within each session."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    t, e = F.col(time_col), F.col(event_col)
    cur = (df.where(e == steps[0]).groupBy(*keys)
           .agg(F.min(t).alias("step_1_t")))
    for i, s in enumerate(steps[1:], start=2):
        prev_cols = [f"step_{j}_t" for j in range(1, i)]
        cond = t > F.col(f"step_{i - 1}_t")
        if horizon is not None:
            cond = cond & (t <= F.col("step_1_t") + F.lit(horizon))
        nxt = (df.where(e == s).join(cur, keys)
               .where(cond)
               .groupBy(*keys, *prev_cols)
               .agg(F.min(t).alias(f"step_{i}_t"))
               .select(*keys, f"step_{i}_t"))
        cur = cur.join(nxt, keys, "left")
    done = sum(F.col(f"step_{i}_t").isNotNull().cast("int")
               for i in range(1, len(steps) + 1))
    return cur.withColumn("steps_completed", done.cast("int"))


def funnel_per_session(df: DataFrame, keys: list[str], time_col: str,
                       event_col: str, steps: list[str], gap: float,
                       horizon: float | None = None) -> DataFrame:
    """Per-ATTEMPT funnel: split each key's stream into sessions
    separated by more than ``gap`` (same islands logic as
    :func:`sessionize`), then run :func:`funnel` within each
    (key, session) — so a user who abandons and restarts is measured
    per attempt instead of being pinned to their earliest step-1 (the
    greedy-anchor caveat in funnel's docstring). One extra window over
    the same key partitioning (:func:`_tag_sessions` — the same
    boundary semantics as :func:`sessionize`, by construction), then
    the funnel's usual k−1 joins keyed on (keys…, session_id)."""
    tagged = _tag_sessions(df, keys, time_col, gap)
    return funnel(tagged, [*keys, "session_id"], time_col, event_col,
                  steps, horizon=horizon)
