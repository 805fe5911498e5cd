"""Mergeable HLL distinct-count sketches: accuracy envelope vs exact,
lossless mergeability (rollup == direct build), cascade composition,
and the all-JVM plan contract."""

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    distinct_rollup_check, distinct_sketch, rollup_distinct,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return ev.select("user_id", "event_type", "event_id")


def test_estimate_within_envelope(spark, events):
    """Per-group estimate lands inside the 3σ (~2.5% at lg_k=14)
    envelope of the exact distinct count, for every group."""
    chk = distinct_rollup_check(events, ["event_type"], ["event_type"],
                                "user_id")
    rows = chk.collect()
    assert rows and all(r["sketch_ok"] for r in rows)


def test_rollup_merges_losslessly(spark, events):
    """Sketches built at (event_type, user bucket) granularity and
    merged to event_type estimate EXACTLY what a direct event_type
    sketch estimates — HLL union at equal lg_k is lossless, which is
    the property that makes persisted fine-grained sketches answer any
    coarser rollup without touching raw data."""
    fine = distinct_sketch(
        events.withColumn("bucket", F.col("user_id") % 7),
        ["event_type", "bucket"], "event_id")
    via_merge = {r["event_type"]: r["approx_distinct"]
                 for r in rollup_distinct(fine, ["event_type"]).collect()}
    direct = {r["event_type"]: r["approx_distinct"]
              for r in rollup_distinct(
                  distinct_sketch(events, ["event_type"], "event_id"),
                  ["event_type"]).collect()}
    assert via_merge == direct


def test_cascade_composes(spark, events):
    """A rollup's merged sketch (keep_sketch=True) is itself a valid
    input to a further rollup — tiers compose like downsample_cascade."""
    fine = distinct_sketch(
        events.withColumn("bucket", F.col("user_id") % 7),
        ["event_type", "bucket"], "user_id")
    mid = rollup_distinct(fine, ["event_type"], keep_sketch=True)
    total = rollup_distinct(mid, [], estimate_col="n").first()["n"]
    exact = events.agg(F.countDistinct("user_id")).first()[0]
    assert abs(total - exact) <= 0.025 * exact


def test_global_sketch_requires_group(spark, events):
    with pytest.raises(ValueError):
        distinct_sketch(events, [], "user_id")


def test_sketch_plan_is_jvm_only(spark, events):
    """The whole sketch build + merge plan is JVM aggregates — no
    Python evaluation nodes, and partial (map-side) aggregation is
    present before the exchange, so raw rows never shuffle."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    df = rollup_distinct(
        distinct_sketch(events, ["event_type"], "user_id"),
        ["event_type"])
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial sketch aggregation runs below the exchange (map-side)
    assert plan.index("ObjectHashAggregate") < plan.index("Exchange")


# ------------------------------------------------------- count-min sketch

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (  # noqa: E402
    freq_estimate, freq_sketch, rollup_freq,
)


@pytest.fixture(scope="module")
def tokens_df(spark):
    """Skewed token stream: value i appears ~N/i times (zipf-ish)."""
    rows = []
    for i in range(1, 200):
        rows += [(f"tok{i}", d) for d in range(max(1, 2000 // i))]
    return spark.createDataFrame(rows, "token string, src int").select(
        "token", (F.col("src") % 3).alias("part"))


def test_cm_estimate_one_sided_and_in_envelope(spark, tokens_df):
    """CM guarantees: estimate >= true always; <= true + eps*N for
    every probe here (deterministic given the fixed hash family)."""
    sk = freq_sketch(tokens_df, [], "token")
    exact = {r.token: r.n for r in
             tokens_df.groupBy("token").agg(F.count("*").alias("n"))
             .collect()}
    n_total = sum(exact.values())
    eps_n = (2.718281828 / 2048) * n_total
    probes = tokens_df.select("token").distinct()
    est = {r.token: r.approx_count for r in
           freq_estimate(sk, probes, "token").collect()}
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert est[t] >= n, t
        assert est[t] <= n + eps_n + 1, t
    # a never-seen value estimates exactly 0 (absent cells count 0)
    ghost = spark.createDataFrame([("never-seen-xyz",)], "token string")
    assert freq_estimate(sk, ghost, "token").first().approx_count == 0


def test_cm_merge_equals_direct_build(spark, tokens_df):
    """rollup_freq over per-part sketches == the direct global sketch,
    cell for cell (CM merging is exact addition, not approximation)."""
    per_part = freq_sketch(tokens_df, ["part"], "token")
    merged = rollup_freq(per_part, [])
    direct = freq_sketch(tokens_df, [], "token")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cm_weighted_build(spark):
    """weight_col counts each row with its weight — equal to unweighted
    build over the expanded stream."""
    w = spark.createDataFrame([("a", 5), ("b", 2), ("a", 1)],
                              "v string, n int")
    expanded = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 2, "v string")
    sk_w = freq_sketch(w, [], "v", weight_col="n")
    sk_e = freq_sketch(expanded, [], "v")
    assert sk_w.exceptAll(sk_e).count() == 0
    assert sk_e.exceptAll(sk_w).count() == 0


def test_cm_sketch_bounded_and_mapside_partial(spark, tokens_df):
    """Sketch row count is bounded by depth*width regardless of
    distinct values, and partial aggregation runs below the exchange."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    sk = freq_sketch(tokens_df, [], "token", depth=3, width=64)
    assert sk.count() <= 3 * 64
    plan = formatted_plan(sk)
    assert plan.index("HashAggregate") < plan.index("Exchange")
    with pytest.raises(ValueError):
        freq_sketch(tokens_df, [], "token", depth=0)


# ------------------------------------------------ histogram / quantiles

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (  # noqa: E402
    histogram_sketch, quantile_estimate, rollup_histogram,
)


def test_histogram_quantiles_within_one_bin(spark):
    """Estimated quantiles land within one bin width of the exact
    quantile, per group, for a non-uniform distribution."""
    import numpy as np
    rng = np.random.default_rng(11)
    vals = {"a": np.concatenate([rng.normal(20, 5, 4000),
                                 rng.normal(70, 2, 1000)]),
            "b": rng.exponential(10, 3000)}
    rows = [(g, float(v)) for g, arr in vals.items() for v in arr]
    df = spark.createDataFrame(rows, "g string, v double")
    lo, hi, bins = 0.0, 100.0, 500
    binw = (hi - lo) / bins
    sk = histogram_sketch(df, ["g"], "v", lo=lo, hi=hi, bins=bins)
    probs = [0.1, 0.5, 0.9, 0.99]
    est = {(r.g, r.prob): r.quantile_est for r in
           quantile_estimate(sk, ["g"], probs, lo=lo, hi=hi, bins=bins)
           .collect()}
    for g, arr in vals.items():
        clipped = np.clip(arr, lo, hi)
        for p in probs:
            exact = float(np.quantile(clipped, p))
            assert abs(est[(g, p)] - exact) <= binw + 1e-9, (g, p)


def test_histogram_merge_equals_direct(spark):
    """rollup_histogram over per-part sketches == direct build, bin
    for bin (merging is exact addition), and the sentinel bins keep
    out-of-range mass."""
    rows = [(i % 4, float(i)) for i in range(-50, 250)]
    df = spark.createDataFrame(rows, "part int, v double")
    per = histogram_sketch(df, ["part"], "v", lo=0.0, hi=100.0, bins=10)
    merged = rollup_histogram(per, [])
    direct = histogram_sketch(df, [], "v", lo=0.0, hi=100.0, bins=10)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    cnts = {r._bin: r.cnt for r in direct.collect()}
    assert cnts[-1] == 50 and cnts[10] == 150  # clamped mass retained
    assert sum(cnts.values()) == 300


def test_histogram_quantile_sentinels_and_validation(spark):
    df = spark.createDataFrame([(float(v),) for v in range(-10, 10)],
                               "v double")
    sk = histogram_sketch(df, [], "v", lo=0.0, hi=5.0, bins=5)
    est = {r.prob: r.quantile_est for r in
           quantile_estimate(sk, [], [0.0, 1.0], lo=0.0, hi=5.0, bins=5)
           .collect()}
    assert est[0.0] == 0.0   # below-lo mass reports the lo edge
    assert est[1.0] == 5.0   # at/above-hi mass reports the hi edge
    import pytest as _pt
    with _pt.raises(ValueError):
        histogram_sketch(df, [], "v", lo=1.0, hi=1.0)
    with _pt.raises(ValueError):
        quantile_estimate(sk, [], [1.5], lo=0.0, hi=5.0, bins=5)


def test_histogram_psi_detects_shift_and_matches_python_oracle(spark):
    """PSI over persisted histogram sketches: ~0 for same-distribution
    halves, large for a shifted group, exact vs the hand-computed
    smoothed formula, NULL when a group exists on one side only."""
    import math
    import random

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import histogram_psi
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sketches import (
        histogram_sketch,
    )

    rng = random.Random(9)
    # group "stable": same gaussian both periods; "shifted": mean moves
    old_rows = ([("stable", rng.gauss(50, 10)) for _ in range(4000)]
                + [("shifted", rng.gauss(50, 10)) for _ in range(4000)]
                + [("gone", rng.gauss(50, 10)) for _ in range(500)])
    new_rows = ([("stable", rng.gauss(50, 10)) for _ in range(4000)]
                + [("shifted", rng.gauss(75, 10)) for _ in range(4000)])
    lo, hi, bins = 0.0, 100.0, 20
    old = histogram_sketch(spark.createDataFrame(old_rows, "g string, v double"),
                           ["g"], "v", lo=lo, hi=hi, bins=bins)
    new = histogram_sketch(spark.createDataFrame(new_rows, "g string, v double"),
                           ["g"], "v", lo=lo, hi=hi, bins=bins)
    got = {r.g: r for r in histogram_psi(old, new, ["g"]).collect()}

    assert got["stable"].psi < 0.05
    assert got["shifted"].psi > 0.5
    assert got["gone"].psi is None            # no new-side basis
    assert got["stable"].n_old == 4000 and got["stable"].n_new == 4000

    # exact oracle on the shifted group from the sketch cells
    oc = {r._bin: r.cnt for r in old.where("g = 'shifted'").collect()}
    nc = {r._bin: r.cnt for r in new.where("g = 'shifted'").collect()}
    cells = sorted(set(oc) | set(nc))
    s, to, tn, nb = 0.5, sum(oc.values()), sum(nc.values()), len(cells)
    want = 0.0
    for b in cells:
        p = (oc.get(b, 0) + s) / (to + s * nb)
        q = (nc.get(b, 0) + s) / (tn + s * nb)
        want += (p - q) * math.log(p / q)
    assert abs(got["shifted"].psi - want) < 1e-9


def test_histogram_psi_global_no_groups(spark):
    """group_cols=[] computes ONE corpus-level psi row."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import histogram_psi
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sketches import (
        histogram_sketch,
    )

    a = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(1000).select(((F.col("id") % 100) + 30).cast("double").alias("v"))
    sa = histogram_sketch(a, [], "v", lo=0.0, hi=100.0, bins=10)
    sb = histogram_sketch(b, [], "v", lo=0.0, hi=100.0, bins=10)
    rows = histogram_psi(sa, sb, []).collect()
    assert len(rows) == 1 and rows[0].psi > 0.1
    same = histogram_psi(sa, sa, []).collect()
    assert abs(same[0].psi) < 1e-12
