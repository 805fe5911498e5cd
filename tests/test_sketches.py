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
