"""Data-quality expectations (operators/expectations.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    check_expectations, violation_samples,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
    formatted_plan,
)


@pytest.fixture()
def messy(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, "x@y.com"),
         (2, "a", -3.0, "bad"),        # range + matches violations
         (2, "b", 5.0, "p@q.org"),     # duplicate id
         (4, None, 120.0, None),       # null cat, over-range, null email
         (5, "c", 50.0, "r@s.net")],
        "id long, cat string, v double, email string")


def test_check_expectations_report(spark, messy):
    rules = [
        {"type": "unique", "cols": ["id"]},
        {"type": "not_null", "col": "cat"},
        {"type": "range", "col": "v", "min": 0.0, "max": 100.0},
        {"type": "values_in", "col": "cat", "values": ["a", "b", "c"]},
        {"type": "matches", "col": "email",
         "pattern": r"^[^@]+@[^@]+\.[a-z]+$"},
        {"type": "row_count_min", "n": 3},
        {"type": "row_count_min", "n": 10},
    ]
    got = {(r.rule, r.column): (r.passed, r.n_violations)
           for r in check_expectations(messy, rules).collect()}
    assert got[("unique", "id")] == (False, 1)
    assert got[("not_null", "cat")] == (False, 1)
    assert got[("range", "v")] == (False, 2)
    assert got[("values_in", "cat")] == (True, 0)   # NULL doesn't violate
    assert got[("matches", "email")] == (False, 1)
    assert got[("row_count_min", None)] == (False, 5)

    with pytest.raises(ValueError):
        check_expectations(messy, [])
    with pytest.raises(ValueError):
        check_expectations(messy, [{"type": "nope"}])


def test_row_rules_share_one_aggregate_pass(spark, messy):
    """All row-level rules fold into ONE scan/aggregate (single leaf)."""
    import re

    rules = [{"type": "not_null", "col": "cat"},
             {"type": "range", "col": "v", "min": 0.0},
             {"type": "matches", "col": "email", "pattern": "@"}]
    aggs = [F.count(F.lit(1)).alias("_n")]
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.expectations import (
        _row_violation,
    )
    for i, r in enumerate(rules):
        aggs.append(F.sum(_row_violation(r).cast("long")).alias(f"v{i}"))
    plan = formatted_plan(messy.agg(*aggs))
    leaves = re.findall(r"^\(\d+\) Scan", plan, re.M)
    assert len(leaves) <= 1


def test_violation_samples_bounded(spark, messy):
    bad = violation_samples(messy, {"type": "range", "col": "v",
                                    "min": 0.0, "max": 100.0}, limit=1)
    assert bad.count() == 1
    dups = violation_samples(messy, {"type": "unique", "cols": ["id"]})
    assert [r.id for r in dups.collect()] == [2]
    with pytest.raises(ValueError):
        violation_samples(messy, {"type": "row_count_min", "n": 1})


def test_expectations_on_real_table(spark):
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    rep = {r.rule: r for r in check_expectations(orders, [
        {"type": "unique", "cols": ["o_orderkey"]},
        {"type": "not_null", "col": "o_custkey"},
        {"type": "range", "col": "o_totalprice", "min": 0.0},
        {"type": "row_count_min", "n": 100},
    ]).collect()}
    assert all(r.passed for r in rep.values())
