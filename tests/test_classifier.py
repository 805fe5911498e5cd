"""Distributed logistic regression (operators/classifier.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    fit_logistic, score_logistic,
)


def _toy(spark, n=400, seed=5):
    """Linearly separable-ish 2-class blobs in 6 dims."""
    rng = np.random.default_rng(seed)
    mu0 = np.array([2, -2, 1, 0, 0, 0], dtype=float)
    x0 = rng.normal(size=(n // 2, 6)) + mu0
    x1 = rng.normal(size=(n // 2, 6)) - mu0
    rows = ([(i, v.astype(np.float32).tolist(), 0) for i, v in enumerate(x0)]
            + [(i + n, v.astype(np.float32).tolist(), 1)
               for i, v in enumerate(x1)])
    return (spark.createDataFrame(rows, "id long, f array<float>, y int"),
            np.vstack([x0, x1]).astype(np.float32),
            np.r_[np.zeros(n // 2), np.ones(n // 2)])


def test_fit_converges_and_scores_match_numpy(spark):
    df, x, y = _toy(spark)
    model = fit_logistic(df, "f", "y", iters=40, lr=1.0)
    # loss strictly decreased and ended low
    assert model.losses[-1] < model.losses[0] / 3
    assert model.losses[-1] < 0.2
    scored = score_logistic(df, "f", model)
    got = {r.id: r.score for r in scored.collect()}
    # catalyst scoring == numpy sigmoid to float tolerance
    z = x.astype(np.float64) @ model.weights + model.bias
    p = 1 / (1 + np.exp(-z))
    for i, r in enumerate(sorted(got)):
        assert abs(got[r] - p[i]) < 1e-6
    # accuracy on the training blobs
    acc = np.mean((p > 0.5) == (y == 1))
    assert acc > 0.97
    # the scoring plan has no Python nodes
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    plan = formatted_plan(scored)
    assert "EvalPython" not in plan


def test_fit_partition_invariant_and_validation(spark):
    df, _, _ = _toy(spark, n=200)
    m1 = fit_logistic(df, "f", "y", iters=8, lr=0.5)
    m2 = fit_logistic(df.repartition(13), "f", "y", iters=8, lr=0.5)
    assert np.allclose(m1.weights, m2.weights, atol=1e-9)
    assert abs(m1.bias - m2.bias) < 1e-9
    with pytest.raises(ValueError):
        fit_logistic(df, "f", "y", iters=0)
    with pytest.raises(ValueError):
        fit_logistic(df.where("y > 5"), "f", "y")


def test_l2_shrinks_weights(spark):
    df, _, _ = _toy(spark, n=200)
    m0 = fit_logistic(df, "f", "y", iters=20, lr=1.0, l2=0.0)
    m1 = fit_logistic(df, "f", "y", iters=20, lr=1.0, l2=0.5)
    assert np.linalg.norm(m1.weights) < np.linalg.norm(m0.weights)
