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


def test_text_features_train_quality_classifier(spark):
    """End-to-end quality head over the real documents table:
    text_feature_vector (pure Catalyst featurizer) + fit_logistic
    separates noise-salted documents (punctuation/digit spam appended
    to half the corpus) from clean ones — the trainable filter composed
    from the engine's own pieces. (The corpus's lang column is NOT
    text-derivable in this synthetic data, so the quality target is the
    honest learnable one.)"""
    from tests.conftest import SF_DIR
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
        text_feature_vector,
    )

    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    noise = F.concat(F.col("text"),
                     F.lit(" !!!! ???? 0123456789 $$$$ 9876543210 !!"))
    docs = (raw.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, noise).otherwise(F.col("text"))
         .alias("text"),
        (F.col("doc_id") % 2 == 0).cast("int").alias("y"))
        .select("doc_id", "y", text_feature_vector("text").alias("f")))
    model = fit_logistic(docs, "f", "y", iters=30, lr=1.0)
    assert model.losses[-1] < model.losses[0]
    scored = score_logistic(docs, "f", model)
    acc = (scored.select(((F.col("score") > 0.5).cast("int")
                          == F.col("y")).cast("int").alias("ok"))
           .agg(F.avg("ok")).first()[0])
    assert acc > 0.97
    # featurizing is a pure projection: no exchange, no Python
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
        formatted_plan,
    )
    plan = formatted_plan(docs)
    assert "Exchange" not in plan and "EvalPython" not in plan
