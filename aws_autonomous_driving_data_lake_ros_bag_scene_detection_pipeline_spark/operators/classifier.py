"""Trainable quality classifier head: distributed logistic regression.

Corpus filtering at 100 TB typically ends in a tiny linear model over
cheap per-document features (the fasttext-style quality classifier in
published pretraining pipelines): the MODEL is a d-vector that fits on
the driver, the DATA never leaves the cluster, and scoring must run at
scan speed. The split mirrors :mod:`.embeddings`:

- :func:`fit_logistic` runs full-batch gradient descent: each
  iteration is ONE distributed pass where every Arrow batch emits its
  (count, gradient-sum, loss-sum) partial via ``mapInPandas`` (numpy
  matmul per batch, weights shipped in the task closure), and the
  driver sums partials and updates. Iterations are passes over the
  data — cache the (features, label) projection for multi-iteration
  fits, which the trainer does for you via ``.persist()`` unless told
  not to.
- :func:`score_logistic` applies the fitted model as a PURE Catalyst
  expression — ``sigmoid(w·x + b)`` built from ``zip_with`` +
  ``aggregate`` against a literal weight array — so the 100 TB scoring
  scan never crosses the Arrow boundary at all. (Training pays Python
  once per iteration; inference pays it never.)

Numerics: loss uses the log-sum-exp-stable form; L2 regularization
excludes the bias, matching the standard formulation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LogisticModel:
    weights: np.ndarray         # (d,)
    bias: float
    losses: tuple               # per-iteration mean log-loss (driver log)


def fit_logistic(df: DataFrame, features_col: str, label_col: str,
                 *, iters: int = 60, lr: float = 1.0, l2: float = 0.0,
                 standardize: bool = True,
                 cache: bool = True) -> LogisticModel:
    """Fit binary logistic regression over an ``array<float|double>``
    feature column and a 0/1 label. Full-batch GD with a decaying step
    (lr / sqrt(1+t)); returns the model plus the per-iteration loss
    trace so a caller can see convergence instead of trusting it.

    ``standardize`` (default) z-scores features internally from a
    one-pass moment estimate — raw-scale features (doc lengths next to
    ratios) otherwise condition GD so badly that any single step size
    diverges on one axis while crawling on another. The fitted weights
    are mapped BACK to raw feature space before returning
    (w_raw = w_std/σ, b_raw = b_std − Σ w_std·μ/σ), so scoring stays a
    plain dot product and the standardization never leaves the
    trainer. L2 applies in the standardized space (the scale-free
    formulation)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    data = df.select(F.col(features_col).cast("array<double>").alias("x"),
                     F.col(label_col).cast("double").alias("y")) \
             .where(F.col(features_col).isNotNull()
                    & F.col(label_col).isNotNull())
    if cache:
        data = data.persist()
    try:
        first = data.first()
        if first is None:
            raise ValueError("no rows with non-null features and label")
        d = len(first["x"])
        if standardize:
            mrow = data.select(
                F.count(F.lit(1)).alias("n"),
                F.array(*[F.avg(F.col("x")[i]) for i in range(d)])
                 .alias("mu"),
                F.array(*[F.avg(F.col("x")[i] * F.col("x")[i])
                          for i in range(d)]).alias("m2")).first()
            mu = np.asarray(mrow["mu"], dtype=np.float64)
            var = np.asarray(mrow["m2"], dtype=np.float64) - mu * mu
            sd = np.sqrt(np.maximum(var, 1e-12))
        else:
            mu, sd = np.zeros(d), np.ones(d)
        w = np.zeros(d)
        b = 0.0
        losses = []

        def one_pass(w_now, b_now):
            def partials(it):
                import pandas as pd
                for pdf in it:
                    x = np.asarray([np.asarray(v, dtype=np.float64)
                                    for v in pdf["x"]])
                    x = (x - mu) / sd
                    y = pdf["y"].to_numpy()
                    z = x @ w_now + b_now
                    p = 1.0 / (1.0 + np.exp(-z))
                    err = p - y
                    # stable log-loss: log(1+e^z) - y*z via logaddexp
                    ll = np.logaddexp(0.0, z) - y * z
                    yield pd.DataFrame({
                        "n": [len(y)],
                        "g": [(x.T @ err).tolist()],
                        "gb": [float(err.sum())],
                        "loss": [float(ll.sum())],
                    })
            rows = data.mapInPandas(
                partials,
                "n long, g array<double>, gb double, loss double").collect()
            n = sum(r["n"] for r in rows)
            g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
            gb = sum(r["gb"] for r in rows)
            loss = sum(r["loss"] for r in rows)
            return n, g, gb, loss

        for t in range(iters):
            n, g, gb, loss = one_pass(w, b)
            step = lr / np.sqrt(1.0 + t)
            w -= step * (g / n + l2 * w)
            b -= step * (gb / n)
            losses.append(loss / n + 0.5 * l2 * float(w @ w))
        # map back to raw feature space so scoring is a plain dot
        w_raw = w / sd
        b_raw = b - float((w * mu / sd).sum())
        return LogisticModel(weights=w_raw, bias=b_raw,
                             losses=tuple(losses))
    finally:
        if cache:
            data.unpersist()


def score_logistic(df: DataFrame, features_col: str,
                   model: LogisticModel,
                   out_col: str = "score") -> DataFrame:
    """Append ``sigmoid(w·x + b)`` as a double column — all Catalyst
    expressions (literal weight array + ``zip_with``/``aggregate``), no
    Python anywhere in the scoring scan."""
    return df.withColumn(out_col,
                         logistic_expr(features_col, model))


def logistic_expr(features_col: str, model: LogisticModel) -> Column:
    w = F.array(*[F.lit(float(v)) for v in model.weights])
    x = F.col(features_col).cast("array<double>")
    z = F.aggregate(F.zip_with(x, w, lambda a, b: a * b),
                    F.lit(float(model.bias)), lambda acc, v: acc + v)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
