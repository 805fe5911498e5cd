"""Embedding-space transforms: distributed PCA / whitening.

ANN recall and embedding-dedup precision both improve when vectors are
decorrelated and reduced before bucketing (IVF cell shapes, LSH
hyperplane spread); at 100 TB the corpus can't leave the cluster, but
the MODEL (a d×d covariance) trivially fits on the driver. So the
split here is the classic estimator shape:

- :func:`embedding_moments` streams the corpus ONCE through an
  Arrow-batched ``mapInPandas``: each batch emits its (count, sum,
  sum-of-outer-products) partial — numpy matmul per batch, never a
  per-row Python call — and partials are summed on the driver. The
  collected state is one row per Arrow batch (d + d² doubles each),
  bounded by partition count, the same metadata class as a batch
  manifest — NOT corpus-sized.
- :func:`fit_pca` eigendecomposes the d×d covariance on the driver
  (d is 64-4096 in practice; the eig is microseconds-to-seconds and
  happens once per model).
- :func:`project_embeddings` applies the fitted projection with one
  broadcast matrix and numpy matmul per Arrow batch — the scan-speed
  path; an unrolled Catalyst expression would be d×k terms per row
  and blow past codegen limits at real dims.

The reference has no embedding surface; this extends the
beyond-reference similarity stack (operators/similarity.py) with the
standard preprocessing its ANN/dedup operators assume.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, vec_col: str
                      ) -> tuple[int, np.ndarray, np.ndarray]:
    """One-pass global (n, mean, covariance) of an ``array<float>``
    column. NULL vectors are skipped; ragged dims raise inside the
    batch (a corpus mixing dims is a bug upstream)."""
    def partials(it):
        import pandas as pd
        # accumulate across ALL Arrow batches and emit ONE partial per
        # partition — a per-batch yield would make the collected state
        # scale with corpus size (batch count), not partition count,
        # and at d=4096 a single d^2 partial is ~134 MB
        n = 0
        s = ss = None
        for pdf in it:
            vs = [v for v in pdf[vec_col] if v is not None]
            if not vs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
            n += x.shape[0]
            if s is None:
                s = x.sum(axis=0)
                ss = x.T @ x
            else:
                s += x.sum(axis=0)
                ss += x.T @ x
        if n:
            yield pd.DataFrame({
                "n": [n],
                "s": [s.tolist()],
                "ss": [ss.ravel().tolist()],
            })

    rows = (df.select(vec_col)
            .mapInPandas(partials, "n long, s array<double>, ss array<double>")
            .collect())
    if not rows:
        raise ValueError(f"no non-null vectors in {vec_col}")
    d = len(rows[0]["s"])
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


@dataclass(frozen=True)
class PCAModel:
    """Fitted projection: ``y = (x − mean) @ components.T`` (+ optional
    whitening). ``explained_variance`` are the top-k eigenvalues."""
    mean: np.ndarray            # (d,)
    components: np.ndarray      # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,)
    whiten: bool = False


def fit_pca(df: DataFrame, vec_col: str, k: int,
            *, whiten: bool = False) -> PCAModel:
    """Fit a k-component PCA over the corpus (one distributed pass for
    the moments, driver-side eig of the d×d covariance). ``whiten=True``
    scales each component to unit variance — the preprocessing that
    makes euclidean LSH/IVF cells isotropic."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n, mean, cov = embedding_moments(df, vec_col)
    d = mean.shape[0]
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    vals, vecs = np.linalg.eigh(cov)        # ascending
    order = np.argsort(vals)[::-1][:k]
    return PCAModel(mean=mean,
                    components=vecs[:, order].T.copy(),
                    explained_variance=np.maximum(vals[order], 0.0),
                    whiten=whiten)


def project_embeddings(df: DataFrame, vec_col: str, model: PCAModel,
                       out_col: str = "pca") -> DataFrame:
    """Append the projected (and optionally whitened) vector as
    ``array<float>``. One numpy matmul per Arrow batch against the
    broadcast (k, d) matrix; all other columns pass through."""
    mean = model.mean
    w = model.components.T                  # (d, k)
    if model.whiten:
        w = w / np.sqrt(np.maximum(model.explained_variance, 1e-12))
    from pyspark.sql.types import (
        ArrayType, FloatType, StructField, StructType,
    )
    cols = df.columns
    # never .schema.add(): StructType.add mutates the DataFrame's own
    # cached schema object in place, corrupting df.columns
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, ArrayType(FloatType()))])

    def proj(it):
        for pdf in it:
            vs = pdf[vec_col]
            out = []
            for v in vs:
                if v is None:
                    out.append(None)
                else:
                    y = (np.asarray(v, dtype=np.float64) - mean) @ w
                    out.append(y.astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(proj, schema).select(*cols, out_col)
