"""Embedding dimensionality reduction: exact-covariance PCA.

The embedding face of corpus curation keeps growing columns of
``array<float>``; before ANN indexing or clustering, the standard
move is a PCA projection (smaller vectors → cheaper GEMMs, often
better recall per byte). This is the classic two-job shape:

1. :func:`pca_fit` — ONE distributed aggregation produces the exact
   (d, d) Gram matrix and mean vector: each Arrow batch contributes a
   numpy ``XᵀX`` partial (a few μs of BLAS per batch), the partials
   posexplode to ``(index, value)`` rows and sum in a single hash
   aggregate whose cardinality is d² + d + 1 — never more, no matter
   how many rows. The eigendecomposition runs on the driver over the
   collected d×d matrix (d ≤ a few hundred for embeddings; the data
   never leaves the cluster, only the moments do). No sampling — the
   fit is exact over the full corpus, unlike ``cluster.kmeans_fit``
   whose objective needs iteration and therefore samples.
2. :func:`pca_transform` — projection is one broadcast (k, d) matrix
   GEMM per Arrow batch (``mapInPandas``), zero shuffle.

Float caveat (round-4 lesson): the moment sums re-associate across
partitions, so components are deterministic only to ~1e-9 relative
and eigenvector SIGN is fixed by convention (largest-|loading|
coordinate positive). Catalog rows are rows-only; the fit is
cross-validated against ``numpy.linalg.eigh`` on the same data in
``test_reduce.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class PCAModel:
    """Fitted PCA basis: ``mean`` (d,), ``components`` (k, d) rows =
    principal axes sorted by decreasing variance, and
    ``explained_variance`` (k,) eigenvalues with their ``ratio`` of
    the total variance."""

    mean: np.ndarray
    components: np.ndarray
    explained_variance: np.ndarray
    ratio: np.ndarray
    n: int


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """Fit a ``k``-component PCA over ``vec_col`` (array<float>), with
    the exact full-corpus covariance (see module docstring for the
    one-aggregation plan). NULL vectors are skipped; ragged dimensions
    raise (a corrupt corpus should fail loudly here, not produce a
    silently wrong basis). EAGER: runs the moment job now."""
    if k <= 0:
        raise ValueError("pca_fit: k must be positive")

    src = df.select(F.col(vec_col).alias("vec")).filter(
        F.col("vec").isNotNull()
    )

    def moments(batches):
        import pandas as pd

        for pdf in batches:
            vecs = [v for v in pdf["vec"] if v is not None]
            if not vecs:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
            if x.ndim != 2:
                raise ValueError(
                    "pca_fit: ragged vector dimensions within a batch"
                )
            d = x.shape[1]
            if d == 0:
                # a batch of zero-length vectors would emit an EMPTY
                # moment array, posexplode to zero rows, and silently
                # vanish from the aggregate — the ragged check below
                # would never see it. Fail loudly here instead.
                raise ValueError("pca_fit: zero-length vectors")
            gram = (x.T @ x).ravel()
            s = x.sum(axis=0)
            yield pd.DataFrame(
                {
                    "d": [d],
                    "n": [len(x)],
                    "m": [np.concatenate([gram, s]).tolist()],
                }
            )

    parts = src.mapInPandas(moments, "d int, n long, m array<double>")
    # one hash aggregate of cardinality d²+d (+ the scalar counters):
    # the only thing that ever shuffles is per-batch moment rows
    summed = (
        parts.select(
            "d", "n", F.posexplode("m").alias("i", "v")
        )
        .groupBy("i")
        .agg(
            F.sum("v").alias("v"),
            F.sum(F.when(F.col("i") == 0, F.col("n"))).alias("n"),
            F.max("d").alias("d"),
            F.min("d").alias("d_min"),
        )
        .collect()
    )
    if not summed:
        raise ValueError("pca_fit: no non-null vectors")
    d = summed[0]["d"]
    if any(r["d"] != d or r["d_min"] != d for r in summed):
        raise ValueError("pca_fit: ragged vector dimensions across batches")
    n = next(r["n"] for r in summed if r["i"] == 0)
    flat = np.zeros(d * d + d)
    for r in summed:
        flat[r["i"]] = r["v"]
    gram = flat[: d * d].reshape(d, d)
    s = flat[d * d :]
    if n < 2:
        raise ValueError("pca_fit: need at least 2 vectors")
    mean = s / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(k, d)]
    comps = evecs[:, order].T.copy()
    evals = np.maximum(evals[order], 0.0)
    # deterministic sign: the largest-|loading| coordinate is positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    total = max(float(np.trace(cov)), 1e-300)
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=evals,
        ratio=evals / total,
        n=int(n),
    )


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    vec_col: str,
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vec_col`` onto the fitted basis → ``out_col``
    (array<double>, length k). One broadcast GEMM per Arrow batch,
    zero shuffle; NULL vectors project to NULL."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (model.mean.copy(), model.components.copy())
    )
    cols = df.columns

    def project(batches):
        mean, comps = bc.value
        for pdf in batches:
            vals = pdf[vec_col]
            # one stacked (n, d) × (d, k) BLAS GEMM per Arrow batch —
            # a per-row Python matvec loop is ~10× slower on exactly
            # this operator's target workload
            mask = np.array([v is not None for v in vals], dtype=bool)
            out = [None] * len(vals)
            if mask.any():
                x = np.stack(
                    [np.asarray(v, dtype=np.float64)
                     for v, keep in zip(vals, mask) if keep]
                )
                proj = (x - mean) @ comps.T
                rows = iter(proj.tolist())
                for i, keep in enumerate(mask):
                    if keep:
                        out[i] = next(rows)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    fields = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}"
                       for c in cols)
    return df.mapInPandas(project, f"{fields}, `{out_col}` array<double>")
