"""Distributed logistic-regression fitting and scoring.

The quality-classifier step of a training-data pipeline (the
CCNet/fastText-filter shape: fit a small linear model on document
features, score the whole corpus, keep the high-probability slice).
The reference engine has no model layer (SURVEY.md §2.6); this
extends the §2.7 training-pipeline capability set alongside the
closed-form OLS fits in ``grouped.py``.

Scale design — iterative batch gradient descent where each iteration
is ONE declarative aggregation over the corpus:

- The projected feature matrix (features + label only, never document
  bodies) is persisted once (MEMORY_AND_DISK — spills, never OOMs)
  and every pass reads the cached columns.
- Per iteration the gradient is a handful of ``sum()`` aggregates of
  column expressions built from the current weights as literals —
  whole-stage-codegen'd, partially aggregated map-side, so the
  shuffle per pass carries one row per partition. The driver holds
  only the (features+1)-vector of weights.
- Features are standardized internally (one stats pass) so a single
  fixed learning rate works regardless of feature scale; returned
  weights are mapped back to the raw feature space, making
  :func:`logistic_score` a pure column expression usable without the
  training-time statistics.
- Gradient sums are floating-point reductions whose order depends on
  partitioning, so fitted weights are deterministic only to ~1e-7
  relative — queries exposing model output are rows-only in the
  oracle gate; the trainer is cross-validated against a numpy
  implementation in test_model.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def _sigmoid(z):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logistic_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 50,
    lr: float = 1.0,
    reg: float = 0.0,
) -> dict:
    """Fit P(label=1 | x) = sigmoid(b + w·x) by batch gradient
    descent; ``label_col`` must be 0/1 (cast to double). Returns
    ``{"bias": b, "weights": {col: w}, "loss": final mean log-loss,
    "n": rows}`` in RAW feature units.

    EAGER: runs ``iters + 1`` aggregation jobs over a persisted
    projection of (features, label) — one standardization pass plus
    one gradient pass per iteration. ``reg`` is an L2 penalty on the
    standardized weights (not the bias).
    """
    if not feature_cols:
        raise ValueError("logistic_fit: need at least one feature")
    y = F.col(label_col).cast("double")
    base = (
        df.select(
            *[F.col(c).cast("double").alias(c) for c in feature_cols],
            y.alias("_y"),
        )
        # rows with any NULL feature/label would silently drop out of
        # the gradient sums while still counting in n (biasing every
        # step and the reported loss) — exclude them up front so the
        # stats, gradient, and loss passes see the same row set
        .na.drop()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        stats = base.agg(
            F.count("*").alias("n"),
            *[F.avg(c).alias(f"m_{c}") for c in feature_cols],
            *[F.stddev_pop(c).alias(f"s_{c}") for c in feature_cols],
        ).collect()[0]
        n = stats["n"]
        if n == 0:
            raise ValueError("logistic_fit: empty input")
        mean = {c: float(stats[f"m_{c}"]) for c in feature_cols}
        # constant features (stddev 0 / None) divide by 1 instead
        std = {
            c: float(stats[f"s_{c}"]) if stats[f"s_{c}"] else 1.0
            for c in feature_cols
        }

        w = {c: 0.0 for c in feature_cols}
        b = 0.0
        loss = float("nan")
        for _ in range(iters):
            z = F.lit(b)
            for c in feature_cols:
                xs = (F.col(c) - F.lit(mean[c])) / F.lit(std[c])
                z = z + F.lit(w[c]) * xs
            p = _sigmoid(z)
            err = p - F.col("_y")
            row = base.agg(
                F.sum(err).alias("g_b"),
                *[
                    F.sum(
                        err * (F.col(c) - F.lit(mean[c])) / F.lit(std[c])
                    ).alias(f"g_{c}")
                    for c in feature_cols
                ],
                F.sum(
                    -F.col("_y") * F.log(F.greatest(p, F.lit(1e-12)))
                    - (F.lit(1.0) - F.col("_y"))
                    * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-12)))
                ).alias("ll"),
            ).collect()[0]
            b -= lr * float(row["g_b"]) / n
            for c in feature_cols:
                g = float(row[f"g_{c}"]) / n + reg * w[c]
                w[c] -= lr * g
            loss = float(row["ll"]) / n
    finally:
        base.unpersist()

    # map standardized weights back to raw feature units:
    # w·(x-m)/s + b  ==  sum(w/s · x) + (b - sum(w·m/s))
    raw_w = {c: w[c] / std[c] for c in feature_cols}
    raw_b = b - sum(w[c] * mean[c] / std[c] for c in feature_cols)
    return {"bias": raw_b, "weights": raw_w, "loss": loss, "n": n}


def logistic_score(
    df: DataFrame, model: dict, score_col: str = "score"
) -> DataFrame:
    """Add ``score_col`` = sigmoid(b + w·x) from a fitted model — a
    pure column expression (codegen'd, no UDF, no shuffle): the
    corpus-scoring pass streams through the scan."""
    z = F.lit(float(model["bias"]))
    for c, wc in model["weights"].items():
        z = z + F.lit(float(wc)) * F.col(c).cast("double")
    return df.withColumn(score_col, _sigmoid(z))
