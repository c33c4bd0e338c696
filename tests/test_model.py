"""Distributed logistic regression (operators/model.py):
cross-validated against an identical-hyperparameter numpy trainer and
checked for predictive sanity on separable data."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.model import logistic_fit, logistic_score


def numpy_fit(X, y, iters, lr, reg=0.0):
    """Definitional twin of logistic_fit: same standardization, same
    update rule, numpy reductions instead of Spark aggregates."""
    m, s = X.mean(axis=0), X.std(axis=0)
    s[s == 0] = 1.0
    Xs = (X - m) / s
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        err = p - y
        b -= lr * err.sum() / n
        w -= lr * (Xs.T @ err / n + reg * w)
    raw_w = w / s
    raw_b = b - float((w * m / s).sum())
    return raw_b, raw_w


@pytest.fixture(scope="module")
def synth(spark):
    """Deterministic near-separable 2-feature data: y = 1 iff
    x1 + 2*x2 > 3 (plus a deterministic 'noise' feature)."""
    rows = []
    for i in range(2000):
        x1 = (i * 37 % 100) / 25.0  # 0..4
        x2 = (i * 61 % 100) / 50.0  # 0..2
        x3 = (i * 13 % 7) - 3.0  # irrelevant
        y = 1 if x1 + 2 * x2 > 3 else 0
        rows.append((float(x1), float(x2), float(x3), y))
    return spark.createDataFrame(
        rows, "x1 double, x2 double, x3 double, y int"
    )


def test_matches_numpy_trainer(spark, synth):
    model = logistic_fit(synth, ["x1", "x2", "x3"], "y", iters=30, lr=1.0)
    pdf = synth.toPandas()
    X = pdf[["x1", "x2", "x3"]].to_numpy()
    y = pdf["y"].to_numpy().astype(float)
    nb, nw = numpy_fit(X, y, iters=30, lr=1.0)
    # Spark's gradient sums reduce in partition order, numpy's in row
    # order: trajectories agree to float-reduction noise only
    assert math.isclose(model["bias"], nb, rel_tol=1e-6, abs_tol=1e-6)
    for c, ref in zip(["x1", "x2", "x3"], nw):
        assert math.isclose(
            model["weights"][c], ref, rel_tol=1e-6, abs_tol=1e-6
        ), c


def test_learns_separable_boundary(spark, synth):
    model = logistic_fit(synth, ["x1", "x2", "x3"], "y", iters=80, lr=2.0)
    scored = logistic_score(synth, model)
    acc = (
        scored.select(
            ((F.col("score") > 0.5).cast("int") == F.col("y"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc > 0.97, acc
    # the informative features dominate the irrelevant one
    w = model["weights"]
    assert abs(w["x1"]) > 5 * abs(w["x3"])
    assert abs(w["x2"]) > 5 * abs(w["x3"])
    # direction: x2 should weigh ~2x x1 (the true boundary)
    assert 1.2 < w["x2"] / w["x1"] < 3.0


def test_score_is_pure_projection_no_shuffle(spark, synth):
    from esdb_spark.plans import shuffle_count

    model = {"bias": 0.1, "weights": {"x1": 1.0, "x2": -0.5, "x3": 0.0}}
    assert shuffle_count(logistic_score(synth, model)) == 0


def test_validation_errors(spark, synth):
    with pytest.raises(ValueError):
        logistic_fit(synth, [], "y")
    with pytest.raises(ValueError):
        logistic_fit(synth.filter(F.lit(False)), ["x1"], "y", iters=1)


def test_l2_regularization_shrinks_weights(spark, synth):
    free = logistic_fit(synth, ["x1", "x2"], "y", iters=30, lr=1.0)
    reg = logistic_fit(synth, ["x1", "x2"], "y", iters=30, lr=1.0, reg=0.5)
    assert abs(reg["weights"]["x1"]) < abs(free["weights"]["x1"])
    assert abs(reg["weights"]["x2"]) < abs(free["weights"]["x2"])


def test_null_rows_excluded_consistently(spark):
    """Rows with NULL features/labels must not dilute the gradient:
    fitting on data-with-nulls equals fitting on the clean subset."""
    rows = [(float(i % 5), 1 if i % 5 > 2 else 0) for i in range(200)]
    clean = spark.createDataFrame(rows, "x1 double, y int")
    noisy = clean.unionByName(
        spark.createDataFrame(
            [(None, 1), (2.0, None), (None, None)], "x1 double, y int"
        )
    )
    a = logistic_fit(clean, ["x1"], "y", iters=10)
    b = logistic_fit(noisy, ["x1"], "y", iters=10)
    assert b["n"] == a["n"] == 200
    assert math.isclose(a["weights"]["x1"], b["weights"]["x1"], rel_tol=1e-9)
    assert math.isclose(a["loss"], b["loss"], rel_tol=1e-9)
