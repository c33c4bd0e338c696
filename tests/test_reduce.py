"""Exact-covariance PCA (operators/reduce.py) vs numpy on the same
data — the rows-only family's cross-validation, per the repo pattern
(COVERAGE.md: every rows-only operator has an exact or numpy twin)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.reduce import PCAModel, pca_fit, pca_transform


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return mean, comps, np.maximum(evals[order], 0.0)


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(7)
    # anisotropic: variance concentrated on two known axes
    base = rng.normal(size=(400, 2)) @ np.array(
        [[5.0, 0, 0, 0, 0, 0], [0, 2.0, 0, 0, 0, 0]]
    )
    x = base + rng.normal(scale=0.1, size=(400, 6)) + np.arange(6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, vec array<float>",
    ).repartition(8)
    # float32 storage is the engine contract — the numpy twin must see
    # the same rounded values
    return df, np.array(x, dtype=np.float32).astype(np.float64)


def test_pca_fit_matches_numpy(spark, data):
    df, x = data
    m = pca_fit(df, "vec", k=3)
    mean, comps, evals = _numpy_pca(x, 3)
    assert m.n == 400
    np.testing.assert_allclose(m.mean, mean, rtol=0, atol=1e-9)
    np.testing.assert_allclose(m.explained_variance, evals, rtol=1e-9)
    np.testing.assert_allclose(m.components, comps, rtol=0, atol=1e-7)
    # the two planted axes dominate
    assert m.ratio[0] > m.ratio[1] > 10 * m.ratio[2]


def test_pca_transform_projects_and_keeps_nulls(spark, data):
    df, x = data
    m = pca_fit(df, "vec", k=2)
    withnull = df.unionByName(
        spark.createDataFrame([(999, None)], "id long, vec array<float>")
    )
    out = {r["id"]: r["pca"] for r in
           pca_transform(withnull, m, "vec").collect()}
    assert out[999] is None
    expected = (x[0] - m.mean) @ m.components.T
    np.testing.assert_allclose(out[0], expected, rtol=0, atol=1e-9)
    assert len(out[1]) == 2


def test_pca_fit_validations(spark):
    df = spark.createDataFrame([([1.0, 2.0],)], "vec array<float>")
    with pytest.raises(ValueError):
        pca_fit(df, "vec", k=0)
    with pytest.raises(ValueError):
        pca_fit(df.filter(F.lit(False)), "vec", k=1)  # empty
    with pytest.raises(ValueError):
        pca_fit(df, "vec", k=1)  # single row: no covariance
    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "vec array<float>"
    )
    with pytest.raises(Exception):
        pca_fit(ragged, "vec", k=1)


def test_pca_reconstruction_improves_with_k(spark, data):
    df, x = data
    errs = []
    for k in (1, 2, 4):
        m = pca_fit(df, "vec", k=k)
        proj = (x - m.mean) @ m.components.T
        recon = proj @ m.components + m.mean
        errs.append(float(((x - recon) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]


def test_pca_fit_zero_length_vectors_raise(spark):
    # empty arrays in their OWN partition must still raise — a batch
    # of d=0 vectors emits no moment rows, so only an in-batch check
    # catches it (review finding: behavior must not depend on
    # partitioning)
    mixed = spark.createDataFrame(
        [(1, []), (2, []), (3, [1.0, 2.0]), (4, [2.0, 1.0])],
        "id int, vec array<float>",
    ).repartition(2, "id")
    with pytest.raises(Exception):
        pca_fit(mixed, "vec", k=1)
