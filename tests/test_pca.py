"""Distributed PCA (ml/pca.py) vs numpy's direct eigendecomposition:
the fit's moments are accumulated across Arrow batches/partitions, so
equality with single-shot numpy PCA on the same data IS the
distribution-correctness proof. Plus the pinned sign convention,
variance-ratio floors, and fail-loud malformed-input guards."""

from __future__ import annotations

import random

import numpy as np
import pytest


def _vectors(n=300, d=16, seed=100):
    rng = np.random.RandomState(seed)
    # anisotropic data: a few dominant directions so top-k is meaningful
    scales = np.linspace(5.0, 0.1, d)
    return rng.randn(n, d) * scales


def _numpy_pca(mat, k):
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps[:k], evals


def test_fit_matches_numpy(spark):
    from ai_etl_framework_spark.ml.pca import pca_fit

    mat = _vectors()
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(mat)],
        "id long, v array<double>",
    ).repartition(7)  # force multi-partition moment accumulation
    model = pca_fit(df, "v", k=4)
    mean, comps, evals = _numpy_pca(mat, 4)
    assert model.n == len(mat)
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    np.testing.assert_allclose(model.components, comps, atol=1e-7)
    np.testing.assert_allclose(model.explained_variance, evals[:4], atol=1e-7)
    np.testing.assert_allclose(
        model.explained_variance_ratio,
        evals[:4] / evals.sum(),
        atol=1e-9,
    )
    # components are orthonormal
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(4), atol=1e-9
    )


def test_transform_matches_numpy_projection(spark):
    from ai_etl_framework_spark.ml.pca import pca_fit, pca_transform

    mat = _vectors(n=200, d=12, seed=101)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(mat)],
        "id long, v array<double>",
    ).repartition(5)
    model = pca_fit(df, "v", k=3)
    got = {
        r["id"]: np.asarray(r["pc"])
        for r in pca_transform(df, "v", model).collect()
    }
    mean, comps, _ = _numpy_pca(mat, 3)
    want = (mat - mean) @ comps.T
    for i in range(len(mat)):
        np.testing.assert_allclose(got[i], want[i], atol=1e-7)


def test_variance_ratio_ordering_and_reconstruction(spark):
    from ai_etl_framework_spark.ml.pca import pca_fit

    mat = _vectors(n=400, d=10, seed=102)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in mat], "v array<double>"
    )
    model = pca_fit(df, "v", k=10)
    r = model.explained_variance_ratio
    assert all(r[i] >= r[i + 1] - 1e-12 for i in range(len(r) - 1))
    assert r.sum() == pytest.approx(1.0, abs=1e-9)
    # anisotropic scales ⇒ the first component dominates
    assert r[0] > 0.25


def test_guards(spark):
    from ai_etl_framework_spark.ml.pca import pca_fit, pca_transform

    mat = _vectors(n=20, d=4, seed=103)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in mat], "v array<double>"
    )
    with pytest.raises(ValueError, match="k="):
        pca_fit(df, "v", k=5)
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(df, "v", k=0)

    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "v array<double>"
    )
    with pytest.raises(Exception, match="ragged"):
        pca_fit(ragged, "v", k=1)

    model = pca_fit(df, "v", k=2)
    wrong_dim = spark.createDataFrame(
        [([1.0, 2.0],)], "v array<double>"
    )
    with pytest.raises(Exception, match="model dim"):
        pca_transform(wrong_dim, "v", model).collect()


def test_null_vectors_filtered_in_transform(spark):
    from ai_etl_framework_spark.ml.pca import pca_fit, pca_transform

    mat = _vectors(n=30, d=4, seed=104)
    rows = [(i, row.tolist()) for i, row in enumerate(mat)] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    model = pca_fit(df, "v", k=2)
    out = pca_transform(df, "v", model).collect()
    assert len(out) == 30 and all(r["id"] != 99 for r in out)
