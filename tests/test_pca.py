"""Distributed-PCA property tests: the mapInPandas moment pass + driver
eigh must reproduce exact single-node PCA, with stable signs and correct
variance accounting (no SQL oracle exists for an eigendecomposition)."""

from __future__ import annotations

import numpy as np
import pytest

from novelti_dingo_spark.operators.pca import pca_fit, pca_project
from novelti_dingo_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings")


@pytest.fixture(scope="module")
def local_x(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_fit_matches_single_node_numpy(emb, local_x):
    comps, eigvals, n = pca_fit(emb, k=8)
    assert n == local_x.shape[0]
    cov = np.cov(local_x, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    np.testing.assert_allclose(eigvals, w[order], rtol=1e-9)
    # eigenvectors match up to sign; with the sign convention applied the
    # rows must agree exactly (tolerance for summation-order drift)
    ref = v[:, order].T
    for i in range(8):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    np.testing.assert_allclose(comps, ref, atol=1e-8)


def test_components_orthonormal_eigvals_descending(emb):
    comps, eigvals, _ = pca_fit(emb, k=8)
    np.testing.assert_allclose(comps @ comps.T, np.eye(8), atol=1e-10)
    assert all(eigvals[i] >= eigvals[i + 1] for i in range(7))
    assert eigvals[-1] > 0


def test_projected_variance_equals_eigenvalues(emb, local_x):
    comps, eigvals, _ = pca_fit(emb, k=8)
    proj = pca_project(emb, comps)
    rows = proj.select("vec_id", "pca").collect()
    rows.sort(key=lambda r: r.vec_id)
    p = np.array([r.pca for r in rows])
    np.testing.assert_allclose(p.var(axis=0, ddof=1), eigvals, rtol=1e-8)
    # and the distributed projection IS the numpy projection
    centered_free = local_x @ comps.T
    np.testing.assert_allclose(p, centered_free, atol=1e-9)


def test_registered_query_schema_and_variance_split(spark, sf_small):
    from novelti_dingo_spark.operators.pca import embedding_pca_project

    df = embedding_pca_project(spark, sf_small)
    assert df.schema.simpleString() == (
        "struct<vec_id:bigint,label:int,"
        "explained_sq:double,residual_sq:double>"
    )
    rows = df.collect()
    n_emb = load_table(spark, sf_small, "embeddings").count()
    assert len(rows) == n_emb
    for r in rows[:50]:
        # unit-norm input: explained + residual == 1, both in [0, 1]
        assert 0.0 <= r.explained_sq <= 1.0 + 1e-6
        assert abs(r.explained_sq + r.residual_sq - 1.0) < 1e-5
