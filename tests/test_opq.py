"""OPQ rotation: orthonormality, rotation-invariance of dot products,
determinism, and the headline property — on ANISOTROPIC data the learned
rotation reduces quantization MSE vs plain PQ at the same code budget."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.operators.opq import (
    DIM,
    opq_fit,
    opq_knn,
    quantization_mse,
    rotate,
)
from novelti_dingo_spark.operators.pq import pq_fit
from novelti_dingo_spark.sources import load_table


def test_rotation_is_orthonormal(spark, sf_small):
    e = load_table(spark, sf_small, "embeddings").limit(200)
    R, _cb = opq_fit(e.select("vec_id", "embedding"), opq_iterations=1)
    assert R.shape == (DIM, DIM)
    np.testing.assert_allclose(R @ R.T, np.eye(DIM), atol=1e-10)
    np.testing.assert_allclose(R.T @ R, np.eye(DIM), atol=1e-10)


def test_rotation_preserves_dot_products(spark, sf_small):
    """(Rq)·(Rx) == q·x — the invariance ADC scoring in rotated space
    relies on; checked in numpy against the rotated DataFrame output."""
    e = load_table(spark, sf_small, "embeddings").limit(50)
    R, _cb = opq_fit(e.select("vec_id", "embedding"), opq_iterations=1)
    orig = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in e.select("vec_id", "embedding").collect()
    }
    rot = {
        r.vec_id: np.asarray(r.embedding)
        for r in rotate(e.select("vec_id", "embedding"), R).collect()
    }
    ids = sorted(orig)[:10]
    for a in ids:
        for b in ids:
            assert abs(orig[a] @ orig[b] - rot[a] @ rot[b]) < 1e-9
            np.testing.assert_allclose(rot[a], R @ orig[a], atol=1e-12)


def test_opq_fit_deterministic(spark, sf_small):
    e = load_table(spark, sf_small, "embeddings").limit(200)
    R1, _ = opq_fit(e.select("vec_id", "embedding"), opq_iterations=1)
    R2, _ = opq_fit(e.select("vec_id", "embedding"), opq_iterations=1)
    assert np.array_equal(R1, R2)


def _anisotropic_corpus(spark, n=300, seed=7):
    """Low-rank + noise: variance concentrated in the first 8 dims by a
    ×20 scale — the regime PQ's contiguous-slice assumption fails in
    (one subspace hoards the signal) and OPQ's rotation fixes."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, DIM))
    x[:, :8] *= 20.0
    # rotate the concentration AWAY from subspace boundaries with a
    # fixed random orthogonal matrix so plain PQ can't get lucky
    q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
    x = x @ q.T
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(x)}
    )
    return spark.createDataFrame(pdf)


def test_opq_beats_pq_on_anisotropic_data(spark):
    e = _anisotropic_corpus(spark)
    plain_cb = pq_fit(e, iterations=2)
    plain_mse = quantization_mse(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")),
        plain_cb,
    )
    R, opq_cb = opq_fit(e, opq_iterations=2, pq_iterations=2)
    opq_mse = quantization_mse(rotate(e, R), opq_cb)
    # the rotation must recover a substantial part of the structure
    assert opq_mse < plain_mse * 0.9, (opq_mse, plain_mse)


def test_opq_knn_returns_topk(spark, sf_small):
    got = opq_knn(spark, sf_small, k=10).collect()
    assert len(got) == 10
    assert all(r.vec_id != 0 for r in got)
    sims = [r.pq_sim for r in got]
    assert sims == sorted(sims, reverse=True)
