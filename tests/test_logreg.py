"""Distributed logistic regression (operators/logreg.py): the Spark
GD trajectory must match a pure-numpy reference on identical features
(one-aggregate-per-iteration ≡ full-batch GD), and the trained model
must beat the majority-class baseline on its training corpus.
"""

from __future__ import annotations

import numpy as np

from novelti_dingo_spark.operators.logreg import (
    ITERATIONS,
    LR,
    N_FEATURES,
    label_and_features,
    logreg_quality_train,
    train_logreg,
)


def _numpy_reference(X, y, iterations, lr):
    w = np.zeros(X.shape[1])
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / len(y)
    return w


def test_gd_trajectory_matches_numpy(spark, sf_small):
    feats = label_and_features(spark, sf_small).cache()
    rows = feats.collect()
    X = np.array([[r[f"x{i}"] for i in range(N_FEATURES)] for r in rows])
    y = np.array([r["y"] for r in rows])

    w_spark = np.array(train_logreg(feats, ITERATIONS, LR))
    w_np = _numpy_reference(X, y, ITERATIONS, LR)
    feats.unpersist()
    # same arithmetic, different partial-sum association order: the
    # trajectories may drift by float rounding only
    assert np.allclose(w_spark, w_np, atol=1e-6), (w_spark, w_np)
    # the loop actually learned something (weights moved off zero)
    assert np.abs(w_spark).max() > 0.01


def test_model_card_beats_baseline(spark, sf_small):
    row = logreg_quality_train(spark, sf_small).head()
    assert row.n_docs > 0
    assert 0.0 < row.log_loss < 0.6932  # below ln(2): better than w=0
    assert row.accuracy >= row.baseline - 1e-9


def test_minibatch_trajectory_matches_numpy(spark, sf_small):
    from novelti_dingo_spark.operators.logreg import train_logreg_minibatch

    feats = label_and_features(spark, sf_small).cache()
    rows = feats.collect()
    X = np.array([[r[f"x{i}"] for i in range(N_FEATURES)] for r in rows])
    y = np.array([r["y"] for r in rows])
    ids = np.array([r["doc_id"] for r in rows])

    B, iters, lr = 5, 20, LR
    w_spark = np.array(train_logreg_minibatch(feats, iters, lr, B))
    feats.unpersist()

    w = np.zeros(N_FEATURES)
    for t in range(iters):
        m = ids % B == t % B
        p = 1.0 / (1.0 + np.exp(-(X[m] @ w)))
        w = w - lr * (X[m].T @ (p - y[m])) / m.sum()
    assert np.allclose(w_spark, w, atol=1e-6), (w_spark, w)
    # mini-batch lands near the full-batch solution on this corpus
    w_full = np.array(train_logreg(feats, iters, lr))
    assert np.linalg.norm(w_spark - w_full) < 1.0
