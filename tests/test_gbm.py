"""Gradient-boosted stumps (operators/gbm.py): the Spark histogram-
boosting trajectory must match a pure-numpy reference on identical
bins — same splits, same leaf weights, same predictions — and the
boosted model must beat the majority baseline AND the single logistic
model on training loss (otherwise boosting bought nothing).
"""

from __future__ import annotations

import math

import numpy as np

from novelti_dingo_spark.operators.gbm import (
    L2,
    LEARNING_RATE,
    N_BINS,
    N_ROUNDS,
    _FEATS,
    bin_features,
    gbm_quality_train,
    quantile_bins,
    train_gbm,
)
from novelti_dingo_spark.operators.logreg import (
    label_and_features,
    logreg_quality_train,
)


def _numpy_gbm(B, y, prior, rounds):
    """Reference boosting on the binned matrix B (n x F ints)."""
    model = []
    n, nf = B.shape
    for _ in range(rounds):
        score = np.full(n, prior)
        for fi, b, wl, wr in model:
            score += LEARNING_RATE * np.where(B[:, fi] <= b, wl, wr)
        p = 1.0 / (1.0 + np.exp(-score))
        g, h = p - y, p * (1 - p)
        best = None
        for fi in range(nf):
            G = np.zeros(N_BINS)
            H = np.zeros(N_BINS)
            for b in range(N_BINS):
                m = B[:, fi] == b
                G[b], H[b] = g[m].sum(), h[m].sum()
            gt, ht = G.sum(), H.sum()
            base = gt * gt / (ht + L2)
            gl = hl = 0.0
            for b in range(N_BINS - 1):
                gl += G[b]
                hl += H[b]
                gr, hr = gt - gl, ht - hl
                gain = gl * gl / (hl + L2) + gr * gr / (hr + L2) - base
                if best is None or gain > best[4]:
                    best = (fi, b, -gl / (hl + L2), -gr / (hr + L2), gain)
        model.append(best[:4])
    return model


def test_boosting_trajectory_matches_numpy(spark, sf_small):
    feats = label_and_features(spark, sf_small)
    edges = quantile_bins(feats)
    binned = bin_features(feats, edges).cache()
    rows = binned.collect()
    B = np.array([[r[f"b_{c}"] for c in _FEATS] for r in rows])
    y = np.array([r["y"] for r in rows])
    pos = y.mean()
    prior = math.log(pos / (1 - pos))

    model_spark = train_gbm(binned, prior, rounds=6)
    binned.unpersist()
    model_np = _numpy_gbm(B, y, prior, rounds=6)

    for (f_s, b_s, wl_s, wr_s), (fi_n, b_n, wl_n, wr_n) in zip(
        model_spark, model_np
    ):
        assert _FEATS.index(f_s) == fi_n and b_s == b_n
        assert abs(wl_s - wl_n) < 1e-8 and abs(wr_s - wr_n) < 1e-8


def test_boosting_beats_logreg_on_training_loss(spark, sf_small):
    gbm_row = gbm_quality_train(spark, sf_small).head()
    lr_row = logreg_quality_train(spark, sf_small).head()
    assert gbm_row.n_rounds == N_ROUNDS
    assert gbm_row.accuracy >= gbm_row.baseline - 1e-9
    # boosted stumps fit the training set at least as well as the
    # single linear model (they strictly generalize it on binned data)
    assert gbm_row.log_loss <= lr_row.log_loss + 1e-6
