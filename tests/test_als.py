"""Distributed ALS (operators/als.py): the alternating-ridge
trajectory must match a pure-numpy replica on identical ratings and
identical (hash-derived) item init, the regularized objective must
never increase, and recommendation serving must be deterministic and
exclude already-purchased items."""

from __future__ import annotations

import numpy as np

from novelti_dingo_spark.operators.als import (
    ITERATIONS,
    LAMBDA,
    RANK,
    als_top_recs,
    init_factors,
    ratings_table,
    train_als,
)


def _numpy_als(ratings, item_init, iterations, lam):
    """Reference ALS: dense per-key ridge solves in plain numpy."""
    users = sorted({u for u, _, _ in ratings})
    items = sorted({i for _, i, _ in ratings})
    ui = {u: k for k, u in enumerate(users)}
    ii = {i: k for k, i in enumerate(items)}
    by_user: dict[int, list] = {u: [] for u in users}
    by_item: dict[int, list] = {i: [] for i in items}
    for u, i, r in ratings:
        by_user[u].append((i, r))
        by_item[i].append((u, r))
    Y = np.array([item_init[i] for i in items])
    X = np.zeros((len(users), RANK))
    hist = []
    for _ in range(iterations):
        for u in users:
            Yu = np.array([Y[ii[i]] for i, _ in by_user[u]])
            r = np.array([r for _, r in by_user[u]])
            X[ui[u]] = np.linalg.solve(
                Yu.T @ Yu + lam * np.eye(RANK), Yu.T @ r
            )
        for i in items:
            Xi = np.array([X[ui[u]] for u, _ in by_item[i]])
            r = np.array([r for _, r in by_item[i]])
            Y[ii[i]] = np.linalg.solve(
                Xi.T @ Xi + lam * np.eye(RANK), Xi.T @ r
            )
        sse = sum(
            (r - X[ui[u]] @ Y[ii[i]]) ** 2 for u, i, r in ratings
        )
        obj = sse + lam * ((X * X).sum() + (Y * Y).sum())
        hist.append((np.sqrt(sse / len(ratings)), obj))
    return X, Y, ui, ii, hist


def test_als_matches_numpy_and_objective_decreases(spark, sf_small):
    r_df = ratings_table(spark, sf_small).cache()
    ratings = [(r.user, r.item, r.rating) for r in r_df.collect()]
    item_init = {
        row.id: list(row.factor)
        for row in init_factors(
            r_df.select("item").distinct(), "item"
        ).collect()
    }
    user_f, item_f, hist = train_als(r_df)
    _, Ynp, ui, ii, np_hist = _numpy_als(
        ratings, item_init, ITERATIONS, LAMBDA
    )
    r_df.unpersist()
    # trajectory parity: same solves, different partial-sum association
    for h, (rmse_np, obj_np) in zip(hist, np_hist):
        assert np.isclose(h["rmse"], rmse_np, atol=1e-6), (h, rmse_np)
        assert np.isclose(h["objective"], obj_np, rtol=1e-9), (h, obj_np)
    # alternating ridge solves never increase the regularized objective
    objs = [h["objective"] for h in hist]
    assert all(a >= b - 1e-6 for a, b in zip(objs, objs[1:])), objs
    # final item factors match the replica elementwise
    got = {row.id: np.array(row.factor) for row in item_f.collect()}
    for item, k in ii.items():
        assert np.allclose(got[item], Ynp[k], atol=1e-6), item
    # the factorization learned something: rmse dropped substantially
    assert hist[-1]["rmse"] < 0.9 * hist[0]["rmse"]


def test_top_recs_deterministic_and_exclude_purchased(spark, sf_small):
    recs = als_top_recs(spark, sf_small)
    rows = recs.collect()
    assert len(rows) == 15  # 5 users x top-3
    purchased = {
        (r.user, r.item)
        for r in ratings_table(spark, sf_small).collect()
    }
    assert all((r.user, r.item) not in purchased for r in rows)
    assert [tuple(r) for r in als_top_recs(spark, sf_small).collect()] == [
        tuple(r) for r in rows
    ]
