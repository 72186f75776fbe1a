"""SemDeDup + k-means trainer invariants: inertia trajectory pinned
against a numpy Lloyd's replica, semantic pairs pinned against exact
numpy all-pairs cosine (soundness = subset of true pairs; completeness =
exactly the true pairs that share a cluster; the cross-cluster miss set
is measured, not hidden)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from novelti_dingo_spark.operators.ivf import ITERATIONS, K, kmeans_fit
from novelti_dingo_spark.operators.semdedup import (
    SEMDEDUP_TAU,
    kmeans_convergence,
    semdedup_pairs,
)
from novelti_dingo_spark.sources import load_table


def _vectors(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, X


def _init_order(spark, sf_dir):
    """The trainer's init rule, evaluated through Spark so the numpy
    replica starts from the identical k seeds (xxhash64 has no numpy
    twin)."""
    e = load_table(spark, sf_dir, "embeddings")
    rows = (
        e.select("vec_id", F.xxhash64("vec_id").alias("h"))
        .orderBy("h", "vec_id")
        .limit(K)
        .collect()
    )
    return [r.vec_id for r in rows]


def _numpy_lloyd(ids, X, seed_ids, iterations):
    """Exact replica of ivf.kmeans_fit/_assign/_recompute semantics:
    argmin by (distance, cid), empty cells drop out, mean per cell."""
    id_to_row = {v: i for i, v in enumerate(ids)}
    cent = {c: X[id_to_row[v]].copy() for c, v in enumerate(seed_ids)}
    inertias = []

    def _assign_np(cent):
        cids = sorted(cent)
        C = np.stack([cent[c] for c in cids])
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.array([cids[j] for j in d.argmin(axis=1)])
        return assign, float(d.min(axis=1).sum())

    for _ in range(iterations):
        assign, wcss = _assign_np(cent)
        inertias.append(wcss)
        cent = {
            c: X[assign == c].mean(axis=0)
            for c in sorted(cent)
            if (assign == c).any()
        }
    # semantic_pairs assigns once more against the FINAL centroids
    assign, _ = _assign_np(cent)
    return inertias, assign


def test_kmeans_convergence_monotone_and_numpy_parity(spark, sf_med):
    out = {
        r.iteration: (r.inertia, r.n_vectors)
        for r in kmeans_convergence(spark, sf_med).collect()
    }
    assert sorted(out) == list(range(ITERATIONS))
    inertias = [out[i][0] for i in range(ITERATIONS)]
    assert all(
        a >= b - 1e-6 for a, b in zip(inertias, inertias[1:])
    ), f"Lloyd's inertia must be non-increasing: {inertias}"
    ids, X = _vectors(spark, sf_med)
    assert all(out[i][1] == len(ids) for i in range(ITERATIONS))
    ref, _ = _numpy_lloyd(ids, X, _init_order(spark, sf_med), ITERATIONS)
    for got, want in zip(inertias, ref):
        assert abs(got - want) <= 1e-4 * max(1.0, abs(want)), (inertias, ref)


def test_semdedup_pairs_sound_and_cluster_complete(spark, sf_med):
    ids, X = _vectors(spark, sf_med)
    norms = np.linalg.norm(X, axis=1)
    S = (X @ X.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(ids), k=1)
    true_pairs = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(*iu)
        if S[i, j] > SEMDEDUP_TAU
    }
    _, assign = _numpy_lloyd(ids, X, _init_order(spark, sf_med), ITERATIONS)
    cluster_of = {int(v): int(c) for v, c in zip(ids, assign)}
    same_cluster = {
        (a, b) for a, b in true_pairs if cluster_of[a] == cluster_of[b]
    }
    got_rows = semdedup_pairs(spark, sf_med).collect()
    got = {(r.keep_id, r.drop_id) for r in got_rows}
    # soundness: every reported pair is a true cos>tau pair with the
    # min-id survivor convention and an exact score
    assert got <= true_pairs, got - true_pairs
    for r in got_rows:
        assert r.keep_id < r.drop_id
        i, j = np.where(ids == r.keep_id)[0][0], np.where(ids == r.drop_id)[0][0]
        assert abs(r.cos_sim - round(float(S[i, j]), 6)) <= 1e-6
    # completeness within the clustering: exactly the true pairs that
    # landed in one cell — SemDeDup's documented recall trade is the rest
    assert got == same_cluster, (got ^ same_cluster)
    missed = len(true_pairs) - len(same_cluster)
    assert missed >= 0  # measured, not hidden: cross-cluster pairs


def test_semdedup_deterministic(spark, sf_med):
    a = sorted(map(tuple, semdedup_pairs(spark, sf_med).collect()))
    b = sorted(map(tuple, semdedup_pairs(spark, sf_med).collect()))
    assert a == b


def test_kmeans_fit_zero_iterations_is_init(spark, sf_med):
    e = load_table(spark, sf_med, "embeddings")
    init = kmeans_fit(e, iterations=0).collect()
    assert len(init) == K
    seeds = _init_order(spark, sf_med)
    ids, X = _vectors(spark, sf_med)
    id_to_row = {v: i for i, v in enumerate(ids)}
    for r in init:
        want = X[id_to_row[seeds[r.cid]]]
        assert np.allclose(np.array(r.centroid), want)
