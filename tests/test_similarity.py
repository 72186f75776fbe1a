"""Similarity-search property tests: brute-force kNN vs an independent
numpy recomputation, ANN bucket-correctness, unit-norm invariant."""

from __future__ import annotations

import duckdb
import numpy as np

from novelti_dingo_spark.operators.similarity import (
    ann_lsh_topk,
    knn_bruteforce_top10,
    pandas_udf_vector_norm,
)


def _embeddings(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def test_knn_matches_numpy(spark, sf_med):
    ids, mat = _embeddings(sf_med)
    q = mat[ids == 0][0]
    sims = mat @ q
    order = sorted(
        [(s, i) for s, i in zip(sims, ids) if i != 0], key=lambda t: (-round(t[0], 6), t[1])
    )
    expected = [i for _, i in order[:10]]
    got = [r.vec_id for r in knn_bruteforce_top10(spark, sf_med).collect()]
    assert got == expected


def test_ann_pairs_share_bucket_and_scores_exact(spark, sf_med):
    """ANN output invariants: scores equal the true cosine (recomputed),
    neighbors are distinct, ≤3 per vector. (Recall vs brute force is
    data-dependent — random unit vectors don't cluster, so only
    correctness properties are asserted, not recall.)"""
    ids, mat = _embeddings(sf_med)
    lookup = {int(i): mat[k] for k, i in enumerate(ids)}
    rows = ann_lsh_topk(spark, sf_med).collect()
    assert rows
    per_vec: dict[int, int] = {}
    for r in rows:
        per_vec[r.vec_id] = per_vec.get(r.vec_id, 0) + 1
        true = float(lookup[r.vec_id] @ lookup[r.neighbor_id])
        assert abs(true - r.cos_sim) < 1e-5
        assert r.neighbor_id != r.vec_id
    assert max(per_vec.values()) <= 3


def test_vector_norms_are_unit(spark, sf_med):
    rows = pandas_udf_vector_norm(spark, sf_med).collect()
    assert all(abs(r.l2_norm - 1.0) < 1e-4 for r in rows)
