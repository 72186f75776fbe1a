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


def test_embedding_neardup_lsh_corpus_matches_exact(spark, sf_med):
    """On the real corpus (random unit vectors, max cos ~0.51) the composed
    LSH->exact pipeline at the near-dup threshold returns exactly what the
    exact path returns: nothing. Verified against an independent numpy
    all-pairs check, and the plan must contain no unblocked self-join."""
    import numpy as np

    from novelti_dingo_spark.operators.similarity import (
        embedding_neardup_lsh_pairs,
    )
    from novelti_dingo_spark.sources import load_table

    e = load_table(spark, sf_med, "embeddings")
    pipe = embedding_neardup_lsh_pairs(e, threshold=0.9)
    plan = pipe._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert pipe.collect() == []
    mat = np.array(
        [r.embedding for r in e.select("embedding").collect()], dtype=np.float64
    )
    sims = mat @ mat.T
    np.fill_diagonal(sims, 0.0)
    assert sims.max() < 0.9  # exact path at 0.9 is empty too


def test_embedding_neardup_lsh_planted_recall_and_collapse(spark):
    """Planted near-dup corpus: 200 random unit vectors + 60 perturbed
    copies (cos ~0.97). The composed pipeline must (a) return exactly the
    exact-all-pairs answer, and (b) generate candidates for only a small
    fraction of all pairs — the collapse that makes it the 100 TB path."""
    import numpy as np

    from novelti_dingo_spark.operators.similarity import (
        embedding_lsh_buckets,
        embedding_neardup_lsh_pairs,
    )

    rng = np.random.RandomState(3)
    base = rng.standard_normal((200, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base[:60] + 0.03 * rng.standard_normal((60, 64))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    allv = np.vstack([base, dup])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(allv)],
        "vec_id long, embedding array<double>",
    )

    sims = allv @ allv.T
    iu = np.triu_indices(len(allv), 1)
    want = {
        (int(a), int(b)): sims[a, b]
        for a, b in zip(*[x[sims[iu] >= 0.9] for x in iu], strict=True)
    }
    assert len(want) >= 55, "planting should create ~60 true pairs"

    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in embedding_neardup_lsh_pairs(df, threshold=0.9).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-5, k

    buckets = embedding_lsh_buckets(df)
    a = buckets.toDF("vec_a", "table_idx", "bucket")
    b = buckets.toDF("vec_b", "table_idx", "bucket")
    n_cand = (
        a.join(b, ["table_idx", "bucket"])
        .filter(a.vec_a < b.vec_b)
        .select("vec_a", "vec_b")
        .distinct()
        .count()
    )
    all_pairs = len(allv) * (len(allv) - 1) // 2
    assert n_cand <= 0.15 * all_pairs, (n_cand, all_pairs)


def test_qvec_cache_invalidates_on_in_place_rewrite(spark, sf_small, tmp_path):
    """Round-6 verdict hygiene #1: the query-vector cache is keyed by
    file identity, not path alone — rewriting the corpus parquet in
    place must serve the FRESH vector, not a stale cached one."""
    import os
    import shutil
    import time

    import duckdb as _ddb

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    shutil.copy(f"{sf_small}/embeddings.parquet", corpus / "embeddings.parquet")

    r1 = knn_bruteforce_top10(spark, str(corpus)).collect()
    assert len(r1) == 10

    # rewrite IN PLACE: negate the query vector (vec_id 0) so the true
    # top-10 flips to the former bottom of the similarity order
    _ddb.sql(
        f"""
        COPY (
          SELECT vec_id, label,
                 CASE WHEN vec_id = 0
                      THEN list_transform(embedding, x -> -x)
                      ELSE embedding END AS embedding
          FROM '{corpus}/embeddings.parquet'
        ) TO '{corpus}/embeddings.parquet.new' (FORMAT PARQUET)
        """
    )
    os.replace(corpus / "embeddings.parquet.new", corpus / "embeddings.parquet")
    # mtime_ns granularity is plenty, but make the change unambiguous
    t = time.time() + 2
    os.utime(corpus / "embeddings.parquet", (t, t))

    r2 = knn_bruteforce_top10(spark, str(corpus)).collect()
    assert len(r2) == 10
    # negating q negates every cosine: the fresh top-10 is the former
    # BOTTOM of the similarity order — disjoint from the stale top-10
    assert not set(r.vec_id for r in r1) & set(r.vec_id for r in r2)
