"""ANN index as a versioned lake dataset (operators/ivf.py index
persistence): train-once/publish, pinned-snapshot serving reproduces
the fresh computation exactly, incremental append without retrain, and
old-version immutability under republish.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.operators.ivf import (
    append_vectors_to_index,
    ivf_knn,
    ivf_knn_from_index,
    publish_ivf_index,
)
from novelti_dingo_spark.sources.io import load_table


def _qvec(spark, sf_small):
    e = load_table(spark, sf_small, "embeddings")
    return list(e.filter(F.col("vec_id") == 0).head().embedding)


def test_pinned_index_reproduces_fresh_knn(spark, sf_small, tmp_path):
    base = str(tmp_path / "ivf")
    v1 = publish_ivf_index(spark, sf_small, base)
    q = _qvec(spark, sf_small)
    served = [
        (r.vec_id, r.cos_sim)
        for r in ivf_knn_from_index(
            spark, base, q, version=v1, exclude_vec_id=0
        ).collect()
    ]
    fresh = [
        (r.vec_id, r.cos_sim) for r in ivf_knn(spark, sf_small).collect()
    ]
    assert served == fresh and len(fresh) == 10


def test_append_grows_index_and_old_version_is_immutable(
    spark, sf_small, tmp_path
):
    base = str(tmp_path / "ivf")
    v1 = publish_ivf_index(spark, sf_small, base)
    q = _qvec(spark, sf_small)
    before = [
        (r.vec_id, r.cos_sim)
        for r in ivf_knn_from_index(
            spark, base, q, version=v1, exclude_vec_id=0
        ).collect()
    ]

    # new vectors = exact copies of the query vector under fresh ids:
    # they MUST dominate the top-k of the new snapshot (cos_sim 1.0)
    e = load_table(spark, sf_small, "embeddings")
    clones = (
        e.filter(F.col("vec_id") == 0)
        .crossJoin(spark.range(3).select(F.col("id").alias("off")))
        .select(
            (F.lit(1_000_000) + F.col("off")).alias("vec_id"),
            "embedding",
            F.lit(99).alias("label"),
        )
    )
    v2 = append_vectors_to_index(spark, base, clones)
    assert v2 == v1 + 1

    after = ivf_knn_from_index(
        spark, base, q, version=v2, exclude_vec_id=0
    ).collect()
    top3 = {r.vec_id for r in after[:3]}
    assert top3 == {1_000_000, 1_000_001, 1_000_002}
    assert all(r.cos_sim == 1.0 for r in after[:3])

    # the pinned old snapshot is untouched by the republish
    again = [
        (r.vec_id, r.cos_sim)
        for r in ivf_knn_from_index(
            spark, base, q, version=v1, exclude_vec_id=0
        ).collect()
    ]
    assert again == before
