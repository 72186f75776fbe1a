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


def test_partitioned_postings_probe_prunes_and_matches(
    spark, sf_small, tmp_path
):
    """partition_postings=True: the probe's scan must carry the probed
    cells as PARTITION filters (pruned bytes, not just pruned rows) and
    return exactly the flat index's rows."""
    base_flat = str(tmp_path / "flat")
    base_part = str(tmp_path / "part")
    publish_ivf_index(spark, sf_small, base_flat)
    publish_ivf_index(spark, sf_small, base_part, partition_postings=True)
    q = _qvec(spark, sf_small)
    flat = [
        (r.vec_id, r.cos_sim)
        for r in ivf_knn_from_index(
            spark, base_flat, q, exclude_vec_id=0
        ).collect()
    ]
    part_df = ivf_knn_from_index(spark, base_part, q, exclude_vec_id=0)
    part = [(r.vec_id, r.cos_sim) for r in part_df.collect()]
    assert part == flat and len(part) == 10
    plan = part_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan.split(
        "PartitionFilters", 1
    )[1][:200], "probe cells did not become partition filters"


def test_routing_cache_invalidates_on_republish(spark, sf_small, tmp_path):
    """The driver-side routing table is keyed per snapshot version: a
    republish (new training) must not serve stale centroids."""
    from novelti_dingo_spark.operators.ivf import _ROUTING_CACHE

    base = str(tmp_path / "ivf")
    publish_ivf_index(spark, sf_small, base)
    q = _qvec(spark, sf_small)
    ivf_knn_from_index(spark, base, q).collect()
    keys1 = {k for k in _ROUTING_CACHE if k[0] == base}
    e = load_table(spark, sf_small, "embeddings")
    append_vectors_to_index(
        spark, base,
        e.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            "label", "embedding",
        ).limit(5),
    )
    ivf_knn_from_index(spark, base, q).collect()
    keys2 = {k for k in _ROUTING_CACHE if k[0] == base}
    assert keys2 != keys1 and len(keys2 - keys1) == 1  # new snapshot key
