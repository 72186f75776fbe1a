"""Round-14 optimization internals: the reshaped operators must equal
their pre-optimization formulations value-for-value.

- ivf._assign became a broadcast-array argmin projection; pin it
  against the old crossJoin + row_number window form, including the
  (dist, cid) tie-break on an exact-tie fixture.
- pq._recompute became one grouped agg of SUBDIM static means; pin it
  against the posexplode + two-groupBy form.
- sources.io.widen must preserve the row multiset, never shrink
  partitioning, and be identity under no_barriers() (the plan audits
  rely on that).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from novelti_dingo_spark.barrier import no_barriers
from novelti_dingo_spark.operators.ivf import _assign, _sq_dist
from novelti_dingo_spark.operators.pq import _recompute as pq_recompute
from novelti_dingo_spark.sources.io import widen


def _vectors(spark):
    # vec 3 is EXACTLY equidistant from centroids 0 and 1 → the
    # argmin must break the tie to the LOWER cid, like the old
    # orderBy("dist", "cid") row_number()==1 did.
    rows = [
        (1, [0.0, 0.0]),
        (2, [4.0, 4.0]),
        (3, [2.0, 0.0]),
        (4, [3.9, 4.2]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids(spark):
    return spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [4.0, 0.0]), (2, [4.0, 4.0])],
        "cid int, centroid array<double>",
    )


def _assign_window_reference(vectors, centroids):
    """The pre-round-14 formulation, verbatim."""
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "embedding",
            "cid",
            _sq_dist("embedding", "centroid").alias("dist"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "dist")
    )


def test_assign_projection_equals_window_form(spark):
    v, c = _vectors(spark), _centroids(spark)
    got = {
        (r.vec_id, r.cid) for r in _assign(v, c).collect()
    }
    want = {
        (r.vec_id, r.cid)
        for r in _assign_window_reference(v, c).collect()
    }
    assert got == want
    # the exact tie goes to the lower cid
    assert (3, 0) in got


def test_pq_recompute_equals_posexplode_form(spark):
    from novelti_dingo_spark.operators.pq import SUBDIM

    rows = [
        (1, 0, 0, [float(i) for i in range(SUBDIM)]),
        (2, 0, 0, [float(i * 2) for i in range(SUBDIM)]),
        (3, 0, 1, [1.0] * SUBDIM),
        (4, 1, 0, [0.5] * SUBDIM),
    ]
    assigned = spark.createDataFrame(
        rows, "vec_id long, m int, cid int, sub array<double>"
    )
    got = {
        (r.m, r.cid): list(r.centroid)
        for r in pq_recompute(assigned).collect()
    }
    exploded = assigned.select(
        "m", "cid", F.posexplode("sub").alias("pos", "v")
    )
    means = exploded.groupBy("m", "cid", "pos").agg(F.avg("v").alias("c"))
    ref = means.groupBy("m", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s.getField("c"),
        ).alias("centroid")
    )
    want = {(r.m, r.cid): list(r.centroid) for r in ref.collect()}
    assert got == want


def test_widen_preserves_rows_and_is_audit_transparent(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).coalesce(1)
    wide = widen(df)
    assert sorted(r.id for r in wide.collect()) == list(range(100))
    assert (
        wide.rdd.getNumPartitions()
        >= min(100, spark.sparkContext.defaultParallelism)
        or wide.rdd.getNumPartitions() >= df.rdd.getNumPartitions()
    )
    with no_barriers():
        assert widen(df) is df


def test_keyed_widen_grouped_map_single_exchange(spark):
    """keyed_widen must (a) preserve the row multiset, (b) keep every
    key's rows in one partition (grouped-map correctness), (c) satisfy
    the grouped-map's required distribution so Spark inserts NO second
    exchange, and (d) be identity under no_barriers()."""
    from novelti_dingo_spark.sources.io import keyed_widen

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 37).alias("k")
    ).coalesce(1)
    kw = keyed_widen(df, "k")
    assert sorted(r.id for r in kw.collect()) == list(range(1000))
    # each key entirely within one partition
    spread = (
        kw.withColumn("p", F.spark_partition_id())
        .groupBy("k")
        .agg(F.count_distinct("p").alias("np"))
        .agg(F.max("np"))
        .collect()[0][0]
    )
    assert spread == 1

    def ident(pdf):
        return pdf

    gm = kw.groupBy("k").applyInPandas(ident, "id long, k long")
    plan = gm._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "REPARTITION_BY_NUM" in plan, plan
    with no_barriers():
        assert keyed_widen(df, "k") is df


def test_ppjoin_bitmap_verify_equals_array_form(spark, sf_small, monkeypatch):
    """jaccard_pairs_prefix_filter's small-vocabulary bitmap verify
    (Σ popcount(ma&mb)) must produce row-identical output to the
    array_intersect fallback — forced by shrinking BITMAP_MAX_WORDS to
    0 so the same corpus takes the array branch."""
    from novelti_dingo_spark.operators import dedup

    bitmap_rows = sorted(
        map(tuple, dedup.jaccard_pairs_prefix_filter(spark, sf_small).collect())
    )
    monkeypatch.setattr(dedup, "BITMAP_MAX_WORDS", 0)
    array_rows = sorted(
        map(tuple, dedup.jaccard_pairs_prefix_filter(spark, sf_small).collect())
    )
    assert bitmap_rows == array_rows
    assert len(bitmap_rows) > 0
