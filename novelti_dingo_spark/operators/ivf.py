"""IVF (inverted-file) approximate nearest neighbor (SURVEY.md §2.10 L3
scale path, PAPERS.md top-k families): k-means coarse quantizer + probe
of the closest cells only.

This is also the repo's iterative-algorithm pattern: Lloyd's iterations
are driver-orchestrated DataFrame jobs — per iteration one shuffle
(assignment groupBy); centroids (k × dim doubles) are the ONLY data that
ever reaches the driver, so the loop works unchanged when the corpus is
100 TB. Deterministic throughout: seeds from xxhash64(vec_id), ties break
on cluster id, so every run (and every engine) produces the same model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import dot
from ..registry import register
from ..sources.io import load_table

K = 8
ITERATIONS = 3
N_PROBE = 2  # query probes this many nearest cells


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids, take the
    argmin by (distance, cid) — one wide scan, no shuffle."""
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "label",
            "embedding",
            "cid",
            _sq_dist("embedding", "centroid").alias("dist"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "dist")
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """New centroid = element-wise mean per cluster (posexplode → agg →
    re-assemble ordered by position)."""
    exploded = assigned.select(
        "cid", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    means = exploded.groupBy("cid", "pos").agg(F.avg("v").alias("m"))
    return (
        means.groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )


def kmeans_fit(vectors: DataFrame, k: int = K, iterations: int = ITERATIONS) -> DataFrame:
    """Deterministic Lloyd's k-means. Init = the k vectors with the
    smallest xxhash64(vec_id) (a seeded pseudo-random sample that needs no
    driver-side randomness)."""
    init = (
        vectors.orderBy(F.xxhash64("vec_id"), F.col("vec_id"))
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(F.xxhash64("vec_id"), "vec_id")) - 1)
            .alias("cid"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )
    centroids = init
    for _ in range(iterations):
        centroids = _recompute(_assign(vectors, centroids))
    return centroids


@register(
    "ivf_cell_sizes",
    None,  # k-means init/iteration order is engine-specific → rows-only;
    # invariants asserted in tests/test_ivf.py.
    survey_rows="L3-scale,iterative",
)
def ivf_cell_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index stats: vectors per cell after k-means — the skew check an
    IVF index needs (a hot cell = a hot probe partition)."""
    e = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(e)
    assigned = _assign(e, centroids)
    return assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vectors"))


def ivf_knn(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF ANN core, nprobe-parameterized: top-k cosine neighbors of
    vector 0 scanning only the `n_probe` cells nearest to the query. The
    recall/cost dial: fraction of corpus read ≈ n_probe/K (n_probe = K is
    an exact scan routed through the index — recall 1.0 by construction).
    tools/measure_recall.py sweeps this dial; SCALE.md records the curve."""
    e = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(e)
    assigned = _assign(e, centroids)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select("cid", _sq_dist("centroid", "q_emb").alias("dist"))
        .orderBy("dist", "cid")
        .limit(n_probe)
        .select("cid")
    )
    return (
        assigned.join(F.broadcast(probe_cells), "cid")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cid",
            F.round(dot("embedding", "q_emb"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


@register(
    "ivf_knn_top10",
    None,  # approximate by construction → rows-only; containment in the
    # N_PROBE cells + score exactness asserted in tests/test_ivf.py.
    survey_rows="L3-scale,P",
)
def ivf_knn_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: top-10 cosine neighbors of vector 0, scanning only the
    N_PROBE cells nearest to the query — at scale this reads n_probe/K of
    the corpus instead of all of it. (Registered point on the ivf_knn
    nprobe dial; the recall-vs-nprobe curve is measured in SCALE.md.)"""
    return ivf_knn(spark, sf_dir, k=10, n_probe=N_PROBE)
