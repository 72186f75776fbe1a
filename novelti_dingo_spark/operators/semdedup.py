"""SemDeDup-style semantic deduplication and the distributed k-means
trainer behind it (SURVEY.md §2.10 dedup family, PAPERS.md clustering
references; algorithm shape follows Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540).

Semantic near-dups are pairs whose EMBEDDINGS are close even when their
text differs — MinHash/SimHash (token-level) cannot see them. SemDeDup's
trick is to make the O(n²) cosine search tractable by k-means-clustering
the embedding space first and comparing only WITHIN clusters: candidate
pairs drop from n²/2 to Σ|cell|²/2, and each cluster's pairwise block is
an independent task. At 100 TB: k grows with the corpus (k ≈ n/avg_cell
keeps cells bounded), assignment is one broadcast-argmin scan, and the
within-cluster self-join shuffles each vector exactly once on its cell
id — there is no unblocked all-pairs join anywhere.

Reuses the deterministic Lloyd's trainer from operators/ivf.py (driver
sees only k×dim centroids per iteration; one shuffle per iteration), so
the quantizer here is the same model the IVF ANN index builds on — train
once, serve both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..barrier import barrier
from ..registry import register
from ..sources.io import load_table
from .ivf import (
    ITERATIONS,
    K,
    _assign,
    _recompute,
    _sq_dist,
    kmeans_fit,
    widen,
)

SEMDEDUP_TAU = 0.3  # the corpus is random unit vectors (max cos ≈ 0.51);
# 0.3 selects the same "interesting tail" regime embedding_neardup_cosine
# targets with its 0.4 cut


@register(
    "kmeans_convergence",
    None,  # iterative, engine-specific init order → rows-only; the
    # inertia sequence is pinned against a numpy Lloyd's replica and a
    # monotonicity invariant in tests/test_semdedup.py
    survey_rows="iterative,L3-scale",
)
def kmeans_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means exposed as a first-class trainer (SURVEY §8
    round-5 item 4: "beyond ivf_cell_sizes"): per-iteration inertia
    (within-cluster sum of squared distances) — the convergence telemetry
    a training job actually monitors. Lloyd's guarantees inertia is
    non-increasing iteration over iteration; the test pins that and a
    numpy replica of the whole trajectory.

    Plan shape per iteration: broadcast k centroids → argmin assignment
    (no shuffle) → one groupBy shuffle for the per-cluster means, plus a
    1-row inertia aggregate. Only k×dim centroid doubles ever reach the
    driver-side loop; rows never do, so the loop is unchanged at 100 TB."""
    # widen() measured a LOSS here (9.7 s → 11.9 s at sf0.1): the loop
    # is stage-count-bound, not core-bound, and the repartition adds a
    # stage — left narrow (round-14)
    e = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(e, iterations=0)  # init only
    rows = []
    for it in range(ITERATIONS):
        # Round-14 (guide §3.3/§5): `assigned` feeds BOTH the inertia
        # aggregate and the next centroids, and `centroids` feeds both
        # the assignment and the inertia join — un-barriered, iteration
        # i's inertia plan re-derived every earlier iteration's chain
        # (O(iters²) assignment evaluations across the final union).
        # Lazy barriers (localCheckpoint(eager=False)) share each
        # subtree once and keep the whole telemetry a single job.
        assigned = barrier(_assign(e, centroids), eager=False)
        # re-derive the distance the argmin used (assignment drops it):
        # join back to the centroid of the winning cell — k rows, broadcast
        inertia = (
            assigned.join(F.broadcast(centroids), "cid")
            .agg(
                F.sum(_sq_dist("embedding", "centroid")).alias("inertia"),
                F.count(F.lit(1)).alias("n_vectors"),
            )
            .select(
                F.lit(it).alias("iteration"),
                F.round(F.col("inertia"), 6).alias("inertia"),
                "n_vectors",
            )
        )
        rows.append(inertia)
        centroids = barrier(_recompute(assigned), eager=False)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def semantic_pairs(
    vectors: DataFrame, tau: float = SEMDEDUP_TAU, k: int = K
) -> DataFrame:
    """Within-cluster cosine pairs above tau: (cid, keep_id, drop_id,
    cos_sim) with keep_id < drop_id (min-id survivor election, same
    convention as the MinHash dedup family)."""
    centroids = kmeans_fit(vectors, k=k)
    emb = F.col("embedding").cast("array<double>")
    assigned = _assign(vectors, centroids).select(
        "cid",
        "vec_id",
        emb.alias("emb"),
        F.sqrt(
            F.aggregate(
                F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("nrm"),
    )
    a = assigned.select(
        "cid",
        F.col("vec_id").alias("keep_id"),
        F.col("emb").alias("_ea"),
        F.col("nrm").alias("_na"),
    )
    b = assigned.select(
        "cid",
        F.col("vec_id").alias("drop_id"),
        F.col("emb").alias("_eb"),
        F.col("nrm").alias("_nb"),
    )
    cos = F.aggregate(
        F.zip_with("_ea", "_eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    ) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, "cid")
        .filter(F.col("keep_id") < F.col("drop_id"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") > tau)
        .select("cid", "keep_id", "drop_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


@register(
    "semdedup_pairs",
    None,  # cluster membership is engine-specific (k-means) → rows-only;
    # tests pin: reported pairs ⊆ exact cos>tau pairs (numpy all-pairs),
    # equality on the same-cluster restriction, determinism, survivor rule
    survey_rows="L2-family,B-dedup,semdedup",
)
def semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-duplicate pairs à la SemDeDup: k-means the embedding
    space, then exact cosine only within clusters. The miss set (true
    pairs split across clusters) is the algorithm's documented recall
    trade — tests measure it explicitly rather than hiding it."""
    e = widen(load_table(spark, sf_dir, "embeddings"))
    return semantic_pairs(e)
