"""OPQ — Optimized Product Quantization (Ge et al., "Optimized Product
Quantization for Approximate Nearest Neighbor Search", CVPR'13; the
pre-rotation FAISS applies as `OPQxx` before an IVFPQ index).

Plain PQ quantizes each CONTIGUOUS 8-dim slice of the embedding with an
independent codebook; if the corpus' variance is concentrated in a few
correlated dimensions, some subspaces carry almost no signal and their
codebooks are wasted. OPQ learns an orthogonal rotation R so that
R·x distributes variance evenly across subspaces, then PQ-encodes the
rotated vectors. Dot products are rotation-invariant ((Rq)·(Rx) = q·x),
so ADC scoring works unchanged in rotated space.

Alternating minimization of Σ‖R·x − x̂‖² (x̂ = PQ reconstruction):
  1. fix R → fit PQ codebooks on rotated vectors (the existing
     distributed pq_fit — one Lloyd's loop trains all M codebooks);
  2. fix codebooks → the optimal orthogonal R is the Procrustes
     solution: R = V·Uᵀ where U·S·Vᵀ = svd(Σ x·x̂ᵀ).

Scale decomposition (same contract as PCA/IVF: only O(dim²) ever
reaches the driver):
  - rotation is a broadcast 64×64 GEMM per Arrow batch (pandas_udf);
  - the Procrustes cross-moment Σ x·x̂ᵀ reduces per batch to one
    64×64 partial inside mapInPandas (33 KB), summed on the driver in
    a canonicalized order (partials sorted by bytes → bit-reproducible
    across partitionings);
  - SVD of a 64×64 matrix is O(dim³) once per OPQ iteration.

No oracle SQL (iterative trained model) — registered rows-only; the
linear algebra is pinned by tests/test_opq.py (orthonormality,
rotation-invariant scores, MSE ≤ plain PQ on anisotropic data,
determinism).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..barrier import barrier
from ..registry import register
from ..sources.io import load_table
from .pq import _assign, pq_fit, subvectors

DIM = 64
OPQ_ITERATIONS = 2
M = 8
SUBDIM = 8


def rotate(e: DataFrame, R: np.ndarray, keep: tuple = ()) -> DataFrame:
    """(vec_id, embedding ← R·x, *keep): one broadcast GEMM per Arrow
    batch. `keep` passes extra columns through untouched (the publish
    path keeps `label` so the downstream assign contract holds)."""
    if np.array_equal(R, np.eye(len(R))):
        # Round-14 (guide §1.2 "don't compute things you throw away" /
        # §4.1): opq_fit's first alternation rotates by the identity —
        # x @ I is exactly x in IEEE (x_i·1 + Σ 0), so the corpus-wide
        # pandas-UDF GEMM pass is a no-op crossing the Python boundary
        # for nothing. Emit the cast projection instead; bit-identical.
        return e.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            *keep,
        )
    Rt = R.T.copy()  # x @ Rᵀ == (R·x)ᵀ rows

    @F.pandas_udf("array<double>")
    def _rot(s: pd.Series) -> pd.Series:
        x = np.stack(s.to_numpy()).astype(np.float64)
        return pd.Series(list(x @ Rt))

    return e.select("vec_id", _rot("embedding").alias("embedding"), *keep)


def _reconstruct(rotated: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(vec_id, xhat[64]): decode each vector's PQ codes back to the
    concatenation of its codebook centroids (in rotated space)."""
    codes = _assign(subvectors(rotated), codebooks).select("vec_id", "m", "cid")
    return (
        codes.join(F.broadcast(codebooks), ["m", "cid"])
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "centroid"))),
                    lambda s: s.getField("centroid"),
                )
            ).alias("xhat")
        )
    )


def _cross_moment(e: DataFrame, xhat: DataFrame) -> np.ndarray:
    """C = Σ_i x_i · x̂_iᵀ (64×64), reduced distributively: one numpy
    partial per Arrow batch, canonical-order summation on the driver."""
    joined = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    ).join(xhat, "vec_id")

    def partials(batches):
        for pdf in batches:
            x = np.stack(pdf["x"].to_numpy()).astype(np.float64)
            xh = np.stack(pdf["xhat"].to_numpy()).astype(np.float64)
            yield pd.DataFrame({"c": [(x.T @ xh).ravel().tolist()]})

    rows = joined.select("x", "xhat").mapInPandas(
        partials, schema="c array<double>"
    ).collect()
    # canonical summation order → deterministic across partitionings
    mats = sorted(list(r.c) for r in rows)
    total = np.zeros(DIM * DIM)
    for m in mats:
        total += np.asarray(m)
    return total.reshape(DIM, DIM)


def opq_fit(
    e: DataFrame,
    opq_iterations: int = OPQ_ITERATIONS,
    pq_iterations: int = 2,
    return_rotated: bool = False,
) -> tuple:
    """Alternate (codebooks | R) minimization. Returns (R[64,64],
    codebooks DataFrame in rotated space) — with `return_rotated`,
    additionally the final rotated corpus, barriered, so the caller's
    encode pass reuses the rotation already paid here instead of
    running a fourth corpus-wide GEMM (round-14, guide §1.2 step 1).
    R starts at identity, so iteration 0's codebooks equal plain PQ —
    every subsequent step can only reduce the quantization objective
    it alternates on."""
    R = np.eye(DIM)
    codebooks = None
    rot = None
    for _ in range(opq_iterations):
        # barrier: `rot` feeds pq_fit AND _reconstruct — un-barriered,
        # each reference re-ran the rotation GEMM over the corpus
        rot = barrier(rotate(e, R), eager=False)
        codebooks = pq_fit(rot, iterations=pq_iterations)
        xhat = _reconstruct(rot, codebooks)
        C = _cross_moment(e, xhat)
        U, _s, Vt = np.linalg.svd(C)
        R = Vt.T @ U.T  # Procrustes: maximizes tr(R·C)
    # refit codebooks for the final R (the pair the encoder will use)
    rot = barrier(rotate(e, R), eager=False)
    codebooks = pq_fit(rot, iterations=pq_iterations)
    if return_rotated:
        return R, codebooks, rot
    return R, codebooks


def quantization_mse(rotated: DataFrame, codebooks: DataFrame) -> float:
    """Mean ‖x_rot − x̂‖² over the corpus — the objective OPQ minimizes
    (comparable to plain PQ's MSE because R is orthogonal)."""
    xhat = _reconstruct(rotated, codebooks)
    err = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            "xhat",
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    row = (
        rotated.join(xhat, "vec_id")
        .agg(F.avg(err).alias("mse"))
        .collect()[0]
    )
    return float(row.mse)


def opq_knn(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """OPQ-ADC top-k for query vector 0: rotate the corpus, PQ-encode in
    rotated space, score with the rotated query's LUT. Identical scan
    shape to pq_knn_top10 — codes + one 128-row broadcast LUT; the only
    addition is the 64×64 rotation applied to corpus (once, at index
    build) and query (once, at plan time)."""
    e = load_table(spark, sf_dir, "embeddings")
    # return_rotated: the final rotated corpus comes back barriered
    # from the fit — the encode below reuses it instead of paying a
    # fourth corpus-wide rotation GEMM (round-14)
    R, codebooks, rot = opq_fit(
        e.select("vec_id", "embedding"), return_rotated=True
    )
    codes = _assign(subvectors(rot), codebooks).select("vec_id", "m", "cid")
    q = subvectors(rot.filter(F.col("vec_id") == 0)).select(
        "m", F.col("sub").alias("q_sub")
    )
    lut = codebooks.join(F.broadcast(q), "m").select(
        "m",
        "cid",
        F.aggregate(
            F.zip_with("centroid", "q_sub", lambda c, qq: c * qq),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("partial"),
    )
    return (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(lut), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("partial"), 6).alias("pq_sim"))
        .orderBy(F.desc("pq_sim"), F.asc("vec_id"))
        .limit(k)
    )


@register(
    "opq_pq_knn_top10",
    None,  # trained rotation + codebooks → rows-only; orthonormality,
    # rotation-invariance, MSE and determinism in tests/test_opq.py.
    survey_rows="L22,L3-scale,P,iterative",
)
def opq_pq_knn_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-rotated PQ ANN (see opq_knn). On anisotropic corpora the
    rotation balances per-subspace variance and recall rises at the
    same 8-byte code budget; on the isotropic uniform testdata it ties
    plain PQ (measured in SCALE.md's recall table) — the honest
    statement of when OPQ pays."""
    return opq_knn(spark, sf_dir, k=10)
