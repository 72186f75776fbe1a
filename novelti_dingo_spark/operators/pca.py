"""Distributed PCA over the embeddings corpus (SURVEY.md §2.10 L19 —
dimensionality reduction / whitening for training-data pipelines).

The standard scale decomposition for PCA when dim is small and n is huge
(here dim=64, n up to 10^9+ at 100 TB):

1. **Distributed moment pass** — every Arrow batch reduces to a
   (count, sum_x[64], sum_xxT[64x64]) partial via numpy GEMM inside
   `mapInPandas`; only these 4161-double partials leave the executors
   (one per batch, ~33 KB each — the same "only centroids reach the
   driver" contract as IVF k-means in ivf.py).
2. **Driver eigendecomposition** — covariance = (S_xx - n·μμᵀ)/(n-1) is
   64×64 regardless of corpus size; `numpy.linalg.eigh` is O(dim³) once.
   Sign convention: each eigenvector's largest-|coefficient| entry is
   made positive, so results are stable across runs/partitionings.
3. **Broadcast projection** — the 64×k component matrix rides to
   executors as a closure literal; projection is one numpy GEMM per
   Arrow batch (`pandas_udf`), embarrassingly parallel, no shuffle.

No oracle SQL: a 64×64 eigendecomposition is not expressible in DuckDB
SQL — the registered query is rows-only; the math is pinned by
tests/test_pca.py (orthonormal components, descending eigenvalues,
per-coordinate projected variance == eigenvalue, projection determinism).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table

DIM = 64


def _moment_partials(batches):
    for pdf in batches:
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        yield pd.DataFrame(
            {
                "n": [x.shape[0]],
                "sum_x": [x.sum(axis=0).tolist()],
                "sum_xxt": [(x.T @ x).ravel().tolist()],
            }
        )


def pca_fit(e: DataFrame, k: int = 8) -> tuple[np.ndarray, np.ndarray, int]:
    """Fit PCA on the `embedding` column. Returns (components[k, DIM],
    eigenvalues[k] descending, n_rows). Driver memory: O(#batches · DIM²)
    partials, independent of corpus row count."""
    partials = e.select("embedding").mapInPandas(
        _moment_partials,
        schema="n long, sum_x array<double>, sum_xxt array<double>",
    )
    rows = partials.collect()  # <= one small row per Arrow batch
    n = sum(r.n for r in rows)
    sum_x = np.sum([np.asarray(r.sum_x) for r in rows], axis=0)
    sum_xxt = np.sum(
        [np.asarray(r.sum_xxt).reshape(DIM, DIM) for r in rows], axis=0
    )
    mu = sum_x / n
    cov = (sum_xxt - n * np.outer(mu, mu)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # [k, DIM]
    # deterministic sign: largest-|coef| entry of each component positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, eigvals[order], n


def pca_project(e: DataFrame, comps: np.ndarray) -> DataFrame:
    """Project embeddings onto the fitted components: one numpy GEMM per
    Arrow batch, components broadcast in the UDF closure (k·DIM doubles)."""
    comps_t = comps.T.copy()  # [DIM, k]

    @F.pandas_udf("array<double>")
    def _proj(s: pd.Series) -> pd.Series:
        x = np.stack(s.to_numpy()).astype(np.float64)
        return pd.Series(list(x @ comps_t))

    return e.select("vec_id", "label", _proj("embedding").alias("pca"))


@register(
    "embedding_pca_project",
    None,  # eigendecomposition is not SQL-expressible → rows-only;
    # the linear algebra is property-tested in tests/test_pca.py
    survey_rows="L19,X1",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L19: corpus projected onto its top-8 principal components, plus
    each row's residual (reconstruction) error — the whitening/compaction
    step before clustering or ANN indexing in an embedding pipeline."""
    e = load_table(spark, sf_dir, "embeddings")
    comps, eigvals, _ = pca_fit(e, k=8)
    proj = pca_project(e, comps)
    # residual via norms: ||x||² - ||P x||² (components orthonormal),
    # computed JVM-side from the projection — no second Python pass
    sq = F.aggregate(
        F.transform(F.col("pca"), lambda c: c * c),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return proj.select(
        "vec_id",
        "label",
        F.round(sq, 6).alias("explained_sq"),
        # embeddings are unit-L2 (FIXTURES.md) → residual = 1 - ||Px||²
        F.round(F.lit(1.0) - sq, 6).alias("residual_sq"),
    )
