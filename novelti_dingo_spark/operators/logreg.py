"""Distributed logistic-regression training on DataFrames (the
iterative-ML loop pattern, sibling of PCA's moment accumulation and
BPE's merge loop): full-batch gradient descent where EVERY iteration is
one partial-aggregated pass — the gradient is a fixed-width vector of
column averages, so per-iteration driver traffic is O(n_features)
doubles and the corpus never leaves the executors.

Scale shape at 100 TB:
- the feature projection is computed once and cached/localCheckpoint'd
  (scan-side expressions only: no UDF, no shuffle);
- each GD step = one map-side-combined aggregate over the cached
  features: the cluster-wide cost is a single reduce of n_features
  partial sums per iteration — the same shape as PCA's one-pass moments
  (pca.py) and Lloyd's one-agg-per-iter in pq.py;
- weights are plan-time literals (broadcast implicitly in the compiled
  expressions), so the sigmoid/gradient math stays in whole-stage
  codegen;
- for corpora where full-batch is too slow to converge, the same loop
  runs on a `sample_fraction` mini-batch per iteration (scan-side hash
  predicate, see curation.py) — the aggregation shape is unchanged.

tests/test_logreg.py pins the whole trajectory (40 iterations) against
a pure-numpy reference on identical features to 1e-6, and checks the
trained model beats the majority-class baseline on its training set.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table

N_FEATURES = 4  # bias, scaled chars, scaled tokens, mean token length
LR = 1.0
ITERATIONS = 40


def label_and_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """y = [doc is English]; x = (1, n_chars/500, n_tokens/100,
    mean_token_len/10) — cheap scan-side stats in rough unit scale so a
    single learning rate works. Columns y, x0..x3."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks)
    return d.select(
        "doc_id",
        (F.col("lang") == "en").cast("double").alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 500.0).alias("x1"),
        (n_toks / 100.0).cast("double").alias("x2"),
        (F.col("n_chars") / n_toks / 10.0).cast("double").alias("x3"),
    )


def train_logreg(
    feats: DataFrame,
    iterations: int = ITERATIONS,
    lr: float = LR,
) -> list[float]:
    """Full-batch GD: w <- w - lr * avg((sigmoid(w.x) - y) * x). One
    aggregate per iteration; the caller should cache `feats`."""
    w = [0.0] * N_FEATURES
    xs = [f"x{i}" for i in range(N_FEATURES)]
    for _ in range(iterations):
        z = sum(F.col(c) * float(w[i]) for i, c in enumerate(xs))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = feats.agg(
            *[
                F.avg((p - F.col("y")) * F.col(c)).alias(f"g{i}")
                for i, c in enumerate(xs)
            ]
        ).head()
        w = [w[i] - lr * row[f"g{i}"] for i in range(N_FEATURES)]
    return w


@register(
    "logreg_quality_train",
    None,  # iterative float training: rows-only at the gate; numpy
    # trajectory parity + accuracy floor pinned in tests/test_logreg.py
    survey_rows="L17,L19,A5,iterative",
)
def logreg_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the language-quality classifier and report the model card:
    learned weights, training log-loss, accuracy, and the majority-class
    baseline it must beat. Returns one row (all floats rounded 4dp —
    the metrics row a training-data pipeline logs per corpus version).

    See the module docstring for the one-aggregate-per-iteration scale
    argument; the gate records rows-only because 40 chained float
    reductions are not SQL-expressible (same category as PCA/BPE)."""
    feats = label_and_features(spark, sf_dir).cache()
    try:
        w = train_logreg(feats)
        xs = [f"x{i}" for i in range(N_FEATURES)]
        z = sum(F.col(c) * float(w[i]) for i, c in enumerate(xs))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        eps = 1e-12
        row = feats.agg(
            F.avg(
                -(
                    F.col("y") * F.log(p + eps)
                    + (1 - F.col("y")) * F.log(1 - p + eps)
                )
            ).alias("loss"),
            F.avg(
                ((p >= 0.5).cast("double") == F.col("y")).cast("double")
            ).alias("acc"),
            F.greatest(F.avg("y"), 1 - F.avg("y")).alias("baseline"),
            F.count(F.lit(1)).alias("n_docs"),
        ).head()
    finally:
        feats.unpersist()
    data = [
        tuple(round(x, 4) for x in w)
        + (
            round(row["loss"], 4),
            round(row["acc"], 4),
            round(row["baseline"], 4),
            row["n_docs"],
        )
    ]
    return spark.createDataFrame(
        data,
        "w0 double, w1 double, w2 double, w3 double, "
        "log_loss double, accuracy double, baseline double, n_docs long",
    )


def train_logreg_minibatch(
    feats: DataFrame,
    iterations: int = ITERATIONS,
    lr: float = LR,
    n_batches: int = 5,
) -> list[float]:
    """Mini-batch GD: iteration t descends on the deterministic
    round-robin batch `doc_id % n_batches == t % n_batches` — a
    scan-side predicate, so each step reads a fixed 1/n_batches slice
    with NO shuffle and no sampling state. At 100 TB this is the lever
    when full-batch passes are too slow per step: same one-aggregate
    shape, 1/n of the data per aggregate, n× more steps for the same
    data touched. Round-robin (rather than random) batches keep the
    trajectory exactly reproducible — pinned against numpy in
    tests/test_logreg.py, same guarantee as the full-batch loop."""
    w = [0.0] * N_FEATURES
    xs = [f"x{i}" for i in range(N_FEATURES)]
    for t in range(iterations):
        batch = feats.filter(
            F.col("doc_id") % n_batches == t % n_batches
        )
        z = sum(F.col(c) * float(w[i]) for i, c in enumerate(xs))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = batch.agg(
            *[
                F.avg((p - F.col("y")) * F.col(c)).alias(f"g{i}")
                for i, c in enumerate(xs)
            ]
        ).head()
        w = [w[i] - lr * row[f"g{i}"] for i in range(N_FEATURES)]
    return w
