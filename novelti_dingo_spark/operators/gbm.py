"""Gradient-boosted decision stumps on DataFrames — the histogram-based
GBM training loop (the LightGBM/XGBoost-approx shape) expressed as ONE
aggregation per boosting round:

1. bin every feature once into fixed quantile bins (a single
   percentile pass; bins are plan-time literals thereafter);
2. each round, compute the gradient/hessian HISTOGRAM — sum of
   (g, h) per (feature, bin) — via explode + one partial-aggregated
   groupBy: the shuffle payload is |features| x |bins| partial sums,
   never rows;
3. the driver scans the tiny histogram for the best split (classic
   gain = GL^2/(HL+l2) + GR^2/(HR+l2) - G^2/(H+l2)) and appends a
   stump; the model is a list of (feature, threshold-bin, wL, wR)
   triples whose prediction is a CASE expression — codegen'd, no UDF.

Scale at 100 TB: identical plan every round — one scan of the cached
binned features, one histogram shuffle of O(F x B) cells, O(bytes) to
the driver. This is exactly how distributed GBM implementations scale;
deeper trees repeat the histogram pass per tree level on the split
partitions. tests/test_gbm.py pins the full training trajectory
(splits, leaf weights, predictions) against a pure-numpy reference on
identical bins, and requires the boosted model to beat both the
majority class and the single logistic model on training loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .logreg import N_FEATURES, label_and_features

N_BINS = 10
N_ROUNDS = 12
LEARNING_RATE = 0.4
L2 = 1.0

# features x1..x3 are boosted over; x0 is the logreg bias column (skip)
_FEATS = [f"x{i}" for i in range(1, N_FEATURES)]


def quantile_bins(feats: DataFrame) -> dict[str, list[float]]:
    """One percentile pass -> interior decile edges per feature (the
    histogram grid; plan-time literals from here on)."""
    qs = [i / N_BINS for i in range(1, N_BINS)]
    row = feats.agg(
        *[
            F.expr(
                f"percentile({c}, array({', '.join(str(q) for q in qs)}))"
            ).alias(c)
            for c in _FEATS
        ]
    ).head()
    return {c: [float(v) for v in row[c]] for c in _FEATS}


def _bin_expr(col: str, edges: list[float]):
    """bin = number of edges strictly below the value (0..N_BINS-1),
    via codegen'd comparisons (no UDF)."""
    e = sum((F.col(col) > F.lit(t)).cast("int") for t in edges)
    return e.cast("int")


def bin_features(feats: DataFrame, edges: dict[str, list[float]]) -> DataFrame:
    out = feats.select(
        "y", *[_bin_expr(c, edges[c]).alias(f"b_{c}") for c in _FEATS]
    )
    return out


def _score_expr(model: list, prior: float):
    """Additive model as a single codegen'd expression over bin cols."""
    s = F.lit(prior)
    for feat, split_bin, w_l, w_r in model:
        s = s + F.lit(LEARNING_RATE) * F.when(
            F.col(f"b_{feat}") <= split_bin, F.lit(w_l)
        ).otherwise(F.lit(w_r))
    return s


def best_split(hist: dict) -> tuple:
    """Scan the (feature, bin) -> (G, H) histogram for the max-gain
    stump. Returns (feature, split_bin, wL, wR, gain). Pure driver-side
    arithmetic on F x B cells."""
    best = None
    for feat in _FEATS:
        cells = [hist.get((feat, b), (0.0, 0.0)) for b in range(N_BINS)]
        g_tot = sum(c[0] for c in cells)
        h_tot = sum(c[1] for c in cells)
        base = g_tot * g_tot / (h_tot + L2)
        gl = hl = 0.0
        for b in range(N_BINS - 1):
            gl += cells[b][0]
            hl += cells[b][1]
            gr, hr = g_tot - gl, h_tot - hl
            gain = gl * gl / (hl + L2) + gr * gr / (hr + L2) - base
            if best is None or gain > best[4]:
                best = (
                    feat,
                    b,
                    -gl / (hl + L2),
                    -gr / (hr + L2),
                    gain,
                )
    return best


def train_gbm(
    binned: DataFrame,
    prior: float,
    rounds: int = N_ROUNDS,
) -> list:
    """The boosting loop: per round ONE histogram aggregation, then a
    driver-side split search. `binned` should be cached."""
    model: list = []
    for _ in range(rounds):
        score = _score_expr(model, prior)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
        g = p - F.col("y")
        h = p * (1 - p)
        cells = F.array(
            *[
                F.struct(
                    F.lit(c).alias("feat"),
                    F.col(f"b_{c}").alias("bin"),
                    g.alias("g"),
                    h.alias("h"),
                )
                for c in _FEATS
            ]
        )
        hist_rows = (
            binned.select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.feat").alias("feat"), F.col("c.bin").alias("bin"))
            .agg(F.sum("c.g").alias("G"), F.sum("c.h").alias("H"))
            .collect()
        )
        hist = {(r.feat, r.bin): (r.G, r.H) for r in hist_rows}
        feat, b, w_l, w_r, gain = best_split(hist)
        model.append((feat, b, w_l, w_r))
    return model


@register(
    "gbm_quality_train",
    None,  # iterative boosting: rows-only at the gate; trajectory +
    # accuracy floors pinned in tests/test_gbm.py
    survey_rows="L17,iterative,A1,X-none",
)
def gbm_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the boosted-stump language classifier and emit its model
    card: rounds, training log-loss, accuracy, and the baselines it
    must beat (majority class; the logistic model's loss is reported by
    logreg_quality_train for side-by-side reading). One row, floats
    rounded 4dp."""
    import math

    feats = label_and_features(spark, sf_dir)
    edges = quantile_bins(feats)
    binned = bin_features(feats, edges).cache()
    try:
        pos = binned.agg(F.avg("y")).head()[0]
        prior = math.log(pos / (1 - pos))
        model = train_gbm(binned, prior)
        score = _score_expr(model, prior)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
        eps = 1e-12
        row = binned.agg(
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
        binned.unpersist()
    return spark.createDataFrame(
        [
            (
                len(model),
                round(row["loss"], 4),
                round(row["acc"], 4),
                round(row["baseline"], 4),
                row["n_docs"],
            )
        ],
        "n_rounds long, log_loss double, accuracy double, "
        "baseline double, n_docs long",
    )
