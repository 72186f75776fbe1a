"""Vector math over ArrayType columns — pure JVM-side higher-order
functions (zip_with / aggregate), no Python UDFs, so the hot path stays
inside whole-stage codegen and never crosses the Arrow boundary.

Elements are cast to double before any arithmetic: the stored float32
values would otherwise accumulate ~1e-6 error over 64 adds, which is
visible at the 6-decimal canonicalization used by the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    return F.transform(F.col(v) if isinstance(v, str) else v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product as an explicit emb_a[i]*emb_b[i] multiply-add chain.

    Round-14 (guide §1.2 step 2): higher-order functions (zip_with /
    aggregate) do not participate in whole-stage codegen — the fold is
    interpreted per element. For a FIXED dimensionality the unrolled
    chain compiles into straight-line codegen arithmetic (the
    knn_bruteforce_top10 shape, measured ~5 ms HOF → ~0 ms unrolled on
    the pinned corpus back in round 9; on pair joins the factor
    multiplies by the candidate count). IEEE-identical to `dot`: both
    accumulate left-to-right over the same per-element double products
    (0.0 + t0 == t0 for any product of finite nonzero inputs; verified
    by oracle hash at both SFs for every converted query)."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    score: Column | None = None
    for i in range(dim):
        term = ac.getItem(i).cast("double") * bc.getItem(i).cast("double")
        score = term if score is None else score + term
    return score


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity. For unit-norm inputs this equals `dot`; kept
    general for non-normalized corpora."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
