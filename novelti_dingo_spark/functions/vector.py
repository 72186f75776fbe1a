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


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity. For unit-norm inputs this equals `dot`; kept
    general for non-normalized corpora."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
