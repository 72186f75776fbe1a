"""Bounded deterministic corpus samples WITHOUT a global sort.

`df.orderBy(xxhash64(key), key).limit(s)` — the obvious way to take a
seeded pseudo-random s-row sample — plans TakeOrderedAndProject: every
partition sorts and ships its own top-s rows, and the driver merges up
to P·s candidates through a SINGLE-THREADED ordered merge. Invisible at
test scale; at 100 TB partition counts (P ~ 1e5) that driver merge IS
the index-build wall (measured: the tail of the 1M composed IVF-PQ
build sat at load ~1.2 — one core merging 32 sorted 65536-row runs of
64-double arrays while 31 idled; SCALE_MEASURED.json
`ann_ivfpq_sampled_trainer`).

The fix is an order statistic, not a sort. xxhash64 values are uniform
over the int64 range, so the s lowest among n rows sit below
≈ I64_MIN + 2^64·(s/n); a FILTER at a slightly padded threshold passes
~margin·s rows — evaluated fully distributed inside the scan's
codegen, no per-partition sort, no ordered merge — and the exact
prefix is recovered from the tiny survivor set for free. The result is
BIT-IDENTICAL to the orderBy().limit() form (same rows, same order),
so the pinned trainer twins (kmeans_fit / pq_fit init = the sample
prefix) don't move.

Shortfall safety: the survivor count is Binomial(n, margin·s/n); with
margin 2, P(fewer than s survive) ≤ exp(−s·(margin−1)²/(2·margin)) =
e^(−s/4) — at s = 2048 that is e^−512. The escalation loop exists for
the principle, not the expectation.

Cost: one count() (no column is referenced, so parquet scans answer it
from row-group metadata) + one filtered pass, replacing the global
top-k pass. Both are passes over the input PLAN — a caller sampling an
expensive derivation (e.g. the residual plan in publish_ivfpq_index)
pays the derivation per pass, so sample the cheapest equivalent plan
the semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_I64_MIN = -(1 << 63)
_SPAN = 1 << 64
_MARGIN = 2.0


def _threshold(n: int, sample: int, margin: float) -> int | None:
    """Hash cutoff expected to pass margin·sample of n uniform rows;
    None when no filter is worth planning (everything would pass)."""
    if n <= 0:
        return None
    frac = margin * sample / n
    if frac >= 1.0:
        return None
    return _I64_MIN + int(_SPAN * frac)


def hash_sample_df(
    df: DataFrame, sample: int, key: str = "vec_id", n: int | None = None
) -> DataFrame:
    """The `sample` lowest-(xxhash64(key), key) rows as a DataFrame —
    bit-identical to `df.orderBy(xxhash64(key), key).limit(sample)`,
    planned as threshold-filter → top-k over the ~2·sample survivors
    (the TakeOrdered runs over the survivor set, not the corpus).
    Pass `n` (the exact row count) when the caller knows it from a
    cheaper plan — e.g. a base-table count answered from parquet
    metadata while `df` is a row-preserving derivation whose count
    would evaluate the derivation."""
    if n is None:
        n = df.count()
    margin = _MARGIN
    flt = df
    while True:
        thr = _threshold(n, sample, margin)
        if thr is None:
            flt = df
            break
        flt = df.filter(F.xxhash64(key) <= F.lit(thr))
        if flt.count() >= min(sample, n):
            break
        margin *= 4.0
    return flt.orderBy(F.xxhash64(key), key).limit(sample)


def collect_hash_sample(
    df: DataFrame, sample: int, key: str = "vec_id", n: int | None = None
) -> list:
    """The same prefix COLLECTED for driver-side trainers: one filtered
    collect of ~2·sample rows (sorted + truncated in Python — microseconds
    at trainer sample sizes) instead of a corpus-wide TakeOrdered merge.
    Rows carry the input columns plus the `_h` hash used for the order.
    `n` as in hash_sample_df."""
    if n is None:
        n = df.count()
    margin = _MARGIN
    with_h = df.withColumn("_h", F.xxhash64(key))
    while True:
        thr = _threshold(n, sample, margin)
        cand = with_h if thr is None else with_h.filter(F.col("_h") <= F.lit(thr))
        rows = cand.collect()
        if thr is None or len(rows) >= min(sample, n):
            break
        margin *= 4.0
    rows.sort(key=lambda r: (r["_h"], r[key]))
    return rows[:sample]
