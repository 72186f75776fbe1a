"""Data-layout optimization: Z-order (Morton-curve) clustering for
multi-column file skipping (SURVEY.md §2 row S7).

Why: min/max row-group stats only prune scans when each file covers a
NARROW range of the filtered column. A linear sort gives that for the
leading column and nothing for the others; interleaving the bits of
several columns' rank-buckets gives every clustered column a narrow
per-file span simultaneously (each loses a few bits of locality instead
of one column losing everything). This is the layout trade Delta/Iceberg
expose as OPTIMIZE ZORDER BY; here it is an engine-level writer built
from plain expressions:

  bucket_i = clamp(floor((x_i - min_i) / (max_i - min_i) * 255))   (8 bits)
  morton   = interleave(bucket_0, bucket_1, ...)                   (16/24 bits)
  repartitionByRange(morton) → one tight Z-curve segment per file.

The min/max calibration is one tiny global agg (2 doubles per column —
at 100 TB use a sample or stats from the catalog); bucketing and bit
interleaving are codegen'd expressions; the range partition is the one
shuffle any clustering write needs. Skew caution: repartitionByRange
samples the morton key, so heavily duplicated keys still spread.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8  # per-column resolution: 256 rank buckets


def _bucket(col: str, lo: Column, hi: Column) -> Column:
    """Linear min/max rank bucket in [0, 2^BITS)."""
    span = F.when(hi != lo, hi - lo).otherwise(F.lit(1.0))
    raw = F.floor(
        (F.col(col).cast("double") - lo) / span * ((1 << BITS) - 1)
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << BITS) - 1), raw))


def morton_key(df: DataFrame, cols: list[str]) -> Column:
    """Bit-interleaved Z-value over the given columns' rank buckets.

    Spark's shiftleft needs literal shift amounts, so the interleave is
    unrolled in Python: bit b of column c lands at position
    b * n_cols + c. All codegen'd longs — no UDF."""
    stats = df.agg(
        *[
            f(F.col(c).cast("double")).alias(f"{nm}_{c}")
            for c in cols
            for nm, f in (("lo", F.min), ("hi", F.max))
        ]
    ).head()
    parts = []
    for ci, c in enumerate(cols):
        b = _bucket(
            c, F.lit(float(stats[f"lo_{c}"])), F.lit(float(stats[f"hi_{c}"]))
        )
        for bit in range(BITS):
            # isolate bit `bit`, move it to interleaved position
            parts.append(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + ci,
                )
            )
    return functools.reduce(operator.add, parts).alias("zkey")


def zorder_write(
    df: DataFrame, cols: list[str], path: str, n_files: int = 16
) -> None:
    """Write df as n_files parquet files clustered along the Z-curve of
    `cols`: every output file covers a contiguous morton-key range, so a
    predicate on ANY clustered column maps to a small fraction of files
    (verified quantitatively in tests/test_layout.py)."""
    (
        df.withColumn("zkey", morton_key(df, cols))
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
