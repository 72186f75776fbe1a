"""Data-quality checks — the validation layer an ingestion tool runs
before publishing a dataset: key uniqueness, FK integrity, null rates,
domain membership. Each check is a DataFrame returning violations (empty
== pass), so checks compose with the rest of the engine, scale like any
other query, and can gate a pipeline via `.isEmpty()` / `.count()`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of (key..., n) for key tuples appearing more than once."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def fk_orphans(child: DataFrame, fk: str, parent: DataFrame, pk: str) -> DataFrame:
    """Child rows whose foreign key has no parent (anti join — never a
    row-by-row lookup)."""
    return child.join(parent, child[fk] == parent[pk], "left_anti")


def null_rate(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: per-column null fraction (single pass)."""
    n = F.count(F.lit(1))
    return df.agg(
        *[
            F.round(F.count(F.when(F.col(c).isNull(), 1)) / n, 6).alias(f"{c}_null_rate")
            for c in cols
        ]
    )


def domain_violations(df: DataFrame, col: str, allowed: list) -> DataFrame:
    """Rows whose `col` is outside the allowed value set."""
    return df.filter(~F.col(col).isin(*allowed) | F.col(col).isNull())


def range_violations(df: DataFrame, predicate: Column) -> DataFrame:
    """Rows violating an arbitrary row-level invariant (pass the EXPECTED
    condition; returns rows where it does not hold)."""
    return df.filter(~predicate | predicate.isNull())
