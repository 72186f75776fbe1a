"""Skew mitigation utilities (SURVEY.md §4 / brief: "salting for skew").

AQE's skew-join splitting handles most cases automatically (enabled in
session.py); explicit salting remains necessary when (a) the skewed side
feeds an aggregation rather than a join, or (b) the skew is in the build
side where AQE can't split. These helpers implement the standard recipes
deterministically (salt = hash of a row-unique column, never rand()) so
results stay reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    row_id: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `facts` has a skewed key distribution: facts rows
    get a deterministic salt in [0, n_salt) derived from a row-unique
    column; `dim` is replicated n_salt times. The shuffle key becomes
    (key, salt), splitting each hot key across n_salt reducers.

    Cost model: dim side grows n_salt×, so use only when the hot-key
    reducer is the bottleneck and dim is comparatively small."""
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(row_id)), F.lit(n_salt)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_facts.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def salted_grouped_agg(
    df: DataFrame,
    key: str,
    row_id: str,
    aggs: list[Column],
    reaggs: list[Column],
    n_salt: int = 8,
) -> DataFrame:
    """Two-stage aggregation for a skewed group key: first aggregate on
    (key, salt) — hot keys spread over n_salt reducers — then re-aggregate
    on key. `aggs` are the salted-stage expressions, `reaggs` combine the
    partials (e.g. sum of partial sums, sum of partial counts)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(row_id)), F.lit(n_salt)).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(*aggs)
    return partial.groupBy(key).agg(*reaggs)
