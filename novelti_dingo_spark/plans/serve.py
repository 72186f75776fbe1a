"""Tiered aggregate serving: result cache → materialized view → fact.

One verb for the question every dashboard backend answers per request:
"what is the cheapest CORRECT way to run this grouped aggregate right
now?" The tiers, in cost order:

1. **Result cache** (plans/result_cache.py): a prior result whose key
   pins the CURRENT fact version (and MV version, when one was used)
   — one parquet read, no aggregation at all.
2. **MV rewrite** (plans/mv.py): a containing rollup whose manifest
   `fact_version` token equals the fact's LATEST — re-aggregate k MV
   rows. A stale MV (token behind LATEST) is NEVER served: freshness
   is checked against the recorded token, not wall clocks.
3. **Fact scan**: the caller's builder against the pinned fact
   version — correct by definition, paid only when nothing cheaper is
   both containing and fresh.

Every tier computes from PINNED versions, so a publish racing the
request cannot mix tiers from different snapshots. At 100 TB tier 1
costs O(result), tier 2 O(|MV|), tier 3 O(fact) — the point of the
ladder is that the expensive rung is reached exactly when the data
actually changed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession

from .mv import choose_mv, rewrite_agg
from .result_cache import _latest_version, cached_result


def serve_agg(
    spark: SparkSession,
    *,
    cache_dir: str,
    name: str,
    fact_base: str,
    mv_candidates: list[str],
    group_keys: list[str],
    measures: dict[str, str | tuple[str, str]],
    predicate: Column | None = None,
    predicate_cols: list[str] | None = None,
    fact_builder: Callable[[SparkSession, int], DataFrame],
) -> tuple[DataFrame, str]:
    """Serve the grouped aggregate through the cheapest fresh tier.
    Returns (DataFrame, tier) with tier in {"cache", "mv", "fact"}.
    `fact_builder(spark, fact_version)` must compute the aggregate from
    that pinned fact version (read_version/read_version_chain with the
    explicit version)."""
    import json

    fact_v = _latest_version(fact_base)
    mv_base = choose_mv(
        spark, mv_candidates, group_keys, measures, predicate_cols
    )
    if mv_base is not None:
        # freshness gate: the MV must declare it covers the CURRENT
        # fact version; an undeclared or lagging token → fact path
        mv_v = _latest_version(mv_base)
        with open(f"{mv_base.rstrip('/')}/v={mv_v}/_manifest.json") as f:
            mv_manifest = json.load(f)
        if mv_manifest.get("fact_version") != fact_v:
            mv_base = None
    inputs = {"fact": fact_base}
    if mv_base is not None:
        inputs["mv"] = mv_base
    built_tier = {"tier": "fact"}

    def build(s: SparkSession, pinned: dict[str, int]) -> DataFrame:
        if mv_base is not None:
            df = rewrite_agg(
                s,
                mv_base,
                group_keys,
                measures,
                predicate=predicate,
                predicate_cols=predicate_cols,
                version=pinned["mv"],
            )
            if df is not None:
                built_tier["tier"] = "mv"
                return df
        built_tier["tier"] = "fact"
        return fact_builder(s, pinned["fact"])

    df, hit = cached_result(spark, cache_dir, name, inputs, build)
    return df, ("cache" if hit else built_tier["tier"])
