"""Materialized-view publish + automatic aggregate rewrite.

The lakehouse pattern behind Trino/Calcite MV rewrite and BigQuery BI
Engine: publish an aggregate rollup ONCE as a versioned lake dataset
whose manifest carries the MV's algebra (group keys + measure
definitions), then answer matching aggregate queries FROM the rollup —
a k-row scan — instead of re-scanning the fact table. At 100 TB the MV
is the difference between an interactive dashboard query and a
full-table job: the fact scan is paid once at publish (and kept fresh
incrementally — see operators/timeseries.py rollup_incremental_
maintenance for the delta-merge half), every matching query after that
reads only the rollup.

Rewrite rule (the classic summary-table containment test):

- the query's group keys must be a SUBSET of the MV's group keys
  (coarser grain re-aggregates: sum-of-sums, sum-of-counts,
  min-of-mins, max-of-maxes — only ALGEBRAIC measures are published;
  holistic ones like exact medians are exactly what sketches are for,
  see kll_quantile_rollup);
- every requested measure must be one of the MV's measures, or an
  `avg` derivable as sum/count of two published measures;
- a query predicate may reference group-key columns only (it then
  prunes MV rows, which is still correct under re-aggregation).

When the test fails the caller falls back to the fact table — the
rewrite is an optimization, never a semantics change.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# measure kind -> how partial results MERGE under re-aggregation
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class MvSpec:
    """The MV's algebra as recorded in its manifest: `measures` maps
    output column -> (kind, source column); kind 'count' counts rows
    (source ignored)."""

    group_keys: tuple[str, ...]
    measures: dict[str, tuple[str, str | None]] = field(hash=False)

    def to_meta(self) -> dict:
        return {
            "mv": {
                "group_keys": list(self.group_keys),
                "measures": {
                    k: [kind, src] for k, (kind, src) in self.measures.items()
                },
            }
        }

    @staticmethod
    def from_manifest(manifest: dict) -> "MvSpec | None":
        mv = manifest.get("mv")
        if not mv:
            return None
        return MvSpec(
            tuple(mv["group_keys"]),
            {k: (v[0], v[1]) for k, v in mv["measures"].items()},
        )


def publish_mv(
    fact: DataFrame,
    base_dir: str,
    spec: MvSpec,
    fact_version: int | None = None,
    **publish_kwargs,
) -> int:
    """Aggregate `fact` to the MV grain and publish it versioned, with
    the algebra in the manifest so `rewrite_agg` can verify containment
    without trusting the caller. One fact scan, k-row output.

    `fact_version` (optional) records WHICH fact version this rollup
    covers — the freshness token `plans.serve.serve_agg` compares
    against the fact's LATEST to decide whether the MV may answer or
    the query must fall back to the fact."""
    from ..pipelines import publish_versioned

    meta = spec.to_meta()
    if fact_version is not None:
        meta["fact_version"] = int(fact_version)
    publish_kwargs["meta"] = meta
    aggs = []
    for out, (kind, src) in spec.measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind in ("sum", "min", "max"):
            aggs.append(getattr(F, kind)(src).alias(out))
        else:
            raise ValueError(
                f"measure {out!r}: kind {kind!r} is not algebraic — "
                "publish a sketch instead (HLL/KLL/Theta)"
            )
    rollup = fact.groupBy(*spec.group_keys).agg(*aggs)
    return publish_versioned(rollup, base_dir, **publish_kwargs)


def choose_mv(
    spark: SparkSession,
    candidates: list[str],
    group_keys: list[str],
    measures: dict[str, str | tuple[str, str]],
    predicate_cols: list[str] | None = None,
) -> str | None:
    """Cost-based MV selection: among candidate MV base dirs, return the
    one that CONTAINS the query (same test rewrite_agg applies) with the
    fewest manifest rows — the finest-grain MV costs the most to read
    and re-aggregate, so when several match, the smallest rollup wins.
    O(candidates) driver-side manifest reads, no data I/O; returns None
    when nothing contains the query (caller scans the fact)."""
    import json

    from ..sources import lakefs

    best: tuple[int, str] | None = None
    for base in candidates:
        b = base.rstrip("/")
        try:
            v = int(lakefs.read_text(spark, f"{b}/LATEST").strip())
            manifest = json.loads(
                lakefs.read_text(spark, f"{b}/v={v}/_manifest.json")
            )
        except Exception:
            continue
        spec = MvSpec.from_manifest(manifest)
        if spec is None:
            continue
        if not set(group_keys) <= set(spec.group_keys):
            continue
        if not set(predicate_cols or []) <= set(spec.group_keys):
            continue
        ok = True
        for want in measures.values():
            if isinstance(want, tuple):
                s, c = want
                if (
                    spec.measures.get(s, ("", None))[0] != "sum"
                    or spec.measures.get(c, ("", None))[0] != "count"
                ):
                    ok = False
            elif want not in spec.measures:
                ok = False
        if not ok:
            continue
        rows = int(manifest.get("rows", 1 << 62))
        if best is None or (rows, b) < best:
            best = (rows, b)
    return best[1] if best else None


def refresh_mv(
    spark: SparkSession,
    base_dir: str,
    delta_fact: DataFrame,
    fact_version: int | None = None,
    **publish_kwargs,
) -> int:
    """INCREMENTAL MV refresh: aggregate only the delta rows to the MV
    grain and MERGE them into the current MV (sum+sum, count+count,
    min-of-min, max-of-max) — publishing the result as a new version so
    readers flip atomically and old versions stay pinnable. Cost is
    O(delta) + O(|MV|), never a fact re-scan: the algebraic-measures
    restriction publish_mv enforces is exactly what makes this merge
    legal. New group keys appearing only in the delta materialize as new
    MV rows (the union handles them with no special case).

    JOIN MVs (the fact was pre-joined to dims before publish_mv, as in
    mv_rewrite_star_segment) refresh the same way: pass the DELTA
    pre-joined to the SAME dims. That is O(delta ⋈ dim) — legal iff the
    fact is append-only AND the dim attributes in the MV grain are
    stable between refreshes; a dim UPDATE invalidates already-merged
    rows, which no delta can repair — republish from scratch (or model
    the dim as SCD2 and group by the version key instead). Pinned by
    tests/test_mv_rewrite.py::test_join_mv_delta_refresh_equals_full_
    recompute."""
    from ..pipelines import read_version

    mv, manifest = read_version(spark, base_dir)
    spec = MvSpec.from_manifest(manifest)
    if spec is None:
        raise ValueError(f"{base_dir} is not a materialized view")
    aggs = []
    for out, (kind, src) in spec.measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        else:
            aggs.append(getattr(F, kind)(src).alias(out))
    delta = delta_fact.groupBy(*spec.group_keys).agg(*aggs)
    merged = (
        mv.select(*delta.columns)
        .unionByName(delta)
        .groupBy(*spec.group_keys)
        .agg(
            *[
                _MERGE[spec.measures[out][0]](out).alias(out)
                for out in spec.measures
            ]
        )
    )
    from ..pipelines import publish_versioned

    meta = spec.to_meta()
    if fact_version is not None:
        # advance the freshness token alongside the merged delta
        meta["fact_version"] = int(fact_version)
    return publish_versioned(merged, base_dir, meta=meta, **publish_kwargs)


def rewrite_agg(
    spark: SparkSession,
    mv_base_dir: str,
    group_keys: list[str],
    measures: dict[str, str | tuple[str, str]],
    predicate: Column | None = None,
    predicate_cols: list[str] | None = None,
    version: int | None = None,
    min_published_ts: str | None = None,
) -> DataFrame | None:
    """Answer a grouped aggregate FROM the MV if containment holds,
    else return None (caller falls back to the fact table).

    `measures` maps requested output column -> an MV measure name, or
    ("avg", sum_measure, ...) expressed as a tuple (sum_name, count_name)
    for derived averages. `predicate` (over `predicate_cols`) is applied
    to the MV rows before re-aggregation and is only legal on group-key
    columns.

    `min_published_ts` is the STALENESS contract: an MV published before
    that ISO timestamp is treated as non-containing (None — fall back to
    the fact) rather than silently serving stale rollups; pair it with
    refresh_mv on whatever cadence the dashboard tolerates."""
    from ..pipelines import read_version

    df, manifest = read_version(spark, mv_base_dir, version)
    spec = MvSpec.from_manifest(manifest)
    if spec is None:
        return None
    if (
        min_published_ts is not None
        and (manifest.get("published_ts") or "") < min_published_ts
    ):
        return None
    if not set(group_keys) <= set(spec.group_keys):
        return None
    if predicate is not None and not set(predicate_cols or []) <= set(
        spec.group_keys
    ):
        return None
    aggs = []
    for out, want in measures.items():
        if isinstance(want, tuple):  # derived average: sum / count
            s, c = want
            if s not in spec.measures or c not in spec.measures:
                return None
            if spec.measures[s][0] != "sum" or spec.measures[c][0] != "count":
                return None
            aggs.append((F.sum(s) / F.sum(c)).alias(out))
            continue
        if want not in spec.measures:
            return None
        kind = spec.measures[want][0]
        aggs.append(_MERGE[kind](want).alias(out))
    if predicate is not None:
        df = df.filter(predicate)
    return df.groupBy(*group_keys).agg(*aggs)
