"""Manifest-stats-driven join planning — the consumer of the NDV /
null-count / row-count statistics `publish_versioned(ndv_cols=...)`
collects for free at write time (one Observation, no second scan).

Spark's cost-based optimizer reads statistics from a persistent
metastore (`ANALYZE TABLE` → HiveExternalCatalog properties). A
manifest-format lake has a better source: the stats were already
measured at publish, so planning reads them as O(1) driver-side JSON —
the Iceberg/Trino connector-statistics pattern — instead of paying an
O(table) ANALYZE re-scan or trusting raw file sizes. (The local
in-memory catalog has no public stats-injection API at all; on a
Hive/Unity deployment these same numbers can be mirrored into
`spark.sql.statistics.*` table properties, but nothing below depends
on that.)

Two decisions the stats drive, both pinned by tests/test_stats_cbo.py:

- **Broadcast**: a dim is broadcast when its estimated deserialized
  size (manifest rows x schema-derived row width) fits the threshold.
  File size is the wrong proxy at scale in both directions — a wide
  parquet dim compresses 5-10x (file size blocks a broadcast that
  would fit), and a projected read of a huge file is small. Rows x
  width of the columns actually joined is the honest estimate.
- **Star-join order**: inner FK joins are re-ordered most-selective
  first using the System-R containment estimate — joining fact F to
  dim D on key k retains |F| * ndv_D(k) / max(ndv_F(k), ndv_D(k))
  rows, so a dim covering 10% of the fact's key domain shrinks every
  later join by 10x when it runs first. Without stats the planner
  keeps declared order (exactly what Spark does without CBO stats).

At 100 TB the ordering decision is the difference between shuffling
the full fact table through every join versus once: the stats are a
few hundred bytes of manifest JSON and the decision is pure driver
arithmetic before any job is scheduled.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative deserialized per-value widths (bytes) by simpleString
# prefix; strings/binary ride an average payload guess — estimation,
# not accounting, so order-of-magnitude correct is the bar
_WIDTHS = {
    "tinyint": 1, "smallint": 2, "int": 4, "bigint": 8,
    "float": 4, "double": 8, "boolean": 1, "date": 4,
    "timestamp": 8, "timestamp_ntz": 8, "decimal": 16,
    "string": 24, "binary": 48,
}


def estimated_row_bytes(schema) -> int:
    """Deserialized row width from a StructType — the broadcast-size
    estimate Spark itself cannot make from a compressed footer."""
    total = 0
    for f in schema.fields:
        s = f.dataType.simpleString()
        total += _WIDTHS.get(s.split("(")[0], 32)
    return max(total, 8)


def estimated_size_bytes(manifest: dict) -> int | None:
    """rows x row-width from a publish manifest; None when the manifest
    predates row counting (no estimate — never guess a broadcast)."""
    rows = manifest.get("rows")
    if rows is None:
        return None
    from ..pipelines import _manifest_schema

    return int(rows) * estimated_row_bytes(_manifest_schema(manifest))


def manifest_ndv(manifest: dict, col: str) -> int | None:
    """approx NDV for `col` recorded by publish_versioned(ndv_cols)."""
    stats = manifest.get("column_stats") or {}
    c = stats.get(col)
    return int(c["ndv"]) if c and "ndv" in c else None


@dataclass
class DimSpec:
    """One dimension of a star join: `df` joins the fact on
    fact[fact_key] == df[dim_key]."""

    name: str
    df: DataFrame
    manifest: dict
    fact_key: str
    dim_key: str


@dataclass
class JoinDecision:
    name: str
    position: int
    retention: float
    est_bytes: int | None
    broadcast: bool


@dataclass
class StarJoinPlan:
    decisions: list[JoinDecision] = field(default_factory=list)

    @property
    def order(self) -> list[str]:
        return [d.name for d in self.decisions]


def plan_star_join(
    fact: DataFrame,
    fact_manifest: dict,
    dims: list[DimSpec],
    broadcast_threshold: int = 10 << 20,
    use_stats: bool = True,
) -> tuple[DataFrame, StarJoinPlan]:
    """Inner-join `fact` against every dim, stats-ordered and
    stats-broadcast. With `use_stats=False` (or missing stats) the
    declared order is kept and no broadcast hints are issued — the
    baseline a stats-less planner is stuck with; the pytest pins the
    plan difference between the two."""
    scored = []
    for i, d in enumerate(dims):
        retention = 1.0
        est = None
        if use_stats:
            est = estimated_size_bytes(d.manifest)
            ndv_f = manifest_ndv(fact_manifest, d.fact_key)
            ndv_d = manifest_ndv(d.manifest, d.dim_key)
            if ndv_f and ndv_d:
                # containment: |F join D| / |F| = ndv_D / max(ndv_F, ndv_D)
                retention = min(1.0, ndv_d / max(ndv_f, ndv_d))
        scored.append((retention, i, est, d))
    if use_stats:
        scored.sort(key=lambda t: (t[0], t[1]))  # most selective first
    out = fact
    plan = StarJoinPlan()
    for pos, (retention, _i, est, d) in enumerate(scored):
        side = d.df
        bcast = bool(
            use_stats and est is not None and est <= broadcast_threshold
        )
        if bcast:
            side = F.broadcast(side)
        out = out.join(
            side, out[d.fact_key] == side[d.dim_key], "inner"
        )
        plan.decisions.append(
            JoinDecision(d.name, pos, retention, est, bcast)
        )
    return out, plan
