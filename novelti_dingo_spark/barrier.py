"""Materialization barriers for multiply-referenced plan subtrees.

Round-14 optimization (guide §3.3 "Materialising an intermediate result
truncates the plan" / §5 "localCheckpoint is a cheaper way to cut
lineage"): several operators reference one derived relation from many
plan subtrees (self-join sides, Apriori passes, a trained k-means model
consumed by assignment + residual + probe scoring). Catalyst does not
share work between those instantiations — and when the subtree contains
a nondeterministic fence (monotonically_increasing_id) it provably
cannot — so each reference re-executes the whole subtree. `barrier()`
marks the sites where we materialize such a relation ONCE per
invocation with `localCheckpoint` (eager, recomputed from parquet on
every call — nothing persists across invocations, unlike `persist()`
whose CacheManager would silently serve a previous call's data).

Plan audits (tools/audit_plans.py, tests/test_plans.py) run under
`no_barriers()`: a checkpoint truncates the visible lineage to the
final segment, which would hide the very properties the audit pins
(partial aggregation, join strategy, scan width) inside checkpointed
subtrees. With barriers off the audited plan contains every operator
that executes; the barrier only splits execution into stages, it never
changes what is computed.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_ENABLED = True


def barrier(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize `df` (localCheckpoint) so downstream references
    share one computation — identity under `no_barriers()` so plan
    audits see the full lineage. `eager=False` defers materialization
    to the first job that needs it (the RDD is persisted on first
    computation and lineage still truncates): use it inside
    driver-side loops where an eager checkpoint would be its own
    Spark job per iteration (guide §2.6 — one job whose independent
    stages overlap beats a chain of small jobs)."""
    return df.localCheckpoint(eager=eager) if _ENABLED else df


@contextmanager
def no_barriers():
    """Disable barrier() within the block (plan-audit tooling only)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = False
    try:
        yield
    finally:
        _ENABLED = prev
