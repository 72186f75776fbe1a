"""Physical-plan property tests: the scale-critical plan shapes
(pushdown, pruning, broadcast, partial agg, top-k, no NLJ/Python-UDF on
hot paths) must hold — a correct-but-wrongly-planned operator is a
regression at 100 TB even when row-level results match."""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from audit_plans import AUDIT_EXEMPT, EXPECT, audit  # noqa: E402

from novelti_dingo_spark import registry
from novelti_dingo_spark.barrier import no_barriers
from novelti_dingo_spark.plans import explain_formatted


def _plan(spark, name, sf_dir):
    # Round-14: audit with materialization barriers DISABLED — a
    # localCheckpoint truncates the visible lineage to the final
    # segment, hiding the audited properties (partial agg, join
    # strategy, scan width) inside checkpointed subtrees. With barriers
    # off the plan contains every operator that executes; the barrier
    # only splits execution into stages (see novelti_dingo_spark.barrier).
    with no_barriers():
        df = registry.all_specs()[name].fn(spark, sf_dir)
        return explain_formatted(df)


def test_all_audited_plans_hold(spark, sf_med):
    problems = {}
    for name in EXPECT:
        p = audit(name, _plan(spark, name, sf_med))
        if p:
            problems[name] = p
    assert not problems, problems


def test_audit_lockstep():
    """Round-4 verdict item 8: the plan-audit set grows in lockstep with
    the registry. Every registered query must either carry an EXPECT plan
    audit or sit on the FROZEN pre-lockstep exemption list — a new query
    with neither fails here, and a name on both lists is a mistake."""
    specs = registry.all_specs()
    registered = set(specs)
    unaudited = registered - set(EXPECT) - AUDIT_EXEMPT
    assert not unaudited, (
        f"new queries without a plan audit (add an EXPECT entry in "
        f"tools/audit_plans.py, do NOT extend AUDIT_EXEMPT): {sorted(unaudited)}"
    )
    both = set(EXPECT) & AUDIT_EXEMPT
    assert not both, f"queries both audited and exempt: {sorted(both)}"
    stale = AUDIT_EXEMPT - registered
    assert not stale, f"exemption list names unregistered queries: {sorted(stale)}"


def test_every_query_tagged_for_coverage():
    """Every registered query must declare its SURVEY §2/§8 rows so
    tools/gen_coverage.py can place it in COVERAGE.md."""
    untagged = [
        n for n, s in registry.all_specs().items() if not s.survey_rows.strip()
    ]
    assert not untagged, untagged
