"""Physical-plan property tests: the scale-critical plan shapes
(pushdown, pruning, broadcast, partial agg, top-k, no NLJ/Python-UDF on
hot paths) must hold — a correct-but-wrongly-planned operator is a
regression at 100 TB even when row-level results match."""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from audit_plans import EXPECT, audit  # noqa: E402

from novelti_dingo_spark import registry
from novelti_dingo_spark.plans import explain_formatted


def _plan(spark, name, sf_dir):
    df = registry.all_specs()[name].fn(spark, sf_dir)
    return explain_formatted(df)


def test_all_audited_plans_hold(spark, sf_med):
    problems = {}
    for name in EXPECT:
        p = audit(name, _plan(spark, name, sf_med))
        if p:
            problems[name] = p
    assert not problems, problems
