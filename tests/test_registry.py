"""Registry contract tests: every declared query must satisfy the driver's
calling convention (SURVEY.md §0: each declared row is a correctness
obligation)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from novelti_dingo_spark import registry


def test_no_empty_registry():
    assert len(registry.all_specs()) >= 40


def test_oracle_keys_subset_of_queries():
    qs = registry.queries()
    for name in registry.oracles():
        assert name in qs


def test_entry_module_contract():
    import __spark_entry__ as E

    qs = E.queries()
    osql = E.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())


def test_all_queries_run_and_are_aliased(spark, sf_small):
    """Each query runs at sf0.001, returns a DataFrame, and has clean
    column names (no un-aliased `sum(x)`-style names, which would
    hash-mismatch the oracle's column sort)."""
    bad_name = re.compile(r"[()]")
    for name, fn in registry.queries().items():
        df = fn(spark, sf_small)
        assert isinstance(df, DataFrame), name
        for col in df.columns:
            assert not bad_name.search(col), f"{name}: un-aliased column {col!r}"
        # must be executable, not just constructible
        df.limit(5).collect()
