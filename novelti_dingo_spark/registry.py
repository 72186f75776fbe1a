"""Query registry: name -> (Spark query fn, DuckDB oracle SQL).

Every operator declared in SURVEY.md §2 registers here; the driver pulls the
two sides via ``__spark_entry__.queries()`` / ``oracle_sql()`` and
hash-compares them at sf0.01. Keeping the Spark function and its oracle SQL
side-by-side in the operator modules minimizes Spark-vs-DuckDB drift.

Canonicalization rules applied uniformly (SURVEY.md §5.5):
- every computed/aggregate column is aliased identically on both sides;
- float aggregates are rounded (2dp for currency sums, 6dp for ratios);
- timestamps leave queries as epoch-second bigints or 'yyyy-MM-dd' strings;
- arrays leave queries as joined strings (sorted first);
- LIMIT queries carry a total order (tiebreaker key) on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL, or None → driver rows-only check
    survey_rows: str = ""  # SURVEY.md §2 row ids this query covers


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(name: str, oracle: str | None, survey_rows: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, survey_rows)
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so its @register calls run."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        relational,
        tpch_suite,
        functions_suite,
        windows,
        events_ops,
        asof,
        dedup,
        similarity,
        ivf,
        text,
        multimodal,
        extras,
        curation,
        llm_prep,
        sql_entry,
        analytics,
        typed,
        interval,
        pca,
    )

    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
