"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``novelti_dingo_spark``; this module is a thin
adapter over its query registry (novelti_dingo_spark/registry.py), which
keeps each Spark query function and its DuckDB oracle SQL side-by-side.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may import this module with a cwd elsewhere; make the package
# resolvable regardless
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from novelti_dingo_spark import registry
from novelti_dingo_spark.operators.relational import q5_join_chain


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 join chain) on /root/testdata/sf0.001."""
    return q5_join_chain(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """Matching DuckDB ANSI SQL for each oracle-expressible query."""
    return registry.oracles()
