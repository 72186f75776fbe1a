"""SQL-string entry point (SURVEY.md §3 entry point 3): queries declared
as Spark SQL text over the registered temp views (S4). Same Catalyst
pipeline after the parser; demonstrates that the engine's surface is
reachable via `spark.sql` exactly as via the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.io import register_views


@register(
    "sql_revenue_by_region",
    """
    SELECT r_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    survey_rows="S4,J1,A1",
)
def sql_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared as a pure SQL string — identical text runs on both engines
    (the oracle above IS the query, ANSI-only)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@register(
    "sql_segment_priority_matrix",
    """
    SELECT c_mktsegment, o_orderpriority,
           count(*) AS n_orders,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderpriority
    """,
    survey_rows="S4,J1,A1",
)
def sql_segment_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-only SQL string shared verbatim with the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
        """
    )


_LATERAL_SQL = """
    SELECT n_name, c_name, c_acctbal
    FROM nation,
    LATERAL (SELECT c_name, c_acctbal FROM customer
             WHERE c_nationkey = n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 1) top_cust
"""


@register(
    "sql_lateral_top1",
    _LATERAL_SQL,
    survey_rows="S4,J1,W4",
)
def sql_lateral_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: richest customer
    per nation — the per-group-top-k shape expressed as a lateral join
    (identical ANSI text runs on both engines). Catalyst decorrelates it
    into a join + per-group limit rather than a per-row re-execution, so
    the plan scales like W4, not like a nested loop."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
