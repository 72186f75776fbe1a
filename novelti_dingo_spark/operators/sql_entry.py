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


@register(
    "sql_udf_pricing",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows="S4,A1,F3",
)
def sql_udf_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`):
    the business expression is named once and reused across queries, and
    Catalyst INLINES it into the plan — unlike a Python UDF there is no
    serialization boundary, so it stays inside whole-stage codegen (the
    oracle is the same query with the expression inlined by hand)."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(disc_price(l_extendedprice, l_discount)), 2) AS revenue,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
        """
    )


@register(
    "sql_recursive_calendar",
    """
    WITH RECURSIVE cal(d) AS (
      SELECT DATE '1996-01-01'
      UNION ALL
      SELECT d + INTERVAL 1 DAY FROM cal WHERE d < DATE '1996-03-31'
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, count(o_orderkey) AS n_orders
    FROM cal LEFT JOIN orders ON o_orderdate = CAST(d AS TIMESTAMP)
    GROUP BY d
    """,
    survey_rows="S4,J2,F2",
)
def sql_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate a Q1-1996 daily
    calendar spine by recursion, then LEFT JOIN order counts onto it so
    zero-order days surface — the gap-filling shape, this time driven by
    recursion instead of `sequence()` (gapfill_hourly). Spark's recursive
    CTEs are UNION ALL-only (no set-dedup step yet), which a bounded
    monotone spine satisfies; fixpoints needing UNION-distinct (e.g.
    graph reachability) stay on the iterative DataFrame path
    (dedup.connected_components)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE cal(d) AS (
          SELECT DATE '1996-01-01'
          UNION ALL
          SELECT date_add(d, 1) FROM cal WHERE d < DATE '1996-03-31'
        )
        SELECT date_format(d, 'yyyy-MM-dd') AS day,
               count(o_orderkey) AS n_orders
        FROM cal LEFT JOIN orders ON o_orderdate = CAST(d AS TIMESTAMP)
        GROUP BY d
        """
    )


_NOT_IN_SQL = """
    SELECT c_mktsegment, count(*) AS n_never_partial
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'P')
    GROUP BY c_mktsegment
"""


@register("sql_not_in_subquery", _NOT_IN_SQL, survey_rows="S4,J3")
def sql_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — identical SQL text on both engines. NOT IN is
    NOT the same as an anti join: if the subquery produced even one NULL,
    three-valued logic makes every row's predicate UNKNOWN and the result
    is empty, so Spark plans a null-aware anti join
    (BroadcastHashJoin ... LeftAnti, NULL-aware) rather than the plain
    LeftAnti a NOT EXISTS would get. Here o_custkey is non-null so rows
    survive — but the plan shape (and the trap) is the point. At scale
    prefer NOT EXISTS unless NULL-propagating semantics are genuinely
    wanted: the null-aware build side must be broadcast in one piece."""
    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_SQL)
