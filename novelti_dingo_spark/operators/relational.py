"""Relational operators (SURVEY.md §2.2-2.7): projection/filter/conditional,
joins (inner chains, outer, semi/anti, broadcast, theta/range, cross),
aggregation (grouped, distinct, approx, rollup, filtered, collect, global),
sort/limit/top-k, and set operations.

Everything is declarative DataFrame API — Catalyst handles predicate
pushdown, column pruning, join selection (dims auto-broadcast under the
32 MB threshold), and AQE re-planning. No UDFs anywhere in this module, so
every expression stays inside whole-stage codegen.

Scale notes (100 TB posture) are on each operator where non-obvious.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table


def _ts(lit: str):
    return F.to_timestamp(F.lit(lit))


# ---------------------------------------------------------------------------
# Flagship aggregation / join-chain queries (A1, J1, O2)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_rows="A1,F3,P2",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → two-phase hash agg.

    Scale: partial aggregation is map-side (HashAggregateExec partial/final),
    so the shuffle carries 6 groups × partial states, not 600k rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    WITH r AS (
      SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1996-03-15'
        AND l_shipdate  > TIMESTAMP '1996-03-15'
      GROUP BY l_orderkey, o_orderdate
    )
    SELECT * FROM r ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    survey_rows="J1,A1,O2,F2",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join → agg → global top-k.

    Scale: customer is broadcast (small dim); orders↔lineitem is a shuffle
    join on the natural key. ORDER BY + LIMIT plans TakeOrderedAndProject —
    each partition keeps 10 rows, no global sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1996-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1996-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_join_chain",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    survey_rows="J1,A1,P2",
)
def q5_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join chain → grouped agg.

    Scale: lineitem↔orders shuffles on orderkey; supplier/nation/region/
    customer are broadcast dims, so the chain adds no further shuffles.
    Join order is smallest-effective-first (CBO is off by default).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    survey_rows="A5,P2",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg — every predicate is
    parquet-pushable; the plan is a single codegen stage with no shuffle
    beyond the 1-row partial-agg exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / filter / conditional (P1-P3)
# ---------------------------------------------------------------------------


@register(
    "proj_computed_cols",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)               AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
           l_quantity * 2                                   AS double_qty
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
    survey_rows="P1",
)
def proj_computed_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: projection with computed, aliased columns (no shuffle at all).

    Row-level IEEE double arithmetic is bit-deterministic, so raw values
    (no rounding) hash-match across engines; rounding rules do NOT
    (Spark HALF_UP vs DuckDB) — never round non-aggregate floats.
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_orderkey") <= 100).select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
        (F.col("l_quantity") * 2).alias("double_qty"),
    )


@register(
    "filter_predicates",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 200000
      AND o_orderstatus IN ('F', 'O')
      AND o_orderpriority LIKE '1-%'
      AND o_custkey IS NOT NULL
      AND (o_orderkey % 2 = 0 OR o_totalprice > 150000)
    """,
    survey_rows="P2,F3",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: BETWEEN / IN / LIKE / IS NULL / boolean combination — all pushed
    to the parquet scan (PushedFilters) except the disjunction, which stays
    in the codegen'd filter."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
        & ((F.col("o_orderkey") % 2 == 0) | (F.col("o_totalprice") > 150000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "case_when_bucket",
    """
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS bucket,
           count(*)                  AS n_orders,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY 1
    """,
    survey_rows="P3,A1",
)
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: CASE WHEN bucketing feeding a grouped agg."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Joins (J2-J7; J1 covered by q3/q5)
# ---------------------------------------------------------------------------


@register(
    "join_left_outer",
    """
    SELECT c_custkey, count(o_orderkey) AS order_cnt,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    survey_rows="J2,A1,F4",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: null-extending left join; count(col) skips the null-extended rows.

    Scale: at 100 TB the orders side is pre-aggregated per custkey *before*
    the join, so the join matches one row per customer instead of fanning
    out — classic agg-pushdown-below-outer-join."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum("o_totalprice").alias("_sum"),
        )
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("_cnt"), F.lit(0)).alias("order_cnt"),
        F.round(F.coalesce(F.col("_sum"), F.lit(0.0)), 2).alias("total_spent"),
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    survey_rows="J3",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi join == EXISTS; emits each customer at most once and
    never carries orders columns past the join (minimal shuffle payload)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    """,
    survey_rows="J3",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-anti join == NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2001-01-01")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_broadcast_dim",
    """
    SELECT p_brand,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 25
    GROUP BY p_brand
    """,
    survey_rows="J4,A1",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: explicit broadcast hint — the fact side never shuffles for the
    join; only the 25-group agg exchanges. At 100 TB `part` (20M rows ≈
    1 GB) may exceed the broadcast threshold, in which case drop the hint
    and let AQE choose shuffled-hash."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "join_theta_range",
    """
    SELECT s_nationkey AS nationkey, count(*) AS pair_cnt,
           round(avg(c_acctbal - s_acctbal), 4) AS avg_gap
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    GROUP BY s_nationkey
    """,
    survey_rows="J5,A1",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: hybrid equi + range predicate. The equi part (nationkey) hashes;
    the range rides along as a post-join filter, so this is a hash join,
    NOT a nested-loop — the pattern to prefer whenever a theta join has any
    conjunctive equi component."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("pair_cnt"),
            F.round(F.avg(F.col("c_acctbal") - F.col("s_acctbal")), 4).alias(
                "avg_gap"
            ),
        )
    )


@register(
    "join_cross",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    survey_rows="J7",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: cartesian product — only ever between tiny dims (5×25 here)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


# ---------------------------------------------------------------------------
# Aggregation breadth (A2-A7)
# ---------------------------------------------------------------------------


@register(
    "agg_distinct_customers",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS distinct_custs,
           count(*)                  AS order_cnt
    FROM orders GROUP BY o_orderstatus
    """,
    survey_rows="A2",
)
def agg_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct aggregate — Spark expands to a two-level aggregation
    (dedup on (status, custkey) then count), all shuffle-partial."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("distinct_custs"),
        F.count(F.lit(1)).alias("order_cnt"),
    )


@register(
    "agg_approx_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_custs,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderstatus
    """,
    survey_rows="A3",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: HyperLogLog++ approximate distinct — constant memory per group
    vs the exact expansion; the scale-path default for 100 TB cardinality
    estimation. The ±rsd accuracy assertion is inside the query: it emits
    the exact count plus a boolean witness that the HLL estimate landed
    within tolerance, so the DuckDB oracle (exact count + TRUE) hash-checks
    both the grouping AND the estimator's accuracy. The exact column is the
    oracle witness only — a production rollup keeps just the sketch."""
    # round-14: widen() measured a WASH here (1.47 s vs 1.46 s
    # interleaved A/B — the distinct expansion re-shuffles anyway);
    # left narrow
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("exact_custs"),
            F.approx_count_distinct("o_custkey", 0.02).alias("_approx"),
        )
        .select(
            "o_orderstatus",
            "exact_custs",
            (
                F.abs(F.col("_approx") - F.col("exact_custs"))
                <= F.greatest(
                    F.lit(3.0), F.lit(0.1) * F.col("exact_custs")
                )
            ).alias("approx_ok"),
        )
    )


@register(
    "agg_rollup",
    """
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    survey_rows="A4,J1",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: rollup lattice (region → nation → grand total) over broadcast
    dim joins; Spark expands grouping sets map-side."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    survey_rows="A4",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: full cube over two low-cardinality flags."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "agg_filtered",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS hi_disc_price,
           count(*) FILTER (WHERE l_quantity >= 25)                        AS big_qty_lines,
           count(*)                                                        AS n_lines
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows="A6,P3",
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: FILTER'd aggregates via when(): one pass, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 2
        ).alias("hi_disc_price"),
        F.count(F.when(F.col("l_quantity") >= 25, F.lit(1))).alias("big_qty_lines"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "agg_collect_set",
    """
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY c_mktsegment
    """,
    survey_rows="A7,J4,F1",
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: set-collect, canonicalized (sorted + joined) for order-stable
    comparison. Scale: collect_* is only safe when per-group cardinality is
    bounded (25 nations here); unbounded groups need a different design."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
        )
    )


@register(
    "agg_global_stats",
    """
    SELECT count(*)                                   AS n_lines,
           round(sum(l_quantity), 2)                  AS total_qty,
           round(min(l_extendedprice), 2)             AS min_price,
           round(max(l_extendedprice), 2)             AS max_price,
           strftime(min(l_shipdate), '%Y-%m-%d')      AS first_ship,
           strftime(max(l_shipdate), '%Y-%m-%d')      AS last_ship
    FROM lineitem
    """,
    survey_rows="A5,F2",
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: keyless global aggregate — partials from every partition reduce
    into a single row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (O1-O2)
# ---------------------------------------------------------------------------


@register(
    "sort_nulls_last",
    """
    SELECT o_orderkey, nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio,
           o_totalprice
    FROM orders
    ORDER BY prio DESC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    survey_rows="O1,F4",
)
def sort_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: explicit null ordering with a total order (tiebreaker key) so the
    LIMIT is deterministic on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("prio"),
            "o_totalprice",
        )
        .orderBy(
            F.desc_nulls_last("prio"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(20)
    )


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    survey_rows="O2",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-k — Spark plans TakeOrderedAndProject (per-partition
    heap of k, merge at driver), never a full sort. The pattern that keeps
    top-k O(n) at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (U1-U3)
# ---------------------------------------------------------------------------


@register(
    "setop_union_all",
    """
    SELECT o_orderpriority, count(*) AS n FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderpriority FROM orders WHERE o_totalprice > 250000
    ) GROUP BY o_orderpriority
    """,
    survey_rows="U1,A1",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: bag union (unionByName — positional unions are a footgun)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderpriority")
    b = o.filter(F.col("o_totalprice") > 250000).select("o_orderpriority")
    return a.unionByName(b).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "setop_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    survey_rows="U2",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: set intersect (Spark plans it as a distinct + left-semi join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return auto.intersect(finished)


@register(
    "setop_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    survey_rows="U2",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: set difference. `subtract` is EXCEPT DISTINCT: any value present
    on the right is removed entirely regardless of left-side multiplicity
    (exceptAll().distinct() would keep values the left has MORE copies of —
    wrong for true EXCEPT on non-unique inputs)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    p = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.distinct().subtract(p)


@register(
    "distinct_pairs",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    survey_rows="U3",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: row dedup — a hash aggregate on all projected columns."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@register(
    "join_full_outer",
    """
    WITH ord AS (
      SELECT o_custkey AS custkey, count(*) AS n_orders
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY 1),
    ev AS (
      SELECT user_id AS custkey, count(*) AS n_events
      FROM events GROUP BY 1)
    SELECT coalesce(ord.custkey, ev.custkey) AS custkey,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(n_events, 0) AS n_events
    FROM ord FULL OUTER JOIN ev USING (custkey)
    """,
    survey_rows="J2,F4",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer join of two asymmetric aggregates (recent-order
    customers vs event-active users) — null-extends both sides."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2001-01-01"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return o.join(e, "custkey", "full_outer").select(
        "custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


@register(
    "join_right_outer",
    """
    SELECT c_custkey, c_mktsegment, count(event_id) AS n_events
    FROM events RIGHT JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
    survey_rows="J2",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: right outer join — every customer kept, event-less customers
    count 0 (count(col) skips null-extended rows)."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        e.join(c, e.user_id == c.c_custkey, "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("event_id").alias("n_events"))
    )


@register(
    "setop_except_all",
    """
    SELECT l_suppkey, count(*) AS n FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ) GROUP BY 1
    """,
    survey_rows="U2",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: bag (multiset) difference — exceptAll keeps surplus
    multiplicity, unlike set EXCEPT."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.exceptAll(r).groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "setop_intersect_all",
    """
    SELECT l_suppkey, count(*) AS n FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ) GROUP BY 1
    """,
    survey_rows="U2",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: bag intersection — min multiplicity per value."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.intersectAll(r).groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "join_null_safe",
    """
    WITH f AS (
      SELECT nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio,
             count(*) AS n_f
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
    o AS (
      SELECT nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio,
             count(*) AS n_o
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
    SELECT f.prio, n_f, n_o
    FROM f JOIN o ON f.prio IS NOT DISTINCT FROM o.prio
    """,
    survey_rows="J1,F4,null-safe",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the NULL bucket
    joins to itself instead of vanishing — still a hash join (null-safe
    equality is a valid hash key), NOT a nested loop."""
    ords = load_table(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))
    f = (
        ords.filter(F.col("o_orderstatus") == "F")
        .groupBy(prio.alias("prio"))
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    o = (
        ords.filter(F.col("o_orderstatus") == "O")
        .groupBy(prio.alias("prio_o"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    return f.join(o, f.prio.eqNullSafe(o.prio_o)).select("prio", "n_f", "n_o")


@register(
    "agg_approx_percentile",
    """
    SELECT o_orderstatus,
           round(CAST(quantile_cont(o_totalprice, 0.50) AS DOUBLE), 2)
             AS exact_p50,
           round(CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE), 2)
             AS exact_p95,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderstatus
    """,
    survey_rows="A3,A8",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A8: approximate percentiles (Greenwald-Khanna sketch via
    `approx_percentile`) beside the exact interpolated quantiles — the
    constant-memory scale path for 100 TB latency/price monitoring,
    checked with the same tolerance-witness idiom as
    agg_approx_distinct: the query emits the EXACT p50/p95 plus one
    boolean witnessing the sketch landed within rank tolerance, so the
    oracle hash-checks grouping, exact values, AND estimator accuracy
    in one row. GK with accuracy parameter 100 guarantees rank error
    <= n/100; the witness converts that to a value-domain bound via
    the exact p45/p55 (resp. p90/p99) bracket — an estimate outside
    the bracketing exact quantiles means the sketch violated its rank
    contract. The exact columns are oracle witnesses; a production
    rollup keeps just the sketch."""
    o = load_table(spark, sf_dir, "orders")
    exact = F.expr(
        "percentile(o_totalprice, array(0.45, 0.50, 0.55, 0.90, 0.95, 0.99))"
    )
    approx = F.expr(
        "approx_percentile(o_totalprice, array(0.50, 0.95), 100)"
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(exact.alias("_e"), approx.alias("_a"))
        .select(
            "o_orderstatus",
            F.round(F.col("_e")[1], 2).alias("exact_p50"),
            F.round(F.col("_e")[4], 2).alias("exact_p95"),
            (
                (F.col("_a")[0] >= F.col("_e")[0])
                & (F.col("_a")[0] <= F.col("_e")[2])
                & (F.col("_a")[1] >= F.col("_e")[3])
                & (F.col("_a")[1] <= F.col("_e")[5])
            ).alias("approx_ok"),
        )
    )


@register(
    "unpivot_daily_event_matrix",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
           event_type,
           count(*) AS n_events
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
    GROUP BY 1, 2
    """,
    survey_rows="U,F5,A1,unpivot",
)
def unpivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide day x event-type count matrix —
    produced by the same .pivot() surface pivot_event_counts exercises
    — flows back to long form through DataFrame.unpivot, the inverse
    relational op (SQL UNPIVOT / pandas melt). The oracle computes the
    long form directly from the raw table, so the hash match proves
    pivot -> unpivot is lossless round-tripping (absent cells surface
    as NULL counts and are dropped, exactly like rows that never
    existed).

    Scale shape: the pivot is one partial-agg'd groupBy whose output
    is the bounded (days x types) grid; unpivot is a zero-shuffle
    projection (each wide row explodes to its value columns
    map-side). At 100 TB the wide matrix IS grid-sized — this is the
    standard metrics-table <-> tidy-table bridge, not a data-sized
    transpose."""
    e = load_table(spark, sf_dir, "events")
    types = ["view", "click", "purchase"]
    wide = (
        e.filter(F.col("event_type").isin(types))
        .groupBy(F.to_date("ts").cast("string").alias("d"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return (
        wide.unpivot(
            ids=["d"],
            values=types,
            variableColumnName="event_type",
            valueColumnName="n_events",
        )
        .filter(F.col("n_events").isNotNull())
    )
