"""Window functions (SURVEY.md §2.5: W1-W4 + framed variants).

All windows are `Window.partitionBy(key).orderBy(total order)` — the order
always carries a tiebreaker key so results are deterministic on both
engines. Window aggregation shuffles once on the partition key; at 100 TB
the key (custkey / user_id) is high-cardinality and unskewed, so the
shuffle parallelizes evenly.

Float note: running/moving aggregates are rounded (2dp / 6dp) because
DuckDB evaluates window sums via segment trees (different addition order
than Spark's sequential frame scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table


@register(
    "window_topk_per_user",
    """
    SELECT event_id, user_id, value, rn FROM (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
    WHERE rn <= 3
    """,
    survey_rows="W1,W4",
)
def window_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: top-k per group via row_number — the scalable per-group top-k
    (single shuffle on the group key; no global sort)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.select(
            "event_id",
            "user_id",
            "value",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_rank_dense",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
    survey_rows="W1",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: rank / dense_rank / ntile over per-customer price ordering.
    rank() windows may order on the bare value (ties share ranks — still
    deterministic); ntile needs the total order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    wt = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
    )


@register(
    "window_lag_lead",
    """
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey_rows="W2,F2",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead analytics over per-user event time (ts is µs-aligned in
    the data, so Spark-µs and DuckDB-ns agree on ordering and deltas)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "us_since_prev"
        ),
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
    FROM orders
    """,
    survey_rows="W3",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: running (cumulative) aggregate with an explicit ROWS frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    )


@register(
    "window_moving_avg",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg_3
    FROM events
    """,
    survey_rows="W3",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: 3-row moving average (sliding ROWS frame)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("mavg_3")
    )


@register(
    "window_range_frame",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS sum_last_hour
    FROM events
    """,
    survey_rows="W3",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: RANGE frame over event time — per-event trailing-1h sum, the
    batch analogue of a sliding stream aggregate. Ordering on epoch µs
    keeps the frame arithmetic integer-exact on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("sum_last_hour"),
    )


@register(
    "window_first_last_nth",
    """
    SELECT event_id, user_id,
           first_value(good_value IGNORE NULLS) OVER w AS first_good,
           last_value(good_value IGNORE NULLS)  OVER w AS last_good,
           nth_value(good_value, 2 IGNORE NULLS) OVER w AS second_good
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type <> 'error' THEN value END AS good_value
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    survey_rows="W2,F4",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/F4: positional window values with NULL skipping — first, last,
    and 2nd non-error reading per user. Two hazards this query pins down:
    the frame must be explicitly unbounded BOTH ways (the default frame
    stops at CURRENT ROW, silently making last_value ≡ current row), and
    ignoreNulls must be engine-consistent (Spark's ignorenulls flag ==
    SQL IGNORE NULLS). The whole-partition frame evaluates once per
    partition, not per row — same single-shuffle cost as any per-user
    window at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        good.alias("good_value"),
    ).select(
        "event_id",
        "user_id",
        F.first("good_value", ignorenulls=True).over(w).alias("first_good"),
        F.last("good_value", ignorenulls=True).over(w).alias("last_good"),
        F.nth_value("good_value", 2, ignoreNulls=True).over(w).alias(
            "second_good"
        ),
    )
