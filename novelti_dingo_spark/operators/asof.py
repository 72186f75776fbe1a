"""As-of join (SURVEY.md §2.3 J6).

Spark has no native ASOF JOIN primitive. The scalable implementation here
is the union-merge idiom: tag both streams, union them, sort within each
key partition by event time, and carry the most recent right-side row
forward with `last(..., ignorenulls=True)` over an unbounded-preceding
frame. One shuffle on the join key, linear work — no per-row range probe,
no quadratic fan-out (a naive `join ON ts_left >= ts_right` + max explodes
at 100 TB; this doesn't).

Oracle: DuckDB's native ASOF LEFT JOIN. Right side is pre-deduplicated to
one row per (key, ts) on both engines so ties are impossible and the match
is unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table


@register(
    "asof_join_latest_click",
    """
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ), purchases AS (
      SELECT event_id AS purchase_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           epoch_us(p.ts)  AS purchase_ts_us,
           p.value         AS purchase_value,
           c.click_id      AS last_click_id,
           epoch_us(c.ts)  AS last_click_ts_us
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    survey_rows="J6",
)
def asof_join_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: for every purchase, the latest click by the same user at or
    before the purchase time (NULL if none)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("double").alias("purchase_value"),
        F.lit(0).alias("_side"),  # clicks sort before purchases at equal ts
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.lit(1).alias("_side"),
    )
    merged = clicks.unionByName(purchases)
    # click_id as the third sort key makes ties at equal (user, ts)
    # deterministic: last() then picks the max click_id, matching the
    # oracle's pre-deduplicated ASOF match — no separate dedup aggregation
    # (and no second shuffle; the window Exchange is the plan's only one).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_side", F.asc_nulls_first("click_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.select(
            "*",
            F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
            F.last(F.when(F.col("click_id").isNotNull(), F.unix_micros("ts")), True)
            .over(w)
            .alias("last_click_ts_us"),
        )
        .filter(F.col("_side") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_ts_us"),
            "purchase_value",
            "last_click_id",
            "last_click_ts_us",
        )
    )
