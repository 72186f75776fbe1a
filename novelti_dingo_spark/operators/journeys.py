"""User-journey attribution over the events stream: which touch
channels (click / view) get credit for conversions (purchases)?

Complements the funnel family (`funnel_signup_click_purchase`,
`signup_to_purchase_latency`, `event_transition_matrix`) with the
marketing-analytics staple those don't cover: MULTI-TOUCH CREDIT
ASSIGNMENT. Position-based (U-shaped) model: first and last touch 40%
each, the remaining 20% split evenly across middle touches; a single
touch takes 100%, exactly two touches take 50/50.

Scale shape: the touch-to-conversion pairing is a per-user interval
join — equi-join on user_id (hash join) with a residual time-range
predicate, never a nested-loop range probe; per-conversion ranking is
one window over the conversion id. At 100 TB both shuffles key on
user/conversion ids (high cardinality, no hot key: a user's touches in
a 7-day window are bounded by human behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table

# attribution lookback: touches within this many days before a purchase
ATTRIB_WINDOW_DAYS = 7


@register(
    "attribution_position_credit",
    f"""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS touch_id, user_id, event_type AS channel, ts
      FROM events WHERE event_type IN ('click', 'view')
    ),
    paired AS (
      SELECT c.conv_id, t.touch_id, t.channel, t.ts
      FROM conv c JOIN touch t ON c.user_id = t.user_id
      WHERE t.ts <= c.conv_ts
        AND t.ts > c.conv_ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAY
    ),
    ranked AS (
      SELECT conv_id, channel,
             row_number() OVER w AS rn_asc,
             count(*)     OVER (PARTITION BY conv_id) AS n
      FROM paired
      WINDOW w AS (PARTITION BY conv_id ORDER BY ts, touch_id)
    ),
    credited AS (
      SELECT channel,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rn_asc = 1 OR rn_asc = n THEN 0.4
                  ELSE 0.2 / (n - 2) END AS credit,
             conv_id
      FROM ranked
    )
    SELECT channel,
           round(sum(credit), 4) AS total_credit,
           count(*) AS n_touches,
           count(DISTINCT conv_id) AS n_conversions
    FROM credited GROUP BY channel
    """,
    survey_rows="J8,W1,A2,attribution",
)
def attribution_position_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based multi-touch attribution: credit per channel over
    all purchases, touches taken from each purchaser's trailing 7 days.

    The pairing is expressed as an equi-join on user_id with the time
    range as a RESIDUAL predicate — Spark plans a hash join (the user
    key carries the shuffle), not a nested-loop range join; the oracle
    runs the identical relational spec. Ranking within each conversion
    is one window partitioned by conv_id (a fresh high-cardinality key,
    so the second shuffle is skew-free by construction). Credit sums are
    rounded 4dp: the CASE credits are exact binary fractions except the
    middle split, whose accumulation order differs between engines."""
    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("channel"),
        "ts",
    )
    paired = conv.join(touch, "user_id").filter(
        (F.col("ts") <= F.col("conv_ts"))
        & (
            F.col("ts")
            > F.col("conv_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS")
        )
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "touch_id")
    wn = Window.partitionBy("conv_id")
    ranked = paired.select(
        "conv_id",
        "channel",
        F.row_number().over(w).alias("rn_asc"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(
            (F.col("rn_asc") == 1) | (F.col("rn_asc") == F.col("n")),
            F.lit(0.4),
        )
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        ranked.select("conv_id", "channel", credit.alias("credit"))
        .groupBy("channel")
        .agg(
            F.round(F.sum("credit"), 4).alias("total_credit"),
            F.count(F.lit(1)).alias("n_touches"),
            F.count_distinct("conv_id").alias("n_conversions"),
        )
    )
