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


@register(
    "growth_accounting_daily",
    """
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    seq AS (
      SELECT user_id, day,
             min(day)  OVER (PARTITION BY user_id) AS first_day,
             lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
      FROM active
    ),
    maxd AS (SELECT max(day) AS md FROM active),
    statuses AS (
      SELECT day,
             CASE WHEN day = first_day THEN 1 ELSE 0 END AS is_new,
             CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END AS is_retained,
             CASE WHEN day > first_day
                   AND (prev_day IS NULL OR prev_day < day - 1)
                  THEN 1 ELSE 0 END AS is_resurrected
      FROM seq
    ),
    churn AS (
      SELECT day + 1 AS day, count(*) AS n_churned
      FROM seq, maxd
      WHERE (next_day IS NULL OR next_day > day + 1) AND day < md
      GROUP BY day + 1
    ),
    daily AS (
      SELECT day, count(*) AS n_active,
             CAST(sum(is_new) AS BIGINT) AS n_new,
             CAST(sum(is_retained) AS BIGINT) AS n_retained,
             CAST(sum(is_resurrected) AS BIGINT) AS n_resurrected
      FROM statuses GROUP BY day
    )
    SELECT d.day, d.n_active, d.n_new, d.n_retained, d.n_resurrected,
           COALESCE(c.n_churned, 0) AS n_churned
    FROM daily d LEFT JOIN churn c ON d.day = c.day
    """,
    survey_rows="W2,A2,F2,growth",
)
def growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING (the new / retained / resurrected / churned
    decomposition of daily actives): for every day, how many active
    users are brand new, continuing from yesterday, returning after a
    gap — and how many of yesterday's actives disappeared (churn is
    attributed to the first inactive day). The identity
    active(d) = new + retained + resurrected and
    active(d) - active(d-1) = new + resurrected - churned(d)
    is what product dashboards call the growth accounting equation;
    `cohort_retention` shows decay per signup cohort, this shows the
    daily flux balance.

    One distinct (user, day) reduction, then ONE user-partitioned
    window pass computes first/prev/next simultaneously; churn is a
    one-day shift re-aggregation and the global max day rides a 1-row
    broadcast. Scale: everything after the distinct operates on
    |users| x |active days| rows, orders of magnitude below the raw
    stream; the user_id shuffle is the only data-sized exchange."""
    e = load_table(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    seq = active.select(
        "user_id",
        "day",
        F.min("day").over(Window.partitionBy("user_id")).alias("first_day"),
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    maxd = active.agg(F.max("day").alias("md"))
    daily = seq.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        # when/otherwise, not bool-cast: prev_day is NULL on each
        # user's first row, and sum over an all-NULL comparison column
        # is NULL where the oracle's CASE yields 0
        F.sum(
            F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
        ).alias("n_new"),
        F.sum(
            F.when(F.col("prev_day") == F.date_sub("day", 1), 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                (F.col("day") > F.col("first_day"))
                & (
                    F.col("prev_day").isNull()
                    | (F.col("prev_day") < F.date_sub("day", 1))
                ),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    churn = (
        seq.join(F.broadcast(maxd))
        .filter(
            (
                F.col("next_day").isNull()
                | (F.col("next_day") > F.date_add("day", 1))
            )
            & (F.col("day") < F.col("md"))
        )
        .groupBy(F.date_add("day", 1).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return daily.join(churn, "day", "left").select(
        "day",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
    )


@register(
    "pattern_vshape_dips",
    """
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             lag(value)  OVER w AS prev_v,
             lead(value) OVER w AS next_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    dips AS (
      SELECT user_id, event_id, value,
             prev_v - value AS drop_depth,
             next_v - value AS recovery
      FROM seq
      WHERE prev_v > value AND next_v > value
        AND prev_v - value >= 0.2 * prev_v
    )
    SELECT user_id,
           count(*) AS n_dips,
           round(max(drop_depth), 4) AS deepest_drop,
           round(CAST(sum(CAST(recovery AS DECIMAL(28,12))) AS DOUBLE)
                 / count(*), 6) AS avg_recovery
    FROM dips GROUP BY user_id
    """,
    survey_rows="W2,A1,pattern",
)
def pattern_vshape_dips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern detection (the MATCH_RECOGNIZE shape, expressed with
    windows): find V-SHAPED DIPS in each user's value series — a point
    strictly below both neighbors where the drop is at least 20% of the
    preceding value — and summarize dip count, deepest drop, and average
    recovery per user. The lag/lead contiguity encoding is how bounded
    row patterns (PREV/NEXT guards) compile to window functions when the
    engine lacks MATCH_RECOGNIZE; unbounded patterns (A B+ C) would use
    the sessionize-style flag+cumsum trick instead.

    One user_id shuffle; pattern guards are codegen'd comparisons. The
    20%-relative threshold keeps the boolean robust to last-ulp
    differences (continuous values never sit exactly on the cut)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
    )
    dips = seq.filter(
        (F.col("prev_v") > F.col("value"))
        & (F.col("next_v") > F.col("value"))
        & (F.col("prev_v") - F.col("value") >= 0.2 * F.col("prev_v"))
    ).select(
        "user_id",
        (F.col("prev_v") - F.col("value")).alias("drop_depth"),
        (F.col("next_v") - F.col("value")).alias("recovery"),
    )
    # Rounding-hazard note (measured at sf0.1): events.value is
    # 2dp-QUANTIZED, so dip sums are exact 2dp decimals and avg =
    # sum/16 landed exactly on a 4dp half boundary (23.92375), where
    # Spark (decimal-string HALF_UP) and DuckDB (binary-correct) round
    # apart. Two defenses: the decimal cast inside the sum makes the
    # accumulation exact and order-free (both engines divide the
    # identical double), and the output rounds at 6dp — FINER than the
    # quantization can reach for power-of-two/five counts, so the
    # decimal expansion terminates before the rounding digit instead of
    # tying on it. Rounding coarser than your data's quantum is how
    # discrete data manufactures ties.
    return dips.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_dips"),
        F.round(F.max("drop_depth"), 4).alias("deepest_drop"),
        F.round(
            F.sum(F.col("recovery").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_recovery"),
    )
