"""Time-interval (windowed range) join over the event stream (SURVEY.md
§2 J5/J6 family — new row J8; streaming twin in streaming/events.py).

"How many clicks did this user make in the hour before each purchase?"
is the canonical stream-stream interval join. A naive implementation is
`JOIN ON user_id = user_id AND c.ts BETWEEN p.ts - 1h AND p.ts` — Spark
plans that as a hash join on user_id with a residual range filter, which
is fine until one user has millions of events; then the per-key cross
product explodes (the same quadratic fan-out the as-of join avoids).

The scalable shape used here is **time binning** (the same trick range-
join optimizers apply): bucket both sides into fixed bins the width of
the join window, have each probe row visit exactly the 2 candidate bins
that can contain matches, and equi-join on (user_id, bin) with the exact
interval as a residual predicate. Fan-out is bounded by bin occupancy,
not by per-user history length; the join key gains entropy (user × hour),
which also dissolves hot-user skew. One shuffle per side, then a partial-
aggregable count — the plan survives a 100×-wider events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table

_WINDOW_US = 3_600_000_000  # 1 hour in microseconds == the bin width


@register(
    "interval_join_clicks_before_purchase",
    """
    SELECT p.event_id                          AS purchase_id,
           p.user_id,
           epoch_us(p.ts)                      AS purchase_ts_us,
           count(c.event_id)                   AS n_clicks_1h,
           coalesce(max(epoch_us(c.ts)), -1)   AS last_click_us
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
    WHERE p.event_type = 'purchase'
    GROUP BY 1, 2, 3
    """,
    survey_rows="J8,ST9,A1",
)
def interval_join_clicks_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """J8: per purchase, the count and latest timestamp of same-user
    clicks within the preceding hour (inclusive both ends), purchases
    with no clicks kept with count 0.

    Bin arithmetic: a click in [p.ts - 1h, p.ts] lives in bin(p.ts) or
    bin(p.ts) - 1 when bins are exactly 1h wide, so each purchase is
    exploded to those two (user_id, bin) keys — a fixed 2× fan-out on the
    (small) probe side, never a per-user cross product. All integer µs
    arithmetic (`div`), immune to FP boundary truncation."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("c_us"),
        F.expr(f"unix_micros(ts) div {_WINDOW_US}").alias("bin"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("p_us"),
        F.expr(f"unix_micros(ts) div {_WINDOW_US}").alias("p_bin"),
    )
    # each purchase probes its own bin and the previous one
    probes = purchases.withColumn(
        "bin", F.explode(F.array(F.col("p_bin") - 1, F.col("p_bin")))
    ).drop("p_bin")
    matched = probes.join(clicks, on=["user_id", "bin"], how="inner").filter(
        (F.col("c_us") >= F.col("p_us") - F.lit(_WINDOW_US))
        & (F.col("c_us") <= F.col("p_us"))
    )
    counts = matched.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks_1h"),
        F.max("c_us").alias("last_click_us"),
    )
    return (
        purchases.drop("p_bin")
        .join(counts, on="purchase_id", how="left")
        .select(
            "purchase_id",
            "user_id",
            F.col("p_us").alias("purchase_ts_us"),
            F.coalesce(F.col("n_clicks_1h"), F.lit(0)).alias("n_clicks_1h"),
            F.coalesce(F.col("last_click_us"), F.lit(-1)).alias("last_click_us"),
        )
    )


@register(
    "interval_join_pairs",
    """
    SELECT p.event_id       AS purchase_id,
           c.event_id       AS click_id,
           p.user_id,
           epoch_us(p.ts)   AS purchase_ts_us,
           epoch_us(c.ts)   AS click_ts_us
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    survey_rows="J8,ST9",
)
def interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/ST9: the raw (purchase, click) pairs inside the 1-hour window —
    exactly what the streaming stream-stream join emits in append mode
    (streaming/events.py clicks_before_purchases_stream); the batch twin
    here is the parity oracle for that test. Same binned-join shape as
    interval_join_clicks_before_purchase, without the final rollup."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_ts_us"),
        F.expr(f"unix_micros(ts) div {_WINDOW_US}").alias("bin"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.expr(f"unix_micros(ts) div {_WINDOW_US}").alias("p_bin"),
    )
    probes = purchases.withColumn(
        "bin", F.explode(F.array(F.col("p_bin") - 1, F.col("p_bin")))
    ).drop("p_bin")
    return (
        probes.join(clicks, on=["user_id", "bin"], how="inner")
        .filter(
            (F.col("click_ts_us") >= F.col("purchase_ts_us") - F.lit(_WINDOW_US))
            & (F.col("click_ts_us") <= F.col("purchase_ts_us"))
        )
        .select(
            "purchase_id", "click_id", "user_id", "purchase_ts_us", "click_ts_us"
        )
    )


@register(
    "interval_join_pairs_outer",
    """
    SELECT p.event_id                       AS purchase_id,
           coalesce(c.event_id, -1)         AS click_id,
           p.user_id,
           epoch_us(p.ts)                   AS purchase_ts_us,
           coalesce(epoch_us(c.ts), -1)     AS click_ts_us
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
    WHERE p.event_type = 'purchase'
    """,
    survey_rows="J8,ST9,J2",
)
def interval_join_pairs_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/ST9 left-outer: every purchase, paired with each same-user
    click in the preceding hour OR null-extended (click_id = -1) when
    none exists — the batch twin of the watermarked LEFT OUTER
    stream-stream join (streaming/events.py purchases_with_recent_click
    how="left_outer"), where the null-extended rows are exactly what the
    streaming engine emits on watermark expiry.

    Shape: the binned inner join (2-bin explode on the probe side, never
    a per-user cross product) produces the matched pairs; unmatched
    purchases are recovered with a LEFT ANTI join on purchase_id against
    the matched set — both legs share the purchase scan, and the anti
    join shuffles only purchase ids. A binned LEFT join instead would
    emit one null row PER PROBE BIN (2x duplicates); inner+anti is the
    correct and cheaper decomposition at any scale."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_ts_us"),
        F.expr(f"unix_micros(ts) div {_WINDOW_US}").alias("bin"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.expr(f"unix_micros(ts) div {_WINDOW_US}").alias("p_bin"),
    )
    probes = purchases.withColumn(
        "bin", F.explode(F.array(F.col("p_bin") - 1, F.col("p_bin")))
    ).drop("p_bin")
    matched = (
        probes.join(clicks, on=["user_id", "bin"], how="inner")
        .filter(
            (F.col("click_ts_us") >= F.col("purchase_ts_us") - F.lit(_WINDOW_US))
            & (F.col("click_ts_us") <= F.col("purchase_ts_us"))
        )
        .select(
            "purchase_id", "click_id", "user_id", "purchase_ts_us", "click_ts_us"
        )
    )
    unmatched = (
        purchases.join(
            matched.select("purchase_id"), on="purchase_id", how="left_anti"
        )
        .select(
            "purchase_id",
            F.lit(-1).cast("long").alias("click_id"),
            "user_id",
            "purchase_ts_us",
            F.lit(-1).cast("long").alias("click_ts_us"),
        )
    )
    return matched.unionByName(unmatched)


@register(
    "interval_join_pairs_full_outer",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS cid, user_id, ts FROM events
      WHERE event_type = 'click'
    )
    SELECT coalesce(p.pid, -1)                 AS purchase_id,
           coalesce(c.cid, -1)                 AS click_id,
           coalesce(p.user_id, c.user_id)      AS user_id,
           coalesce(epoch_us(p.ts), -1)        AS purchase_ts_us,
           coalesce(epoch_us(c.ts), -1)        AS click_ts_us
    FROM p FULL JOIN c
      ON c.user_id = p.user_id
     AND epoch_us(c.ts)
         BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
    """,
    survey_rows="J8,ST9,J2",
)
def interval_join_pairs_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/ST9 FULL outer: matched (purchase, click-in-preceding-hour)
    pairs, PLUS null-extended unmatched purchases (click_id = -1), PLUS
    null-extended unmatched clicks — clicks that never preceded a
    purchase within the hour (purchase_id = -1). The symmetric
    completion of `interval_join_pairs_outer`, and the batch twin of
    the watermarked full-outer stream-stream join
    (streaming/events.py purchases_clicks_full_outer), where BOTH
    sides' unmatched rows emit on watermark expiry.

    Shape: the binned inner join produces matched pairs once; each
    side's unmatched remainder is recovered with its own LEFT ANTI join
    against the matched ids (anti joins shuffle only ids). A binned
    FULL join directly would both duplicate nulls per probe bin and
    null-extend bin-phantom rows — inner + two antis is the correct
    decomposition, and each leg stays a hash join."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_ts_us"),
        F.expr(f"unix_micros(ts) div {_WINDOW_US}").alias("bin"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.expr(f"unix_micros(ts) div {_WINDOW_US}").alias("p_bin"),
    )
    probes = purchases.withColumn(
        "bin", F.explode(F.array(F.col("p_bin") - 1, F.col("p_bin")))
    ).drop("p_bin")
    matched = (
        probes.join(clicks, on=["user_id", "bin"], how="inner")
        .filter(
            (F.col("click_ts_us") >= F.col("purchase_ts_us") - F.lit(_WINDOW_US))
            & (F.col("click_ts_us") <= F.col("purchase_ts_us"))
        )
        .select(
            "purchase_id", "click_id", "user_id", "purchase_ts_us", "click_ts_us"
        )
    )
    unmatched_p = purchases.join(
        matched.select("purchase_id"), on="purchase_id", how="left_anti"
    ).select(
        "purchase_id",
        F.lit(-1).cast("long").alias("click_id"),
        "user_id",
        "purchase_ts_us",
        F.lit(-1).cast("long").alias("click_ts_us"),
    )
    unmatched_c = clicks.join(
        matched.select("click_id"), on="click_id", how="left_anti"
    ).select(
        F.lit(-1).cast("long").alias("purchase_id"),
        "click_id",
        "user_id",
        F.lit(-1).cast("long").alias("purchase_ts_us"),
        "click_ts_us",
    )
    return matched.unionByName(unmatched_p).unionByName(unmatched_c)
