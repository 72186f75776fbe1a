"""Time-series analytics over the events stream: rolling-statistic
anomaly flags, exponentially-weighted moving averages, and
multi-resolution rollup reuse (the continuous-aggregate shape).

Scale notes:
- every window here is per-user (or per-type) ORDER BY ts frames — one
  shuffle on the partition key, then sequential frame evaluation inside
  each partition; no self-joins, no driver state;
- the hour→day rollup derives the coarse resolution from the fine one
  (24 rows/day instead of re-scanning raw events) — at 100 TB the hourly
  table is 4-5 orders of magnitude smaller than the raw stream, which is
  exactly why warehouses materialize the finest rollup and re-aggregate
  upward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table

# EWMA smoothing factor; the fold below is the textbook recursive form
# s_i = (1-ALPHA)*s_{i-1} + ALPHA*x_i seeded with the frame's first value.
EWMA_ALPHA = 0.3


@register(
    "rolling_zscore_anomaly",
    """
    WITH w AS (
      SELECT event_id, user_id, value,
             avg(value)         OVER f AS mu,
             stddev_samp(value) OVER f AS sigma,
             count(*)           OVER f AS n_window
      FROM events
      WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value, n_window,
           value > mu + 3 * sigma OR value < mu - 3 * sigma AS is_anomaly
    FROM w
    WHERE n_window >= 12 AND sigma > 0
      AND (value > mu + 3 * sigma OR value < mu - 3 * sigma)
    """,
    survey_rows="ST10,W3,stats",
)
def rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event compared against the
    mean/stddev of its user's previous 24 events (the trailing frame
    EXCLUDES the current row — an anomaly must not inflate its own
    baseline). Rows with under 12 prior observations are unscored (cold
    start). Emits only the anomalies: bounded output, and the boolean
    3-sigma cut is robust to the engines' last-ulp stddev differences
    (values sit far from the threshold on continuous data)."""
    e = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, -1)
    )
    mu = F.avg("value").over(f)
    sigma = F.stddev_samp("value").over(f)
    n_window = F.count(F.lit(1)).over(f)
    flag = (F.col("value") > mu + 3 * sigma) | (
        F.col("value") < mu - 3 * sigma
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "value",
            n_window.alias("n_window"),
            mu.alias("_mu"),
            sigma.alias("_sigma"),
            flag.alias("is_anomaly"),
        )
        .filter(
            (F.col("n_window") >= 12)
            & (F.col("_sigma") > 0)
            & F.col("is_anomaly")
        )
        .drop("_mu", "_sigma")
    )


@register(
    "ewma_user_value",
    f"""
    WITH w AS (
      SELECT event_id, user_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vs
      FROM events
    )
    SELECT event_id, user_id, value,
           list_reduce(vs, (acc, x) -> acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA}) AS ewma
    FROM w WHERE user_id < 20
    """,
    survey_rows="ST11,W3,F5",
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA over each user's last 10 values — the recursive smoother
    s = (1-α)s + αx, which plain window aggregates cannot express
    (the weight of each row depends on its distance from the current
    row). Expressed as collect-over-frame + a left fold seeded with the
    frame's first element: the fold order is the frame order in both
    engines, so the IEEE result is bit-identical and the oracle hash is
    exact — no rounding needed.

    Scale: the frame is 10 doubles per row (bounded state); the HOF fold
    is interpreted but O(frame) per row. For unbounded EWMA (since start
    of stream) the same recurrence runs in applyInPandasWithState —
    this bounded-frame form is the batch-replayable twin."""
    e = load_table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    vs = F.collect_list("value").over(frame)
    ewma = F.aggregate(
        F.slice(F.col("_vs"), 2, 9),
        F.element_at(F.col("_vs"), 1),
        lambda acc, x: acc * F.lit(1 - EWMA_ALPHA) + x * F.lit(EWMA_ALPHA),
    )
    return (
        e.select("event_id", "user_id", "value", vs.alias("_vs"))
        .filter(F.col("user_id") < 20)
        .select("event_id", "user_id", "value", ewma.alias("ewma"))
    )


@register(
    "rollup_hour_to_day",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n, sum(value) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(date_trunc('day', h) AS DATE) AS day, event_type,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(sum(sv), 4) AS total_value,
           count(*) AS n_hours
    FROM hourly GROUP BY 1, 2
    """,
    survey_rows="ST12,A1,F2",
)
def rollup_hour_to_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup reuse: daily aggregates derived FROM the
    hourly rollup, not from raw events — the continuous-aggregate /
    hypertable pattern. The day re-aggregation reads |hours|×|types| rows
    (~3.6k here; at 100 TB, ~10^5 instead of 10^12). Count/sum compose
    exactly across levels; avg would be reconstructed as sum/count — the
    classic algebraic-vs-holistic aggregate split (medians can't chain)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    return hourly.groupBy(
        F.date_trunc("day", "h").cast("date").alias("day"), "event_type"
    ).agg(
        F.sum("n").alias("n_events"),
        F.round(F.sum("sv"), 4).alias("total_value"),
        F.count(F.lit(1)).alias("n_hours"),
    )


@register(
    "ewma_running_final",
    f"""
    SELECT user_id,
           count(*) AS n_events,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA})
             AS ewma_final
    FROM events GROUP BY user_id
    """,
    survey_rows="ST13,ST11,A7",
)
def ewma_running_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded EWMA per user — the since-start-of-stream smoother,
    folded over each user's FULL ordered history. One groupBy shuffle;
    per-group memory is the user's value list, fine for bounded per-key
    history. At 100 TB with unbounded keys this exact recurrence runs
    incrementally in `streaming.stateful.running_user_ewma` (state = one
    (s, n) pair per user, O(keys) memory, no list) — the parity test in
    tests/test_streaming.py pins stateful == this fold, and the oracle
    pins this fold == DuckDB's list_reduce. Same left fold, same seed,
    bit-identical IEEE — raw-double hash match."""
    e = load_table(spark, sf_dir, "events")
    rows = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("rs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    vals = F.transform(F.col("rs"), lambda r: r.getField("value"))
    ewma = F.aggregate(
        F.expr(
            "slice(transform(rs, r -> r.value), 2, "
            "greatest(size(rs) - 1, 0))"
        ),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1 - EWMA_ALPHA) + x * F.lit(EWMA_ALPHA),
    )
    return rows.select("user_id", "n_events", ewma.alias("ewma_final"))


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The maintained aggregate: (hour, event_type) -> (n, sv). Partial
    counts/sums are ALGEBRAIC — they merge by addition — which is what
    makes the rollup incrementally maintainable (see
    apply_rollup_increment). Holistic aggregates (median, distinct
    count) don't merge this way and would need sketches (HLL, KLL)."""
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))


def apply_rollup_increment(rollup: DataFrame, new_events: DataFrame) -> DataFrame:
    """Incremental view maintenance for the hourly rollup: fold a new
    micro-batch of raw events into an existing materialized rollup
    WITHOUT re-reading history — the continuous-aggregate maintenance
    step (TimescaleDB/Materialize shape) that pairs with
    rollup_hour_to_day's read path.

    Cost shape at 100 TB: the batch aggregates to its own |batch-hours|
    partials (two-phase, map-side combined), then merges with the
    existing rollup by key — a shuffle over |hours|x|types| rows, never
    the raw history. Exactness: addition of counts/sums is exact for
    counts and IEEE-associative-order-dependent for float sums, so the
    parity test pins count equality exactly and sums to 1e-9.

    In production the merge writes back via pipelines.upsert_by_partition
    (only batch-touched hour-partitions rewrite) or CDC MERGE; here the
    pure transformation is returned so batch == recompute is provable."""
    inc = hourly_rollup(new_events)
    return (
        rollup.unionByName(inc)
        .groupBy("h", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )


@register(
    "rollup_incremental_maintenance",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
           count(*) AS n, round(sum(value), 4) AS sv
    FROM events GROUP BY 1, 2
    """,
    survey_rows="ST12,ST14,A1",
)
def rollup_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVM path proven against the recompute oracle: history (days
    1-20) is rolled up first, then the remaining days arrive as a batch
    folded in via apply_rollup_increment. The result must equal the
    plain one-shot rollup — the oracle IS that recompute, so the hash
    match certifies that partial-aggregate merging loses nothing. Sums
    round 4dp (merge order differs from the oracle's scan order)."""
    e = load_table(spark, sf_dir, "events")
    hist = e.filter(F.dayofmonth("ts") <= 20)
    batch = e.filter(F.dayofmonth("ts") > 20)
    merged = apply_rollup_increment(hourly_rollup(hist), batch)
    return merged.select(
        "h", "event_type", "n", F.round("sv", 4).alias("sv")
    )
