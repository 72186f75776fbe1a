"""Streaming-shaped operators over the events table (SURVEY.md §2.9).

Batch-first, stream-ready: each op here is the *batch* semantics the
oracle can check; the identical transformations run under readStream via
``novelti_dingo_spark.streaming`` (ST1/ST2 use the same `F.window` calls,
ST3's stream form swaps the lag+cumsum idiom for `F.session_window`).

Time canonicalization: every output timestamp leaves as an epoch-seconds
or epoch-µs BIGINT, so the parquet-ns (DuckDB) vs µs (Spark) reader
difference can never reach the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table


@register(
    "tumbling_1h_agg",
    """
    SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket_start,
           event_type,
           count(*)              AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    survey_rows="ST1,A1",
)
def tumbling_1h_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: tumbling 1h window × event_type. `F.window` works identically
    in batch and under readStream+watermark (epoch-aligned buckets)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_1h_15m_agg",
    """
    SELECT (epoch_us(ts) // 900000000) * 900 - k.k * 900 AS window_start,
           count(*)              AS n_events,
           round(sum(value), 2)  AS sum_value
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
    GROUP BY 1
    """,
    survey_rows="ST2,A1",
)
def sliding_1h_15m_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: sliding window (1h length, 15min slide) via the PANE
    optimization: aggregate once per 15-min pane (map-side combined, one
    row per pane), then explode each pane into the 4 windows containing
    it and combine partials. The naive `F.window(ts, '1h', '15m')`
    replicates every EVENT 4x before the shuffle; panes shuffle
    time_range/900 rows regardless of event volume — the difference
    between 4x100TB and a few MB on the wire.

    Float note: sum_value is summed per-pane then across 4 panes — both
    engines' 2dp rounding happens after the same two-level tree, and the
    oracle mirrors the event-level sum; 2dp absorbs the ordering drift."""
    e = load_table(spark, sf_dir, "events")
    panes = e.groupBy(
        # integer `div`, not float `/`+cast: FP rounding could shift a
        # timestamp exactly on a pane boundary into the previous pane
        (F.expr("unix_micros(ts) div 900000000") * 900).alias("pane_start")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("ps"),
    )
    exploded = panes.select(
        F.explode(
            F.array(*[F.col("pane_start") - 900 * k for k in range(4)])
        ).alias("window_start"),
        "pn",
        "ps",
    )
    return exploded.groupBy("window_start").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("ps"), 2).alias("sum_value"),
    )


@register(
    "sessionize_30min",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*)                       AS n_events,
           min(epoch_us(ts))              AS session_start_us,
           max(epoch_us(ts))              AS session_end_us,
           round(sum(value), 2)           AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
    survey_rows="ST3,W2,W3,A1",
)
def sessionize_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3: sessionization with a 30-minute inactivity gap — the classic
    lag + cumulative-sum idiom (one shuffle on user_id; both window passes
    and the final agg reuse the same partitioning, so Catalyst plans a
    single Exchange). Streaming form: `F.session_window(ts, '30 minutes')`
    in novelti_dingo_spark.streaming."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = 30 * 60 * 1_000_000
    flagged = e.select(
        "user_id",
        "ts",
        "value",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = flagged.select(
        "user_id", "ts", "value", F.sum("new_session").over(wc).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_end_us"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "watermark_late_drop",
    """
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 DAY
    """,
    survey_rows="ST4",
)
def watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 batch analogue: drop rows older than (max event time - horizon),
    exactly the filter a 1-day watermark applies. The scalar max is a
    1-row broadcast cross join — no data shuffle. Streaming form:
    `withWatermark('ts', '1 day')` in novelti_dingo_spark.streaming."""
    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(
        (F.max("ts") - F.expr("INTERVAL 1 DAY")).alias("_cutoff")
    )
    return (
        e.crossJoin(F.broadcast(horizon))
        .filter(F.col("ts") >= F.col("_cutoff"))
        .select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
    )


@register(
    "stream_dedup_first",
    """
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
    survey_rows="ST5,W1",
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 batch analogue of dropDuplicatesWithinWatermark: keep the first
    event per (user_id, event_type), deterministically (ts, event_id).
    Streaming form keeps whichever arrives first within the watermark."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
    )


def topk_struct_agg(k: int):
    """Aggregation expression: the top-k rows of a group by (value DESC,
    event_id ASC), as a sorted array of structs. An ordinary aggregate
    expression, so the SAME code runs in a batch groupBy and in a
    streaming withWatermark groupBy — which is what makes the streaming
    top-k twin (streaming.events.windowed_topk) provably identical to
    the oracle-checked batch query below.

    The sort key embeds the descending order as a negated leading field
    (sort_array is ascending over struct fields in order), so ties break
    on event_id ASC — the same total order as the row_number oracle."""
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                (-F.col("value")).alias("_nv"),
                F.col("event_id").alias("event_id"),
                F.col("value").alias("value"),
            )
        )
    )
    return F.slice(arr, 1, k)


@register(
    "windowed_topk_1h",
    """
    SELECT bucket_start, event_type, event_id, value, rn FROM (
      SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket_start,
             event_type, event_id, value,
             row_number() OVER (PARTITION BY epoch_us(ts) // 3600000000, event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
    WHERE rn <= 3
    """,
    survey_rows="W4,ST1",
)
def windowed_topk_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k (the streaming-ready W4): top-3 events by value per
    (1h tumbling window × event_type). Built from `topk_struct_agg` — an
    aggregate, NOT a rank window — because streaming cannot run window
    functions: the same expression under withWatermark is the streaming
    twin (streaming.events.windowed_topk; parity test asserts equality
    and watermark finality).

    Scale: one shuffle on the (window, event_type) group key, partial
    aggregation applies (collect_list partials merge), and state in the
    streaming form is bounded by the watermark horizon — only OPEN
    windows hold their rows; closed windows emit their k rows and drop
    state. The per-open-group buffer is O(rows in window); if a single
    window×type group is huge, pre-reduce with a per-partition top-k
    (two-level agg) before the group merge — for pure batch, the
    WindowGroupLimit row_number idiom (window_topk_per_user) is the
    equally-correct alternative."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        topk_struct_agg(3).alias("top")
    )
    return (
        g.select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            F.posexplode("top").alias("pos", "t"),
        )
        .select(
            "bucket_start",
            "event_type",
            F.col("t.event_id").alias("event_id"),
            F.col("t.value").alias("value"),
            (F.col("pos") + 1).cast("long").alias("rn"),
        )
    )


@register(
    "running_user_totals",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS event_seq
    FROM events
    """,
    survey_rows="ST6,W3",
)
def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: per-user incremental totals — batch form of an update-mode
    streaming aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("event_seq"),
    )


@register(
    "json_props_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*)              AS n,
           round(avg(value), 6)  AS avg_value
    FROM events
    GROUP BY 1
    """,
    survey_rows="F6,A1",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: JSON extraction from the props column feeding an agg.
    `get_json_object` is JVM-side (no Python); at scale prefer parsing
    once via from_json into a struct column rather than repeated path
    extraction."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy((k % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@register(
    "interp_linear_hourly",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, round(avg(value), 6) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    rng AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
    spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM rng),
    j AS (SELECT spine.h, v FROM spine LEFT JOIN hourly USING (h)),
    f AS (
      SELECT h, v,
        last_value(v IGNORE NULLS) OVER wp AS pv,
        first_value(v IGNORE NULLS) OVER wn AS nv,
        last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER wp AS ph,
        first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER wn AS nh
      FROM j
      WINDOW wp AS (ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT epoch_us(h) AS hour_us,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                     * (CAST(epoch_us(h) - epoch_us(ph) AS DOUBLE)
                        / CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE))
           END AS value_interp,
           v IS NOT NULL AS observed
    FROM f
    """,
    survey_rows="ST8,W3,F2",
)
def interp_linear_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation: hourly purchase averages on a
    dense hour spine, gaps filled by interpolating between the nearest
    observed hours (edges extend the nearest value). The idiom is
    spine → left join → last/first IGNORE NULLS both directions →
    weighted blend; everything after the per-hour agg operates on
    |hours| rows, not |events|, so the unpartitioned window is bounded
    by the calendar, never the data (for per-key series, partition the
    windows by the key). The hourly avg is rounded before interpolation
    so both engines blend identical inputs; the blend itself is
    deterministic IEEE arithmetic (µs deltas are exact integers)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.avg("value"), 6).alias("v")
    )
    rng = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = rng.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    j = spine.join(hourly, "h", "left")
    wp = Window.orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.orderBy("h").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    known_h = F.when(F.col("v").isNotNull(), F.col("h"))
    f = j.select(
        "h",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.last(known_h, ignorenulls=True).over(wp).alias("ph"),
        F.first(known_h, ignorenulls=True).over(wn).alias("nh"),
    )
    frac = (
        (F.unix_micros("h") - F.unix_micros("ph")).cast("double")
        / (F.unix_micros("nh") - F.unix_micros("ph")).cast("double")
    )
    return f.select(
        F.unix_micros("h").alias("hour_us"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("value_interp"),
        F.col("v").isNotNull().alias("observed"),
    )


@register(
    "session_window_30min",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(epoch_us(ts))    AS session_start_us,
           max(epoch_us(ts))    AS session_end_us,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    survey_rows="ST3,A1,F2",
)
def session_window_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 via the NATIVE `F.session_window` primitive in batch — the
    same call that runs under readStream with a watermark. The oracle is
    the manual lag+cumsum sessionization SQL, so the driver hash-match
    certifies Spark's gap-merge semantics ≡ the classic idiom ≡ DuckDB,
    closing the loop between the batch idiom (`sessionize_30min`), the
    streaming primitive, and an independent engine.

    Shape: one shuffle on the session_window grouping; merging
    overlapping windows is the aggregation itself (no window-function
    pass at all) — at scale this is the cheaper sessionizer when you
    need per-session AGGREGATES but not per-event session ids."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.max(F.unix_micros("ts")).alias("session_end_us"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_distinct_users_pane",
    """
    SELECT (epoch_us(ts) // 900000000) * 900 - k.k * 900 AS window_start,
           count(DISTINCT user_id) AS n_exact_users,
           TRUE AS approx_ok
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
    GROUP BY 1
    """,
    survey_rows="ST2,A3,A2",
)
def sliding_distinct_users_pane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window DISTINCT users (1h window, 15min slide) via pane
    SKETCHES: sum/count pane-optimize trivially (sliding_1h_15m_agg),
    but distinct does not — a user active in two panes of the same
    window must count once. The mergeable-sketch bridge: each 15-min
    pane keeps an HLL sketch of its users (one map-side-combined pass),
    each 1-hour window UNIONS its 4 pane sketches — overlap dedups
    inside the sketch, and the event stream is still scanned exactly
    once. The naive form replicates every event 4x before a
    count-distinct shuffle; panes shuffle |panes| sketches (~KB each)
    regardless of event volume.

    Exact+tolerance-witness output (family: hll_sketch_rollup,
    segtree_distinct_users): n_exact_users is the hashable exact
    per-window count — also the DuckDB oracle — and `approx_ok` asserts
    the pane-union estimate lands within 15% of it, catching a broken
    union while keeping the gate deterministic. At 100 TB only the
    exact witness leg (kept here for verification) pays the 4x
    replication; the production path is the sketch leg alone."""
    e = load_table(spark, sf_dir, "events")
    pane = (F.expr("unix_micros(ts) div 900000000") * 900).alias(
        "pane_start"
    )
    panes = e.groupBy(pane).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    windows = (
        panes.select(
            F.explode(
                F.array(*[F.col("pane_start") - 900 * k for k in range(4)])
            ).alias("window_start"),
            "sk",
        )
        .groupBy("window_start")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_approx")
        )
    )
    exact = (
        e.select(
            F.explode(
                F.array(
                    *[
                        F.expr("unix_micros(ts) div 900000000") * 900
                        - 900 * k
                        for k in range(4)
                    ]
                )
            ).alias("window_start"),
            "user_id",
        )
        .groupBy("window_start")
        .agg(F.countDistinct("user_id").alias("n_exact_users"))
    )
    return exact.join(windows, "window_start").select(
        "window_start",
        "n_exact_users",
        (
            F.abs(F.col("_approx") - F.col("n_exact_users"))
            <= 0.15 * F.col("n_exact_users")
        ).alias("approx_ok"),
    )


@register(
    "max_concurrent_sessions",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, sum(new_session) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS sid,
             ts
      FROM flagged
    ), bounds AS (
      SELECT user_id, sid,
             epoch_us(min(ts)) AS s_us,
             epoch_us(max(ts)) + 1800000000 AS e_us
      FROM sess GROUP BY user_id, sid
    ), deltas AS (
      SELECT s_us AS t_us, 1 AS d FROM bounds
      UNION ALL
      SELECT e_us, -1 FROM bounds
    ), sweep AS (
      SELECT t_us, sum(sum(d)) OVER (ORDER BY t_us) AS live
      FROM deltas GROUP BY t_us
    ), daily AS (
      SELECT CAST(t_us // 86400000000 AS BIGINT) AS day,
             CAST(max(live) AS BIGINT) AS peak_concurrent
      FROM sweep GROUP BY 1
    )
    SELECT day, peak_concurrent FROM daily
    """,
    survey_rows="ST3,W3,A1,U1",
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the SWEEP-LINE idiom: each
    session contributes +1 at its start and -1 at its end (end = last
    event + gap, matching the sessionizer's closure rule), and the
    running sum of deltas ordered by time IS the live-session count;
    its daily max is the capacity-planning number (peak concurrency
    drives connection pools, autoscaling floors, license sizing).

    Shape: sessions come from the standard lag+cumsum sessionizer (one
    user_id shuffle); the sweep collapses to |2 x sessions| delta rows,
    aggregated per timestamp and then run through ONE ordered window.
    That global ordered sum is over the POST-AGGREGATION delta spine —
    bounded by distinct session boundaries, ~2 x |sessions| rows, the
    documented safe home for an unpartitioned window (same class as
    cumulative_unique_users); at extreme scale the standard refinement
    range-partitions the sweep and adds broadcast per-partition offsets
    (rank.py's recipe). Boundary convention: a session ending exactly
    when another starts at t counts both live at t (delta order sums
    same-instant +1s before applying the max — both engines aggregate
    deltas per timestamp first, so the convention is identical)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1800 * 1_000_000
    new_s = (
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us)
        | F.lag("ts").over(w).isNull()
    ).cast("int")
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = e.select(
        "user_id", "ts", F.sum(new_s).over(wc).alias("sid")
    )
    bounds = sess.groupBy("user_id", "sid").agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        (F.unix_micros(F.max("ts")) + gap_us).alias("e_us"),
    )
    deltas = bounds.select(
        F.col("s_us").alias("t_us"), F.lit(1).alias("d")
    ).unionAll(
        bounds.select(F.col("e_us").alias("t_us"), F.lit(-1).alias("d"))
    )
    per_t = deltas.groupBy("t_us").agg(F.sum("d").alias("dd"))
    sweep = per_t.select(
        "t_us",
        F.sum("dd")
        .over(
            Window.orderBy("t_us").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("live"),
    )
    return sweep.groupBy(
        F.expr("t_us div 86400000000").alias("day")
    ).agg(F.max("live").cast("long").alias("peak_concurrent"))


@register(
    "top_session_paths",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    ), paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 10
    """,
    survey_rows="ST3,W2,A7,paths",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 full SESSION PATHS (the ordered event-type sequence of a
    session, e.g. 'view>click>purchase') by frequency — the clickstream
    path-analysis readout that the pairwise `event_transition_matrix`
    cannot give (a Markov matrix forgets everything before the previous
    step; paths keep whole trajectories).

    Same lag+cumsum sessionization as `sessionize_30min`, then one
    collect-sort-join per session (bounded by session length, which the
    30-min gap bounds by construction) and a count over path strings.
    The session windows, the path agg, and the count reuse the user_id
    exchange where possible; the final top-10 is TakeOrderedAndProject.
    Path cardinality is the skew watch-point at 100 TB: hot paths
    ('view', 'view>view') concentrate, but the count agg is two-phase
    so hot keys combine map-side before the shuffle."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = 30 * 60 * 1_000_000
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session").over(wc).alias("session_id"),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda r: r.getField("event_type"),
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


@register(
    "session_window_dynamic_gap",
    """
    WITH ext AS (
      SELECT user_id, ts, event_id, value,
             epoch_us(ts) + CASE WHEN event_type = 'purchase'
                                 THEN 3600000000 ELSE 1800000000 END
               AS reach_us
      FROM events
    ),
    m AS (
      SELECT user_id, ts, value,
             max(reach_us) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_reach
      FROM ext
    ),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_reach IS NULL
                    OR epoch_us(ts) >= prev_reach
                  THEN 1 ELSE 0 END AS new_session
      FROM m
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS sid
      FROM flagged
    )
    SELECT user_id,
           min(epoch_us(ts))    AS session_start_us,
           max(epoch_us(ts))    AS session_last_us,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    survey_rows="ST3,W3,F4",
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 with a DYNAMIC inactivity gap: purchases hold the session
    open 60 minutes, everything else 30 — `F.session_window` with a
    per-row gap EXPRESSION, the Spark primitive for intent-dependent
    session semantics (checkout flows idle longer than browsing).

    The oracle derives the same sessions from first principles: each
    event 'reaches' to ts + its own gap, a session breaks exactly when
    an event's ts is at or past the RUNNING MAX of all prior reaches
    (the running max over the whole prefix is correct, not just over
    the current session: any earlier event reaching past this
    session's start would have prevented the break that started it —
    an inductive invariant the hash match certifies against Spark's
    internal interval-merge). Also pins the half-open boundary: an
    event landing exactly at session end starts a NEW session in both
    engines.

    One shuffle on the session grouping, same as the fixed-gap twin;
    the gap CASE is a codegen'd scan-side expression."""
    e = load_table(spark, sf_dir, "events")
    # make_interval, not an INTERVAL literal: session_window's gap
    # expression must be CalendarIntervalType, and Spark 4 interval
    # literals are ANSI DayTimeIntervalType
    gap = F.when(
        F.col("event_type") == "purchase",
        F.make_interval(mins=F.lit(60)),
    ).otherwise(F.make_interval(mins=F.lit(30)))
    return (
        e.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.max(F.unix_micros("ts")).alias("session_last_us"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            "session_start_us",
            "session_last_us",
            "n_events",
            "sum_value",
        )
    )
