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


@register(
    "twap_user_value",
    """
    WITH w AS (
      SELECT user_id, value,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id,
           round(sum(value * dt_us) / sum(dt_us), 6) AS twap,
           round(sum(value) / count(*), 6)           AS plain_avg,
           count(dt_us)                              AS n_intervals
    FROM w GROUP BY user_id HAVING sum(dt_us) > 0
    """,
    survey_rows="ST11,W2,A1",
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price/value (TWAP) over each user's
    IRREGULARLY-spaced event stream: each observation is weighted by how
    long it was "in force" (the gap to the user's next event), so a
    burst of near-simultaneous readings no longer dominates the mean the
    way it does in `plain_avg` (emitted alongside for contrast). The
    last observation per user has no successor and carries zero weight
    — the standard left-closed convention for observation-carried-
    forward series (market data, sensor readings, feature snapshots).

    Shape: one shuffle on user_id for the lead() window, then an
    ordinary partial-aggregated groupBy on the SAME key — Catalyst
    reuses the exchange, so the whole query is a single hash-partition
    pass. No self-join (the naive formulation joins each event to its
    successor). At 100 TB: identical plan; per-user state is one frame
    row for lead(), and the weighted sums are map-side combined.

    Numerics: dt is integer microseconds (exact); value*dt products are
    ~1e12-1e14, far inside double's 2^53, and the final ratio is rounded
    6dp on both engines so partial-sum association order cannot flip the
    hash."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    return (
        e.select("user_id", "value", dt.alias("dt_us"))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
            ).alias("twap"),
            F.round(F.sum("value") / F.count(F.lit(1)), 6).alias(
                "plain_avg"
            ),
            F.count("dt_us").alias("n_intervals"),
            F.sum("dt_us").alias("_total_dt"),
        )
        .filter(F.col("_total_dt") > 0)
        .drop("_total_dt")
    )


# --- segment-tree range rollup ---------------------------------------------
# Dyadic decomposition: a block b at level l covers hour interval
# [b*2^l, (b+1)*2^l). For any query range the maximal contained dyadic
# blocks (contained, parent NOT contained) form an exact partition of the
# range with O(log span) members — the classic segment-tree query, here
# expressed declaratively as a join between the (tiny) range list and the
# precomputed block aggregates.
SEGTREE_LEVELS = 10  # 2^10 h = 42 days > the 30-day corpus span

# fixed query ranges in absolute epoch-hours (events span Jan 2024 at
# every SF; 2024-01-01T00Z = hour 473352)
_H0 = 473352
SEGTREE_RANGES: list[tuple[int, int, int]] = [
    (1, _H0 + 24, _H0 + 96),    # Jan 02 00:00 – Jan 05 00:00
    (2, _H0 + 55, _H0 + 403),   # Jan 03 07:00 – Jan 17 19:00
    (3, _H0 + 5, _H0 + 720),    # Jan 01 05:00 – Jan 31 00:00
    (4, _H0 + 229, _H0 + 230),  # Jan 10 13:00 – Jan 10 14:00 (one hour)
    (5, _H0 + 503, _H0 + 673),  # Jan 21 23:00 – Jan 29 01:00
]

_SEGTREE_RANGES_SQL = ", ".join(
    f"({rid}, {rs}, {re})" for rid, rs, re in SEGTREE_RANGES
)


@register(
    "segtree_range_rollup",
    f"""
    WITH r(range_id, rs, re) AS (VALUES {_SEGTREE_RANGES_SQL})
    SELECT range_id,
           count(e.event_id) AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 2)
             AS sum_value
    FROM r JOIN events e
      ON epoch_us(e.ts) // 3600000000 >= r.rs
     AND epoch_us(e.ts) // 3600000000 < r.re
    GROUP BY range_id
    """,
    survey_rows="ST12,A1,J5",
)
def segtree_range_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-tree range rollup: answer ad-hoc time-range aggregates
    from PRECOMPUTED dyadic block sums instead of re-scanning raw events
    per query. Level 0 is the hourly rollup; level l merges pairs of
    level-(l-1) blocks. A query range [s,e) is then the disjoint union
    of its maximal contained dyadic blocks — blocks that fit inside the
    range while their parent does not — which is O(log span) blocks, so
    the per-range work is logarithmic in the range length regardless of
    how many raw events it covers.

    Implementation is fully declarative: the range list (query
    PARAMETERS, 5 literal rows) joins the unioned block table on the
    maximality predicate; Catalyst broadcasts the range side, so the
    probe is one pass over ~|hours| block rows. At 100 TB the hourly
    rollup is 4-5 orders of magnitude smaller than the raw stream and
    the level pyramid doubles that once (sum of halving levels) — the
    precompute is one shuffle of the rollup, amortized over every
    subsequent range query (the continuous-aggregate + hierarchical
    reaggregation pattern, cf. segment trees / Fenwick layouts).

    The oracle recomputes each range directly from raw events — the
    hash match proves the dyadic decomposition partitions every range
    exactly (no overlap, no gap); tests/test_timeseries.py additionally
    drives `segtree_rollup` over 40 seeded-random ranges against direct
    filters. Sums are decimal-exact during aggregation (association-
    order independent), cast to double only at the end."""
    return segtree_rollup(spark, sf_dir, SEGTREE_RANGES)


def segtree_rollup(
    spark: SparkSession,
    sf_dir: str,
    query_ranges: list[tuple[int, int, int]],
) -> DataFrame:
    """The reusable segment-tree engine behind segtree_range_rollup:
    build the dyadic pyramid once, answer the given (range_id, start_h,
    end_h) list via the maximal-block decomposition join. See the
    registered query's docstring for the full design.

    Correctness bound: a range of length >= 2^(LEVELS+1) hours could
    contain a level-(LEVELS+1) parent, which would wrongly exclude its
    children from the decomposition — guard loudly rather than gap
    silently (raise ValueError; raise SEGTREE_LEVELS for longer spans)."""
    for rid, rs, re_ in query_ranges:
        if re_ - rs >= 1 << (SEGTREE_LEVELS + 1):
            raise ValueError(
                f"range {rid} spans {re_ - rs} h >= 2^{SEGTREE_LEVELS + 1}"
                " — raise SEGTREE_LEVELS to cover it"
            )
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.expr("unix_micros(ts) div 3600000000").alias("b"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("b")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    # level pyramid in ONE pass: each hourly block belongs to exactly one
    # dyadic block per level, so explode hour -> [(l, b>>l)] and aggregate
    # once. (A per-level groupBy chain re-scans the hourly lineage once
    # per level — 11 jobs for the same answer.) Block extents are derived
    # from (l, lb) with shiftleft, staying codegen'd long arithmetic.
    lvl_tags = F.array(
        *[
            F.struct(
                F.lit(l).alias("l"),
                F.expr(f"b div {1 << l}").alias("lb"),
            )
            for l in range(SEGTREE_LEVELS + 1)
        ]
    )
    blocks = (
        hourly.select(F.explode(lvl_tags).alias("t"), "s", "n")
        .groupBy(F.col("t.l").alias("l"), F.col("t.lb").alias("lb"))
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .select(
            F.expr("lb * shiftleft(CAST(1 AS BIGINT), l)").alias("bs"),
            F.expr("(lb + 1) * shiftleft(CAST(1 AS BIGINT), l)").alias(
                "be"
            ),
            F.expr(
                "(lb div 2) * shiftleft(CAST(2 AS BIGINT), l)"
            ).alias("pbs"),
            F.expr(
                "(lb div 2 + 1) * shiftleft(CAST(2 AS BIGINT), l)"
            ).alias("pbe"),
            "s",
            "n",
        )
    )
    ranges = spark.createDataFrame(
        query_ranges, "range_id int, rs long, re long"
    )
    maximal = (
        (F.col("bs") >= F.col("rs"))
        & (F.col("be") <= F.col("re"))
        & ((F.col("pbs") < F.col("rs")) | (F.col("pbe") > F.col("re")))
    )
    return (
        blocks.join(F.broadcast(ranges), maximal)
        .groupBy("range_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("s").cast("double"), 2).alias("sum_value"),
        )
    )


@register(
    "rolling_median_value",
    """
    SELECT event_id, user_id, value,
           round(median(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 24 PRECEDING
                                              AND CURRENT ROW), 6)
             AS rolling_med
    FROM events WHERE user_id < 30
    """,
    survey_rows="W3,A8,ST10",
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over each user's trailing 25 observations — the
    robust running smoother (spike-immune, unlike the rolling mean the
    z-score family uses for its baseline): one outlier in the frame
    moves the mean by x/25 but the median by at most one rank step.

    Shape: identical to every trailing-frame operator here — one shuffle
    on user_id, then sequential frame evaluation; `percentile` as a
    WINDOW aggregate keeps the whole computation JVM-side (no UDF, no
    self-join). Per-row cost is O(frame log frame) for the rank pick —
    fine for bounded frames; for very wide frames the two-heap running-
    median shape would go into applyInPandasWithState like the unbounded
    EWMA (ST13). At 100 TB: the frame state is 25 doubles/row and the
    single user_id exchange dominates, exactly like rolling_zscore.

    Numerics: an ODD 25-row frame makes the median an exact element pick
    (no interpolation) once the frame fills; partial frames with an even
    count interpolate midpoints of exact doubles — identical IEEE on
    both engines, rounded 6dp as belt-and-braces."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias(
            "rolling_med"
        ),
    )


@register(
    "segtree_distinct_users",
    f"""
    WITH r(range_id, rs, re) AS (VALUES {_SEGTREE_RANGES_SQL})
    SELECT range_id,
           count(DISTINCT e.user_id) AS n_exact_users,
           TRUE AS approx_ok
    FROM r JOIN events e
      ON epoch_us(e.ts) // 3600000000 >= r.rs
     AND epoch_us(e.ts) // 3600000000 < r.re
    GROUP BY range_id
    """,
    survey_rows="A3,ST12,A2,J5",
)
def segtree_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT over ad-hoc time ranges from PRECOMPUTED
    mergeable sketches: the dyadic pyramid of segtree_range_rollup, but
    each block stores an HLL SKETCH of its users instead of a sum —
    distinct counts are not additive, yet sketches UNION losslessly, so
    the same O(log span) maximal-block decomposition answers "how many
    unique users in [s, e)" without touching raw events. This is the
    sketch-mergeability story that makes approximate distinct work in
    rollup hierarchies at all (sums compose; distinct only composes
    through a sketch).

    Exact+tolerance-witness design (same as hll_sketch_rollup /
    approx_percentile_witness): the hashable output carries the EXACT
    per-range distinct count (recomputed from raw events — also the
    DuckDB oracle) plus `approx_ok` asserting the sketch estimate lands
    within 15% (HLL's error at default lgK is ~2-3%, so the flag has
    wide margin while still catching a broken union). At 100 TB the
    estimate path touches only |hours| sketch blocks per query — the
    exact leg here exists purely as the verification witness."""
    e = load_table(spark, sf_dir, "events")
    hour = F.expr("unix_micros(ts) div 3600000000")
    hourly = (
        e.select(hour.alias("b"), "user_id")
        .groupBy("b")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    lvl_tags = F.array(
        *[
            F.struct(
                F.lit(l).alias("l"),
                F.expr(f"b div {1 << l}").alias("lb"),
            )
            for l in range(SEGTREE_LEVELS + 1)
        ]
    )
    blocks = (
        hourly.select(F.explode(lvl_tags).alias("t"), "sk")
        .groupBy(F.col("t.l").alias("l"), F.col("t.lb").alias("lb"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.expr("lb * shiftleft(CAST(1 AS BIGINT), l)").alias("bs"),
            F.expr("(lb + 1) * shiftleft(CAST(1 AS BIGINT), l)").alias("be"),
            F.expr("(lb div 2) * shiftleft(CAST(2 AS BIGINT), l)").alias("pbs"),
            F.expr("(lb div 2 + 1) * shiftleft(CAST(2 AS BIGINT), l)").alias("pbe"),
            "sk",
        )
    )
    ranges = spark.createDataFrame(
        SEGTREE_RANGES, "range_id int, rs long, re long"
    )
    maximal = (
        (F.col("bs") >= F.col("rs"))
        & (F.col("be") <= F.col("re"))
        & ((F.col("pbs") < F.col("rs")) | (F.col("pbe") > F.col("re")))
    )
    approx = (
        blocks.join(F.broadcast(ranges), maximal)
        .groupBy("range_id")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_approx")
        )
    )
    exact = (
        e.select(hour.alias("h"), "user_id")
        .join(
            F.broadcast(ranges),
            (F.col("h") >= F.col("rs")) & (F.col("h") < F.col("re")),
        )
        .groupBy("range_id")
        .agg(F.countDistinct("user_id").alias("n_exact_users"))
    )
    return exact.join(approx, "range_id").select(
        "range_id",
        "n_exact_users",
        (
            F.abs(F.col("_approx") - F.col("n_exact_users"))
            <= 0.15 * F.col("n_exact_users")
        ).alias("approx_ok"),
    )


@register(
    "cusum_drift_by_type",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), base AS (
      SELECT event_type,
             avg(x) FILTER (WHERE rn <= 14)         AS mu,
             stddev_samp(x) FILTER (WHERE rn <= 14) AS sigma
      FROM (SELECT event_type, x,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily)
      GROUP BY event_type
    ), scored AS (
      SELECT d.event_type, d.day,
             sum(d.x - b.mu - 0.5 * b.sigma)
               OVER (PARTITION BY d.event_type ORDER BY d.day) AS pre
      FROM daily d JOIN base b USING (event_type)
    ), peak AS (
      SELECT event_type, day, pre,
             min(pre) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prior_min
      FROM scored
    )
    SELECT p.event_type,
           round(max(greatest(p.pre - coalesce(p.prior_min, 0), p.pre)), 4)
             AS peak_cusum,
           round(max(greatest(p.pre - coalesce(p.prior_min, 0), p.pre))
                 / any_value(b.sigma), 4) AS peak_in_sigmas
    FROM peak p JOIN base b USING (event_type)
    GROUP BY p.event_type
    """,
    survey_rows="ST10,W3,A8,stats",
)
def cusum_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per event type: has the daily volume
    drifted upward from its first-two-weeks baseline? The one-sided
    CUSUM statistic S_t = max(0, S_{t-1} + x_t - mu - 0.5*sigma)
    accumulates small persistent shifts that a 3-sigma point alarm
    never sees — the standard SPC monitor for slow regressions.

    The recursion looks sequential, but its PEAK has a closed window
    form: max_t S_t = max subarray sum of y_t = x_t - mu - 0.5*sigma
    (Kadane's identity), and the max subarray sum is
    max_t (prefix_t - min(prefix_{<t}, 0)) — two ordered windows over
    the per-type daily spine, no fold, no UDF, identical in both
    engines. Everything past the one data-scale daily rollup runs on
    |types| x |days| rows; baselines join back broadcast.

    Numerics: daily sums are decimal-exact then cast once; the prefix
    arithmetic is identical IEEE on both engines, rounded 4dp."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("x")
        )
    )
    wrn = Window.partitionBy("event_type").orderBy("day")
    ranked = daily.withColumn("rn", F.row_number().over(wrn))
    base = ranked.groupBy("event_type").agg(
        F.avg(F.when(F.col("rn") <= 14, F.col("x"))).alias("mu"),
        F.stddev_samp(F.when(F.col("rn") <= 14, F.col("x"))).alias(
            "sigma"
        ),
    )
    scored = daily.join(F.broadcast(base), "event_type").select(
        "event_type",
        "day",
        "sigma",
        F.sum(
            F.col("x") - F.col("mu") - 0.5 * F.col("sigma")
        )
        .over(wrn.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pre"),
    )
    peak = scored.withColumn(
        "prior_min",
        F.min("pre").over(
            wrn.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    cus = F.greatest(
        F.col("pre") - F.coalesce(F.col("prior_min"), F.lit(0.0)),
        F.col("pre"),
    )
    return peak.groupBy("event_type").agg(
        F.round(F.max(cus), 4).alias("peak_cusum"),
        F.round(F.max(cus) / F.first("sigma"), 4).alias(
            "peak_in_sigmas"
        ),
    )


@register(
    "daily_trend_slope_by_type",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           count(*) AS n_days,
           round(regr_slope(n, day), 6)     AS count_slope_per_day,
           round(regr_slope(v, day), 4)     AS value_slope_per_day,
           round(regr_r2(v, day), 6)        AS value_r2
    FROM daily GROUP BY event_type
    """,
    survey_rows="stats,A1,ST12",
)
def daily_trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear trend per event type: OLS slope of daily volume and daily
    value against the day index, plus R² — the "is this growing, and is
    the trend real" readout that complements CUSUM (drift ALARM) with a
    RATE estimate, and the feature a forecasting stage seeds from.
    regr_slope/regr_r2 are algebraic aggregates (sums of x, y, xy, x²)
    — they compose map-side like any sum, so the trend over a 100 TB
    history is one partial-aggregated pass over the daily spine, and
    the same sums maintain INCREMENTALLY under the IVM pattern
    (rollup_incremental_maintenance) as new days arrive.

    Numerics: daily sums decimal-exact then cast once; both engines
    compute the same closed-form slope from the same moment sums —
    rounded 6dp/4dp for the final division drift."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("v"),
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.regr_slope("n", "day"), 6).alias(
            "count_slope_per_day"
        ),
        F.round(F.regr_slope("v", "day"), 4).alias(
            "value_slope_per_day"
        ),
        F.round(F.regr_r2("v", "day"), 6).alias("value_r2"),
    )


# Holt's linear-trend (double exponential) smoothing constants. ALPHA
# smooths the level, BETA the trend; both literal on the Spark and the
# DuckDB side so the folds are the same IEEE expression tree.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


@register(
    "holt_linear_daily_forecast",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    ordered AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM daily
    ),
    counts AS (
      SELECT event_type, count(*) AS n_days FROM ordered GROUP BY 1
    ),
    holt AS (
      SELECT event_type, i, v AS s, CAST(0.0 AS DOUBLE) AS b
      FROM ordered WHERE i = 1
      UNION ALL
      SELECT o.event_type, o.i,
             {HOLT_ALPHA}*o.v + {1 - HOLT_ALPHA}*(h.s + h.b) AS s,
             {HOLT_BETA}*(({HOLT_ALPHA}*o.v
                 + {1 - HOLT_ALPHA}*(h.s + h.b)) - h.s)
               + {1 - HOLT_BETA}*h.b AS b
      FROM holt h
      JOIN ordered o ON o.event_type = h.event_type AND o.i = h.i + 1
    )
    SELECT h.event_type, c.n_days,
           round(h.s, 6)          AS level,
           round(h.b, 6)          AS trend,
           round(h.s + 1*h.b, 6)  AS forecast_1d,
           round(h.s + 7*h.b, 6)  AS forecast_7d
    FROM holt h JOIN counts c ON h.event_type = c.event_type
    WHERE h.i = c.n_days
    """,
    survey_rows="ST11,ST12,F5,forecast",
)
def holt_linear_daily_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing over each
    event type's DAILY value series, plus 1-day and 7-day linear
    forecasts — the trend-aware upgrade of `ewma_running_final` that
    closes EWMA's lag on trending series. The coupled recurrence
      s_t = a*x_t + (1-a)*(s_{t-1} + b_{t-1})
      b_t = B*(s_t - s_{t-1}) + (1-B)*b_{t-1}
    needs TWO state variables, which a plain fold over doubles cannot
    carry — Spark folds over a STRUCT accumulator (`aggregate` with a
    named_struct zero; seed s_1 = x_1, b_1 = 0). The oracle deliberately
    does NOT use DuckDB's list_reduce with a struct accumulator: DuckDB
    (1.x, measured here) evaluates the lambda's struct fields
    SEQUENTIALLY against the accumulator, so the 'b' field sees the
    already-overwritten 's' — a coupled recurrence silently computes the
    wrong fixpoint. The oracle is a recursive CTE instead: one row per
    (event_type, step), standard SQL, same fold order and the same IEEE
    expression tree as the Spark fold.

    Determinism: daily sums go through DECIMAL(18,6) (exact, order-free)
    before the cast to double, so both engines fold the IDENTICAL value
    sequence with the IDENTICAL expression tree — the 6dp rounding only
    guards the last-ulp of the engines' float formatting.

    Scale: the raw stream collapses to |types| x |days| rows in one
    partial-aggregated pass; the per-type fold then touches ~30 doubles.
    At 100 TB the series per key stays tiny (one point per day) — the
    collect_list is bounded by the calendar, not the data. The unbounded
    STREAMING twin of this recurrence is the same (s, b) pair carried in
    applyInPandasWithState, exactly like running_user_ewma."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("v"),
    )
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))), r -> r.v)"
        ).alias("xs"),
    )
    a, b = HOLT_ALPHA, HOLT_BETA
    st = F.expr(
        f"""aggregate(
              slice(xs, 2, greatest(size(xs) - 1, 0)),
              named_struct('s', element_at(xs, 1),
                           'b', cast(0.0 as double)),
              (acc, x) -> named_struct(
                's', {a}*x + {1 - a}*(acc.s + acc.b),
                'b', {b}*(({a}*x + {1 - a}*(acc.s + acc.b)) - acc.s)
                     + {1 - b}*acc.b))"""
    )
    return series.select(
        "event_type",
        "n_days",
        F.round(st.getField("s"), 6).alias("level"),
        F.round(st.getField("b"), 6).alias("trend"),
        F.round(st.getField("s") + 1 * st.getField("b"), 6).alias(
            "forecast_1d"
        ),
        F.round(st.getField("s") + 7 * st.getField("b"), 6).alias(
            "forecast_7d"
        ),
    )


@register(
    "seasonal_hourly_anomaly",
    """
    WITH hourly AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(extract(hour FROM ts) AS BIGINT) AS hod,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2, 3
    ),
    base AS (
      SELECT event_type, hod,
             avg(v) AS mu, stddev_samp(v) AS sigma, count(*) AS n_days
      FROM hourly GROUP BY 1, 2
    )
    SELECT h.event_type, h.day, h.hod,
           round(h.v, 4)     AS bucket_value,
           round(b.mu, 4)    AS seasonal_mean,
           round((h.v - b.mu) / b.sigma, 3) AS zscore
    FROM hourly h
    JOIN base b ON h.event_type = b.event_type AND h.hod = b.hod
    WHERE b.n_days >= 10 AND b.sigma > 0
      AND abs(h.v - b.mu) > 3 * b.sigma
    """,
    survey_rows="ST10,A1,F2,stats",
)
def seasonal_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each (type, day, hour)
    bucket is scored against that type's HOUR-OF-DAY baseline across
    the whole history — the diurnal-profile residual that
    `rolling_zscore_anomaly` (trailing frame, per user) cannot see.
    Buckets with under 10 observed days or zero variance are unscored.

    Two passes, both over the ~|types|x|days|x24 hourly rollup (not the
    raw stream): pass 1 builds the 24-slot seasonal profile per type,
    pass 2 joins it back (a broadcast — |types|x24 rows) and filters to
    the 3-sigma tail. Decimal-exact hourly sums make the scored series
    identical in both engines, so the sigma threshold decides the same
    rows; the z-score itself is rounded 3dp for last-ulp division drift.

    Scale: the raw scan partial-aggregates to the hourly table once; the
    profile side is calendar-bounded, so the join never shuffles the big
    side — the same maintained-rollup shape as rollup_hour_to_day means
    at 100 TB this reads an IVM-maintained hourly table instead."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("v")
    )
    base = hourly.groupBy("event_type", "hod").agg(
        F.avg("v").alias("mu"),
        F.stddev_samp("v").alias("sigma"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return (
        hourly.join(F.broadcast(base), ["event_type", "hod"])
        .filter(
            (F.col("n_days") >= 10)
            & (F.col("sigma") > 0)
            & (F.abs(F.col("v") - F.col("mu")) > 3 * F.col("sigma"))
        )
        .select(
            "event_type",
            "day",
            "hod",
            F.round("v", 4).alias("bucket_value"),
            F.round("mu", 4).alias("seasonal_mean"),
            F.round((F.col("v") - F.col("mu")) / F.col("sigma"), 3).alias(
                "zscore"
            ),
        )
    )


@register(
    "holt_running_final",
    f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i
      FROM events
    ),
    counts AS (
      SELECT user_id, count(*) AS n_events FROM ordered GROUP BY 1
    ),
    holt AS (
      SELECT user_id, i, value AS s, CAST(0.0 AS DOUBLE) AS b
      FROM ordered WHERE i = 1
      UNION ALL
      SELECT o.user_id, o.i,
             {HOLT_ALPHA}*o.value + {1 - HOLT_ALPHA}*(h.s + h.b) AS s,
             {HOLT_BETA}*(({HOLT_ALPHA}*o.value
                 + {1 - HOLT_ALPHA}*(h.s + h.b)) - h.s)
               + {1 - HOLT_BETA}*h.b AS b
      FROM holt h
      JOIN ordered o ON o.user_id = h.user_id AND o.i = h.i + 1
    )
    SELECT h.user_id, c.n_events, h.s AS level, h.b AS trend
    FROM holt h JOIN counts c ON h.user_id = c.user_id
    WHERE h.i = c.n_events
    """,
    survey_rows="ST13,ST11,A7,forecast",
)
def holt_running_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded per-user Holt linear-trend state — the two-variable
    sibling of `ewma_running_final`: each user's FULL ordered history
    folded through s_t = a*x + (1-a)*(s+b), b_t = B*(s_t-s) + (1-B)*b
    (seed s=x_1, b=0), emitting the final (level, trend) pair RAW —
    both engines execute the identical IEEE expression tree in the
    identical order, so the hash matches at full double precision, no
    rounding. Oracle is a recursive CTE (one row per step), NOT
    list_reduce — see holt_linear_daily_forecast for the measured
    DuckDB struct-accumulator hazard.

    This is the batch-replayable twin of
    `streaming.stateful.running_user_holt`, whose state is one
    (s, b, n) triple per key (O(keys) memory, no history); the parity
    test pins stateful == this fold bit-identically. One groupBy
    shuffle; per-group memory is the user's value list — at 100 TB the
    recurrence runs ONLY in the stateful-streaming form, this fold is
    the verification surface."""
    e = load_table(spark, sf_dir, "events")
    rows = e.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list("
            "struct(ts, event_id, value))), r -> r.value)"
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    a, b = HOLT_ALPHA, HOLT_BETA
    st = F.expr(
        f"""aggregate(
              slice(xs, 2, greatest(size(xs) - 1, 0)),
              named_struct('s', element_at(xs, 1),
                           'b', cast(0.0 as double)),
              (acc, x) -> named_struct(
                's', {a}*x + {1 - a}*(acc.s + acc.b),
                'b', {b}*(({a}*x + {1 - a}*(acc.s + acc.b)) - acc.s)
                     + {1 - b}*acc.b))"""
    )
    return rows.select(
        "user_id",
        "n_events",
        st.getField("s").alias("level"),
        st.getField("b").alias("trend"),
    )


@register(
    "daily_value_acf",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    centered AS (
      SELECT event_type, day,
             v - avg(v) OVER (PARTITION BY event_type) AS c
      FROM daily
    ),
    lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER w AS c1,
             lag(c, 2) OVER w AS c2,
             lag(c, 7) OVER w AS c7
      FROM centered
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           count(*) AS n_days,
           round(CAST(sum(CAST(c * c1 AS DECIMAL(28,8))) AS DOUBLE)
                 / CAST(sum(CAST(c * c AS DECIMAL(28,8))) AS DOUBLE), 6)
             AS acf_1,
           round(CAST(sum(CAST(c * c2 AS DECIMAL(28,8))) AS DOUBLE)
                 / CAST(sum(CAST(c * c AS DECIMAL(28,8))) AS DOUBLE), 6)
             AS acf_2,
           round(CAST(sum(CAST(c * c7 AS DECIMAL(28,8))) AS DOUBLE)
                 / CAST(sum(CAST(c * c AS DECIMAL(28,8))) AS DOUBLE), 6)
             AS acf_7
    FROM lagged GROUP BY event_type
    """,
    survey_rows="ST12,W2,stats,forecast",
)
def daily_value_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION of each type's daily value series at lags 1, 2
    and 7 — the diagnostic that tells a forecaster WHICH structure the
    series carries (high acf_1 → momentum, Holt's trend term earns its
    keep; high acf_7 → weekly seasonality, the seasonal_hourly profile
    is the right baseline; all ≈ 0 → white noise, smoothing is as good
    as it gets). ACF(k) = Σ c_t·c_{t−k} / Σ c_t² over the mean-centered
    series.

    Determinism: daily sums are decimal-exact, so the centered values
    are identical doubles in both engines; each PRODUCT of identical
    doubles is identical, and the product sums accumulate through
    DECIMAL(28,8) casts — order-free, so the final ratio divides the
    same doubles on both sides (the compounding-drift lesson from
    pattern_vshape_dips applied to second-order statistics).

    Scale: everything after the first partial-agg pass runs on the
    |types| x |days| daily table; the lag windows and the closing agg
    share one event_type partitioning."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("v")
    )
    centered = daily.select(
        "event_type",
        "day",
        (
            F.col("v")
            - F.avg("v").over(Window.partitionBy("event_type"))
        ).alias("c"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = centered.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 2).over(w).alias("c2"),
        F.lag("c", 7).over(w).alias("c7"),
    )

    def dec_sum(prod):
        return F.sum(prod.cast("decimal(28,8)")).cast("double")

    denom = dec_sum(F.col("c") * F.col("c"))
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(dec_sum(F.col("c") * F.col("c1")) / denom, 6).alias(
            "acf_1"
        ),
        F.round(dec_sum(F.col("c") * F.col("c2")) / denom, 6).alias(
            "acf_2"
        ),
        F.round(dec_sum(F.col("c") * F.col("c7")) / denom, 6).alias(
            "acf_7"
        ),
    )


@register(
    "seasonal_dow_decompose",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             sum(CAST(value AS DECIMAL(18,2))) AS x
      FROM events GROUP BY 1, 2
    ), det AS (
      SELECT event_type, d,
             7 * x - (x
               + lag(x, 1) OVER w + lag(x, 2) OVER w
               + lag(x, 3) OVER w + lag(x, 4) OVER w
               + lag(x, 5) OVER w + lag(x, 6) OVER w) AS det7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, dayofweek(d) + 1 AS dow,
           count(*) AS n_days,
           round(CAST(sum(det7) AS DOUBLE) / (7.0 * count(*)), 6)
             AS seasonal_idx
    FROM det WHERE det7 IS NOT NULL
    GROUP BY 1, 2
    """,
    survey_rows="ST12,W2,A1,seasonality",
)
def seasonal_dow_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week SEASONAL DECOMPOSITION per event segment — the
    moving-average method (classical decomposition): trend is the
    trailing 7-day mean, the seasonal index of a weekday is the mean
    detrended value landing on it. Positive index = that weekday runs
    above its surrounding week's trend.

    Exactness discipline (float-hash rules): daily totals are exact
    DECIMAL sums; instead of dividing the 7-day window by 7 (decimal
    division scale/rounding differs across engines), the detrended
    series is scaled by 7 — det7 = 7x - (x + lag1..lag6), an EXACT
    decimal built from a fixed textual lag chain (never a sliding
    frame, whose internal summation order engines choose differently).
    Only the final per-dow mean converts to double: one exact-decimal
    sum, one cast, one division by an integer — bit-identical, with
    6dp rounding as the belt-and-braces guard.

    Scale shape: the corpus collapses to the (segment, day) grid in
    one partial-agg pass; lags and the dow rollup run on the grid.
    The lag chain shares ONE (event_type) window partitioning — same
    single-shuffle shape as the EWMA/ACF family. At 100 TB: grid-sized
    state, segment-parallel."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type"), F.to_date("ts").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("x"))
    w = Window.partitionBy("event_type").orderBy("d")
    det7 = F.col("x") * 7 - (
        F.col("x")
        + F.lag("x", 1).over(w)
        + F.lag("x", 2).over(w)
        + F.lag("x", 3).over(w)
        + F.lag("x", 4).over(w)
        + F.lag("x", 5).over(w)
        + F.lag("x", 6).over(w)
    )
    return (
        daily.withColumn("det7", det7)
        .filter(F.col("det7").isNotNull())
        .groupBy("event_type", F.dayofweek("d").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(
                F.sum("det7").cast("double")
                / (F.lit(7.0) * F.count(F.lit(1))),
                6,
            ).alias("seasonal_idx"),
        )
    )
