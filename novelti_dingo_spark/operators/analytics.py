"""Product-analytics operators over the events stream — the query shapes
an analytics user of the reference runs daily: threshold outliers, cohort
retention, ordered funnels. All are compositions of §2 primitives
(scalar-subquery thresholds, two-level aggregation, conditional min) and
all are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..barrier import barrier
from ..registry import register
from ..sources.io import load_table


@register(
    "outliers_above_p99",
    """
    WITH thresholds AS (
      SELECT event_type, quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value, round(p99, 6) AS p99
    FROM events e JOIN thresholds t ON e.event_type = t.event_type
    WHERE e.value > t.p99
    """,
    survey_rows="A1,J4,P2,stats",
)
def outliers_above_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold outlier detection: events above their type's p99.

    The per-type thresholds are a 5-row aggregate broadcast back against
    the stream — the scalable two-pass shape (never a per-row percentile
    window). At 100 TB swap the exact percentile for approx_percentile."""
    e = load_table(spark, sf_dir, "events")
    thresholds = e.groupBy("event_type").agg(
        F.percentile("value", 0.99).alias("_p99")
    )
    return (
        e.join(F.broadcast(thresholds), "event_type")
        .filter(F.col("value") > F.col("_p99"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("_p99", 6).alias("p99"),
        )
    )


@register(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id,
             (epoch_us(min(ts)) // (86400000000 * 7)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             (epoch_us(ts) // (86400000000 * 7)) AS active_week
      FROM events
    )
    SELECT cohort_week, active_week - cohort_week AS weeks_since,
           count(*) AS active_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
    survey_rows="A1,A2,J1,F2",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    per week-offset of later activity. Two aggregations over the same
    user_id partitioning + a broadcastable firsts table."""
    e = load_table(spark, sf_dir, "events")
    week = lambda c: (F.unix_micros(c) / (86_400_000_000 * 7)).cast("long")  # noqa: E731
    firsts = e.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    activity = e.select("user_id", week(F.col("ts")).alias("active_week")).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "funnel_signup_click_purchase",
    """
    WITH stages AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'signup')   AS t_signup,
             min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (WHERE t_signup IS NOT NULL)  AS n_signup,
           count(*) FILTER (WHERE t_signup IS NOT NULL
                              AND t_click > t_signup)    AS n_then_click,
           count(*) FILTER (WHERE t_signup IS NOT NULL
                              AND t_click > t_signup
                              AND t_purchase > t_click)  AS n_then_purchase
    FROM stages
    """,
    survey_rows="A5,A6,funnel",
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then clicked after signup,
    then purchased after that click. One grouped pass computes each
    user's first-stage timestamps (conditional min), one global pass
    counts stage survivors — no self-joins, no per-user sorting."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stages = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count(F.when(signed, F.lit(1))).alias("n_signup"),
        F.count(F.when(clicked, F.lit(1))).alias("n_then_click"),
        F.count(F.when(purchased, F.lit(1))).alias("n_then_purchase"),
    )


@register(
    "percentile_exact_quartiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           quantile_disc(l_quantity, 0.5)  AS med_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_rows="A8,A1",
)
def percentile_exact_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: EXACT quantiles (vs A3's approx sketch) — linear-interpolated
    quartiles plus the discrete median, per return flag.

    Both engines interpolate as a + f*(b-a) with f ∈ {0, .25, .5, .75}
    over integer-valued quantities ≤ 50, so every intermediate is exact
    in binary double and the hash match is bit-level, no rounding needed.

    Scale note: exact percentile requires a per-group sort of the values
    — Spark's `percentile` buffers the group into a sorted structure, so
    memory is O(distinct values) per group after partial aggregation
    merges counts (quantity has ≤ 50 distinct values here, trivially
    small). For unbounded-cardinality columns at 100 TB, this operator is
    the wrong tool by construction — use approx_percentile (A3, constant
    memory, rsd-bounded) and keep exact quantiles for bounded-domain
    columns; that split is the documented guidance, not a limitation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)"
        ).alias("med_disc"),
    )


@register(
    "column_profile",
    """
    SELECT 'o_totalprice' AS col, count(*) AS n,
           count(*) - count(o_totalprice) AS n_null,
           count(DISTINCT o_totalprice) AS n_distinct,
           round(min(o_totalprice), 2) AS min_d,
           round(max(o_totalprice), 2) AS max_d
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*),
           count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           round(min(o_custkey), 2), round(max(o_custkey), 2)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority|len', count(*),
           count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           round(min(length(o_orderpriority)), 2),
           round(max(length(o_orderpriority)), 2)
    FROM orders
    """,
    survey_rows="Q1,A5,A2",
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: ANALYZE-style column profiling — rowcount, null count, exact
    distinct count, min/max (string columns profiled by value length so
    the output stays numeric and engine-portable) as one row per column.

    Single pass: all per-column aggregates run in ONE scan/agg (Spark
    plans the multi-distinct via Expand — one extra shuffle, never one
    scan per column like the naive UNION the oracle spells for clarity).
    At 100 TB swap exact distinct for approx_count_distinct (A3) — same
    plan minus the Expand; the profile is how table stats for CBO and
    layout decisions (Z-order column choice, S7) get gathered."""
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("tp_null"),
        F.count_distinct("o_totalprice").alias("tp_distinct"),
        F.round(F.min("o_totalprice"), 2).alias("tp_min"),
        F.round(F.max("o_totalprice"), 2).alias("tp_max"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("ck_null"),
        F.count_distinct("o_custkey").alias("ck_distinct"),
        F.round(F.min("o_custkey").cast("double"), 2).alias("ck_min"),
        F.round(F.max("o_custkey").cast("double"), 2).alias("ck_max"),
        F.sum(F.col("o_orderpriority").isNull().cast("long")).alias("op_null"),
        F.count_distinct("o_orderpriority").alias("op_distinct"),
        F.round(F.min(F.length("o_orderpriority")).cast("double"), 2).alias(
            "op_min"
        ),
        F.round(F.max(F.length("o_orderpriority")).cast("double"), 2).alias(
            "op_max"
        ),
    )
    return row.selectExpr(
        """stack(3,
             'o_totalprice',        n, tp_null, tp_distinct, tp_min, tp_max,
             'o_custkey',           n, ck_null, ck_distinct, ck_min, ck_max,
             'o_orderpriority|len', n, op_null, op_distinct, op_min, op_max
           ) AS (col, n, n_null, n_distinct, min_d, max_d)"""
    )


@register(
    "share_of_total_revenue",
    """
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
             AS share_in_region,
           round(revenue / sum(revenue) OVER (), 6) AS share_global
    FROM rev
    """,
    survey_rows="W3,A1,J1,F3",
)
def share_of_total_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue as a share of its region
    and of the world — the percent-of-total window every BI layer needs.
    Shape: the windows run over the 25-row AGGREGATE, not the fact table
    (aggregate first, window the rollup) — at 100 TB the window input is
    |nations|, so the two share columns are free. Shares divide one
    2dp-rounded total by another (both engines window the same rounded
    values), so the 6dp quotient is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    from pyspark.sql import Window

    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    wr = Window.partitionBy("region")
    wg = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(wr), 6).alias(
            "share_in_region"
        ),
        F.round(F.col("revenue") / F.sum("revenue").over(wg), 6).alias(
            "share_global"
        ),
    )


@register(
    "cumulative_unique_users",
    """
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS first_day
      FROM events GROUP BY user_id
    ), per_day AS (
      SELECT first_day AS day, count(*) AS new_users FROM firsts GROUP BY 1
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM per_day
    """,
    survey_rows="A2,W3,F2,ST6",
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve query. The
    naive form (COUNT(DISTINCT) over an expanding window) rescans every
    prefix: quadratic. The scalable identity: a user contributes to the
    cumulative count exactly once, on their FIRST day — so reduce to
    first-touch rows (one shuffle on user_id), aggregate to |days| rows,
    and a running sum over that tiny spine finishes the job. Same shape
    at 100 TB: the expensive part stays a plain two-phase min-agg."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@register(
    "per_group_sample",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 5
    """,
    survey_rows="sampling,W1,F7",
)
def per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sample: 5 docs per language, drawn in
    md5(doc_id) order — the distributed reservoir-sample replacement
    (row_number over a hash order ≡ a uniform draw, but re-run-stable and
    engine-portable, no RNG state). One shuffle on the group key; at
    scale the WindowGroupLimit optimization stops each partition after k
    rows instead of ranking everything."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           count(*) AS n_transitions,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type), 6)
             AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    survey_rows="W2,A1,ST3,stats",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next event type | previous), the sequence-analytics
    primitive behind next-action prediction and bot detection (uniform
    rows betray scripted traffic). One shuffle on user_id for the lag,
    then a |types|² aggregate; the row-normalizing window runs over those
    ~25 rows. p_next divides two exact counts — engine-stable at 6dp."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wn = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wn), 6
        ).alias("p_next"),
    )


@register(
    "mad_outlier_days",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(o_totalprice) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ), med AS (
      SELECT median(revenue) AS med FROM daily
    ), mad AS (
      SELECT median(abs(revenue - med)) AS mad FROM daily, med
    )
    SELECT strftime(day, '%Y-%m-%d')      AS day,
           round(revenue, 2)              AS revenue,
           round(abs(revenue - med) / mad, 4) AS mad_score
    FROM daily, med, mad
    WHERE abs(revenue - med) > 3.0 * mad
    """,
    survey_rows="A8,A1,P2,stats",
)
def mad_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag days
    whose total order revenue deviates from the median daily revenue by
    more than 3 MAD. Unlike the z-score family (rolling_zscore_anomaly),
    both the center (median) and the spread (MAD) have a 50% breakdown
    point, so a handful of extreme days cannot mask themselves by
    inflating the threshold — the standard robust-statistics screen for
    revenue/volume monitoring.

    Shape: one partial-aggregated groupBy to the |days|-bounded daily
    spine, then TWO scalar aggregates (median, then median of absolute
    deviations) broadcast back as single-row cross joins. Exact medians
    are |days|-scale sorts, not data-scale: at 100 TB the daily spine is
    still a few thousand rows, so driver/exchange cost is metadata-level
    (same spine-bounded pattern as cumulative_unique_users; do NOT use
    this exact-median shape on row-scale groups — that is what
    approx_percentile is for).

    Numerics: daily revenue is a DECIMAL sum (exact, association-free)
    cast to double once; both engines interpolate the even-count median
    as lower + 0.5*(upper-lower) on bit-identical inputs, so the 3-MAD
    comparison is deterministic and the oracle hash exact."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").cast("double").alias("revenue"))
    )
    med = daily.agg(
        F.expr("percentile(revenue, 0.5)").alias("med")
    )
    with_med = daily.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.expr("percentile(abs(revenue - med), 0.5)").alias("mad")
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .filter(F.abs(F.col("revenue") - F.col("med")) > 3.0 * F.col("mad"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("revenue", 2).alias("revenue"),
            F.round(
                F.abs(F.col("revenue") - F.col("med")) / F.col("mad"), 4
            ).alias("mad_score"),
        )
    )


@register(
    "basket_part_lift",
    """
    WITH lines AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT count(DISTINCT l_orderkey) AS n_orders FROM lines
    ), freq AS (
      SELECT l_partkey, count(*) AS c FROM lines GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_both
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_both,
           round(n_both * 1.0 * n_orders / (fa.c * fb.c), 6) AS lift
    FROM pairs
    JOIN freq fa ON part_a = fa.l_partkey
    JOIN freq fb ON part_b = fb.l_partkey
    CROSS JOIN n
    WHERE n_both >= 2
    """,
    survey_rows="J1,A1,A2,P2",
)
def basket_part_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: which part pairs appear in
    the same order more often than their independent popularity predicts
    (lift = P(a,b) / (P(a)P(b)))? The co-purchase signal behind
    recommendations, shelf placement, and bundling — and in a training-
    data pipeline the same shape surfaces as tag/label co-occurrence.

    Shape: pair generation is a self-equi-join on l_orderkey, so fan-out
    is C(k,2) WITHIN each order (k = lineitems/order, bounded ~7 by the
    schema) — never across orders, never all-pairs over parts. The pair
    counts aggregate two-phase on (part_a, part_b); the per-part
    frequency table is |parts|-sized and broadcast back onto the pairs,
    and the order total is a 1-row broadcast. At 100 TB: the only
    data-scale shuffles are the orderkey self-join (co-partitioned, one
    exchange per side) and the pair aggregation; a k-cap guard (drop
    degenerate mega-orders) is the standard skew valve, same as the LSH
    bucket-width cap.

    The n_both >= 2 support floor keeps the output at signal-bearing
    pairs (singleton co-occurrence is noise at any scale)."""
    # Round-14 (guide §3.3/§5): the distinct basket-line relation is
    # referenced five times (total, frequency table, both self-join
    # sides) — materialize the one distinct shuffle per invocation
    # instead of replaying it per reference
    li = barrier(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    fa = F.broadcast(freq.select(F.col("l_partkey").alias("part_a"),
                                 F.col("c").alias("_ca")))
    fb = F.broadcast(freq.select(F.col("l_partkey").alias("part_b"),
                                 F.col("c").alias("_cb")))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                F.col("n_both")
                * F.lit(1.0)
                * F.col("n_orders")
                / (F.col("_ca") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "forecast_backtest_mae",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             count(*) AS n,
             round(sum(value), 4) AS v
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, day, n, v,
             lag(n, 7) OVER w AS n_pred,
             lag(v, 7) OVER w AS v_pred
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           count(*) AS n_scored_days,
           round(avg(abs(n - n_pred)), 6)        AS mae_count,
           round(avg(abs(v - v_pred)), 6)        AS mae_value,
           round(avg(abs(n - n_pred) * 1.0 / n), 6) AS mape_count
    FROM lagged WHERE n_pred IS NOT NULL
    GROUP BY event_type
    """,
    survey_rows="W2,A1,ST12,stats",
)
def forecast_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each (event_type, day)'s
    volume and value as the SAME WEEKDAY one week earlier (lag-7 on the
    daily spine) and score MAE/MAPE per type — the baseline every
    capacity-planning / anomaly-budget forecast must beat, and the
    backtest harness shape (walk-forward, no leakage: each prediction
    uses only strictly-earlier data) that fancier models plug into.

    Shape: raw events collapse to the |types|x|days| spine with one
    two-phase aggregation; the lag and the error aggregation both live
    on the spine (bounded by calendar size, not data size). At 100 TB
    the spine is identical — the only data-scale operation remains the
    first rollup. The per-type window is |days| rows: no single-
    partition hazard (the anti-pattern guard flags unpartitioned raw
    windows; a partitioned post-agg spine is the documented safe case).

    Numerics: daily sums round 4dp before differencing (engine partial-
    sum order differs), then MAE/MAPE round 6dp — avg over <= |days|
    exact-rounded inputs is deterministic at that precision."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "n",
        "v",
        F.lag("n", 7).over(w).alias("n_pred"),
        F.lag("v", 7).over(w).alias("v_pred"),
    ).filter(F.col("n_pred").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored_days"),
        F.round(F.avg(F.abs(F.col("n") - F.col("n_pred"))), 6).alias(
            "mae_count"
        ),
        F.round(F.avg(F.abs(F.col("v") - F.col("v_pred"))), 6).alias(
            "mae_value"
        ),
        F.round(
            F.avg(
                F.abs(F.col("n") - F.col("n_pred")) * F.lit(1.0) / F.col("n")
            ),
            6,
        ).alias("mape_count"),
    )


@register(
    "user_longest_streak",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
      FROM days
    ), runs AS (
      SELECT user_id, count(*) AS run_len, min(day) AS run_start
      FROM isl GROUP BY user_id, grp
    ), best AS (
      SELECT user_id, run_len, run_start,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY run_len DESC, run_start ASC)
               AS rn
      FROM runs
    )
    SELECT user_id, run_len AS longest_streak_days,
           run_start AS streak_start_day
    FROM best WHERE rn = 1 AND run_len >= 3
    """,
    survey_rows="W1,A1,U3,F2",
)
def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    GAPS-AND-ISLANDS idiom: distinct active days, then `day -
    row_number()` is constant exactly within a run of consecutive days
    (each gap shifts the difference), so grouping on that constant
    materializes the islands without any self-join or iterative logic.
    The engagement metric behind retention features ("7-day streak"),
    and the same idiom handles sensor uptime runs and inventory
    stockout spells.

    Shape: one distinct (user, day) aggregation (two-phase, |users| x
    |days| bounded), one per-user window for the island constant, one
    island aggregation, one per-user argmax — every step keyed on
    user_id, so Catalyst reuses a single hash-partitioning end to end;
    nothing is data-scale after the first dedup. Ties (two equal runs)
    break on earliest start in both engines. Output floors at 3-day
    streaks to keep the result signal-bearing."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min("day").alias("run_start"),
    )
    best = (
        runs.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.col("run_len"),
                    (-F.col("run_start")).alias("neg_start"),
                )
            ).alias("_b")
        )
        .select(
            "user_id",
            F.col("_b.run_len").alias("longest_streak_days"),
            (-F.col("_b.neg_start")).alias("streak_start_day"),
        )
    )
    return best.filter(F.col("longest_streak_days") >= 3)


@register(
    "audience_overlap_sketch",
    """
    WITH a AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'click' AND user_id < 100
    ), b AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND user_id >= 50
    )
    SELECT (SELECT count(*) FROM a) AS n_a,
           (SELECT count(*) FROM b) AS n_b,
           (SELECT count(*) FROM (SELECT user_id FROM a
                                  INTERSECT
                                  SELECT user_id FROM b)) AS n_overlap,
           TRUE AS approx_ok
    """,
    survey_rows="A3,U2,A2",
)
def audience_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via sketch set algebra: |A ∩ B| estimated by
    inclusion-exclusion over HLL sketches — est(A) + est(B) - est(A∪B)
    — where the union is a lossless sketch merge. The ad-tech/growth
    primitive ("how many clickers are also purchasers") computed from
    per-segment sketches that are a few KB each, WITHOUT re-scanning
    either segment's raw rows: at 100 TB the segments' sketches are
    maintained incrementally (hll_union_agg is associative and
    commutative) and any pairwise overlap among hundreds of segments is
    driver-side arithmetic on cached sketches.

    Inclusion-exclusion error grows when the overlap is small relative
    to the sets (the difference of two noisy estimates); here the
    engineered segments overlap ~50%, comfortably inside the witness
    tolerance. Exact+tolerance-witness output (family:
    segtree_distinct_users): the exact counts hash-match the oracle's
    INTERSECT, `approx_ok` asserts the sketch estimate within 20%."""
    e = load_table(spark, sf_dir, "events")
    a = e.filter(
        (F.col("event_type") == "click") & (F.col("user_id") < 100)
    ).select("user_id")
    b = e.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") >= 50)
    ).select("user_id")
    sk = (
        a.select(F.lit("a").alias("s"), "user_id")
        .unionAll(b.select(F.lit("b").alias("s"), "user_id"))
        .groupBy("s")
        .agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.countDistinct("user_id").alias("n_exact"),
        )
    )
    row = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
        F.sum(F.hll_sketch_estimate("sk")).alias("est_sum"),
        F.max(F.when(F.col("s") == "a", F.col("n_exact"))).alias("n_a"),
        F.max(F.when(F.col("s") == "b", F.col("n_exact"))).alias("n_b"),
    ).head()
    # an empty segment contributes no group row: its count is 0, not
    # NULL (and the estimates coalesce the same way)
    est_overlap = (row["est_sum"] or 0.0) - (row["est_union"] or 0.0)
    n_overlap = (
        a.distinct().join(b.distinct(), "user_id", "left_semi").count()
    )
    ok = bool(
        abs(est_overlap - n_overlap) <= max(0.2 * n_overlap, 2.0)
    )
    return spark.createDataFrame(
        [(int(row["n_a"] or 0), int(row["n_b"] or 0), n_overlap, ok)],
        "n_a long, n_b long, n_overlap long, approx_ok boolean",
    )


@register(
    "skyline_price_date",
    """
    WITH daily AS (
      SELECT o_orderdate AS d, max(o_totalprice) AS p
      FROM orders GROUP BY 1
    )
    SELECT strftime(a.d, '%Y-%m-%d') AS day, round(a.p, 2) AS best_price
    FROM daily a
    WHERE NOT EXISTS (
      SELECT 1 FROM daily b WHERE b.d < a.d AND b.p >= a.p
    )
    """,
    survey_rows="W3,A1,skyline",
)
def skyline_price_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) of daily peak order price vs date:
    the days not dominated by any earlier day with an equal-or-higher
    peak — "record-breaking days". The oracle states dominance
    declaratively (NOT EXISTS, O(days²)); the Spark side uses the 2-D
    skyline identity instead: sort one dimension, a point is on the
    frontier iff it beats the RUNNING MAX of the other — one window
    scan, O(days log days).

    Scale note: the window is single-partition BY DESIGN but runs over
    the |days|-row pre-aggregate (the grouped agg reduces the fact
    first), never raw rows — the same shape as the date-spine queries.
    For a skyline over millions of frontier candidates, partition by a
    coarse bucket of the sort dimension, take per-bucket frontiers, and
    merge — the identity composes; not needed at |days| ≈ 2.4k."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.max("o_totalprice").alias("p")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    return (
        daily.withColumn("_runmax", F.max("p").over(w))
        .filter(F.col("_runmax").isNull() | (F.col("_runmax") < F.col("p")))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round("p", 2).alias("best_price"),
        )
    )


@register(
    "chisq_segment_priority",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cells AS (
      SELECT seg, pri, count(*)::DOUBLE AS obs FROM j GROUP BY 1, 2
    ), tot AS (
      SELECT sum(obs) AS n FROM cells
    ), rt AS (
      SELECT seg, sum(obs) AS r FROM cells GROUP BY 1
    ), ct AS (
      SELECT pri, sum(obs) AS c FROM cells GROUP BY 1
    )
    SELECT round(sum(
             (obs - rt.r * ct.c / tot.n) * (obs - rt.r * ct.c / tot.n)
               / (rt.r * ct.c / tot.n)
           ), 6) AS chi2,
           (count(DISTINCT cells.seg) - 1) * (count(DISTINCT cells.pri) - 1)
             AS dof
    FROM cells
    JOIN rt ON rt.seg = cells.seg
    JOIN ct ON ct.pri = cells.pri
    CROSS JOIN tot
    """,
    survey_rows="A1,A5,stats-test",
)
def chisq_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market segment
    and order priority — the categorical-association primitive a data-
    quality or drift monitor runs over every pair of low-cardinality
    columns. One fact scan to the k×m contingency cells; row/column
    margins and the statistic are computed ON the 25-cell frame
    (window sums + one aggregate), so the test costs one grouped agg at
    any corpus size. Expected counts derive from identical integer
    margins in both engines; the 25-term sum rounds at 6dp, far above
    float-order noise."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cells = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("obs"))
    )
    wr = Window.partitionBy("seg")
    wc = Window.partitionBy("pri")
    wall = Window.partitionBy()
    with_m = (
        cells.withColumn("_r", F.sum("obs").over(wr))
        .withColumn("_c", F.sum("obs").over(wc))
        .withColumn("_n", F.sum("obs").over(wall))
    )
    exp = F.col("_r") * F.col("_c") / F.col("_n")
    return with_m.agg(
        F.round(
            F.sum((F.col("obs") - exp) * (F.col("obs") - exp) / exp), 6
        ).alias("chi2"),
        (
            (F.count_distinct("seg") - 1) * (F.count_distinct("pri") - 1)
        ).alias("dof"),
    )


@register(
    "signup_to_purchase_latency",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id,
             min(epoch_us(e.ts) - epoch_us(s.signup_ts)) AS lat_us
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    )
    SELECT count(*) AS n_converted,
           round(quantile_cont(lat_us / 1e6, 0.5), 6) AS p50_sec,
           round(quantile_cont(lat_us / 1e6, 0.9), 6) AS p90_sec
    FROM p
    """,
    survey_rows="A1,A8,W2,funnel",
)
def signup_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: per user, time from FIRST signup
    to the first purchase at or after it, summarized as exact
    interpolated p50/p90 — the funnel-health metric product analytics
    asks right after the conversion-rate funnel (which
    funnel_signup_click_purchase covers). Two grouped aggs + one join,
    all keyed on user_id so the shuffle partitioning is reused;
    latencies cross engines as exact integer microsecond differences
    divided by 1e6 (identical doubles), and `percentile` ==
    `quantile_cont` interpolation."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    lat = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros("ts") - F.unix_micros("signup_ts")
            ).alias("lat_us")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile(F.col("lat_us") / 1e6, 0.5), 6).alias("p50_sec"),
        F.round(F.percentile(F.col("lat_us") / 1e6, 0.9), 6).alias("p90_sec"),
    )


@register(
    "benford_first_digit",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), obs AS (
      SELECT d, count(*)::DOUBLE AS n FROM digits GROUP BY d
    ), tot AS (
      SELECT sum(n) AS t FROM obs
    )
    SELECT d AS digit,
           CAST(n AS BIGINT) AS n_orders,
           round(n / t, 6) AS observed_freq,
           round(ln(1.0 + 1.0 / d) / ln(10.0), 6) AS benford_freq
    FROM obs CROSS JOIN tot
    """,
    survey_rows="A1,F1,dq-stats",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the forensic
    data-quality screen for fabricated or truncated numeric columns
    (natural multi-scale amounts follow P(d) = log10(1 + 1/d); uniform
    synthetic data — like this corpus — visibly does not, which is
    exactly what the side-by-side expected column shows). One grouped
    agg to 9 cells, frequencies against the 1-row total; first digits
    extracted identically in both engines via explicit floor before the
    integer-string truncation (DuckDB's double→BIGINT cast ROUNDS while
    Spark's truncates — a measured off-by-one on boundary amounts like
    89999.9997; float formatting would diverge even more)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.col("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).cast("bigint").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("n") / F.col("t"), 6).alias("observed_freq"),
        F.round(
            F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0)), 6
        ).alias("benford_freq"),
    )


@register(
    "rfm_segmentation",
    """
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate),
                       (SELECT max(o_orderdate) FROM orders)) AS recency_days,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           round(sum(monetary), 2) AS segment_revenue,
           round(avg(recency_days), 4) AS avg_recency_days
    FROM scored GROUP BY 1, 2, 3
    """,
    survey_rows="A1,W1,F2,rfm",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer compute Recency (days
    since last order, against the corpus max date), Frequency (order
    count) and Monetary (revenue), quartile-score each dimension with
    ntile(4) (score 1 = best: most recent / most frequent / highest
    spend), and roll up to the 4x4x4 segment grid with counts and
    revenue — the lifecycle-marketing table (champions = 111, at-risk =
    4xx...) every CRM computes.

    Determinism: ntile needs a TOTAL order or engines may split ties
    differently — every ORDER BY carries o_custkey as tiebreak, and
    monetary is rounded BEFORE scoring so both engines rank identical
    doubles. Scale: per-customer aggs are one partial-agg shuffle; the
    three ntile windows are global but operate on the |customers|
    aggregate (already reduced — the audit's SinglePartition rule), and
    a 100 TB deployment would swap them for rank.with_global_rank's
    repartitionByRange + broadcast-offsets rank, same as
    sorted-neighborhood did."""
    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("_maxd"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .join(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff(F.col("_maxd"), F.col("_last")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    scored = rfm.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("recency_days", "o_custkey"))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("segment_revenue"),
        F.round(F.avg("recency_days"), 4).alias("avg_recency_days"),
    )


@register(
    "revenue_concentration_gini",
    """
    WITH cust AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev, o_custkey) AS rn,
             count(*) OVER () AS n,
             sum(rev) OVER () AS tot
      FROM cust
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           round(max(tot), 2) AS total_revenue,
           round(2.0 * sum(rn * rev) / (max(n) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini,
           round(sum(CASE WHEN rn > 0.9 * n THEN rev ELSE 0 END)
                 / max(tot), 6) AS top10pct_share
    FROM ranked
    """,
    survey_rows="A5,W1,F3,stats",
)
def revenue_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue CONCENTRATION: the Gini coefficient of per-customer
    revenue via the closed rank form G = 2*Σ(i*x_i)/(n*Σx) - (n+1)/n
    over ascending-sorted revenues, plus the top-decile revenue share —
    the inequality readout (how whale-dependent is this business / how
    skewed is this key distribution) that also predicts join-skew risk
    on the same key.

    Rank needs a total order: ties broken by o_custkey; revenues are
    rounded 2dp before ranking so both engines rank identical values.
    The window runs over the |customers| AGGREGATE (one partial-agg
    shuffle reduces orders first); the rank-weighted sums then fold in
    a single global aggregate. At 100 TB swap the single global window
    for rank.with_global_rank (range-partitioned rank), the formula is
    unchanged."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = Window.orderBy("rev", "o_custkey")
    ranked = cust.select(
        "rev",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("rev").over(Window.partitionBy()).alias("tot"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.max("tot"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("rn") * F.col("rev"))
            / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(F.col("rn") > 0.9 * F.col("n"), F.col("rev")).otherwise(
                    0.0
                )
            )
            / F.max("tot"),
            6,
        ).alias("top10pct_share"),
    )


@register(
    "winsorized_value_stats",
    """
    WITH bounds AS (
      SELECT event_type,
             quantile_disc(value, 0.05) AS p5,
             quantile_disc(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS raw_mean,
           round(CAST(sum(CAST(
                   CASE WHEN e.value < b.p5 THEN b.p5
                        WHEN e.value > b.p95 THEN b.p95
                        ELSE e.value END AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS winsorized_mean,
           round(CAST(sum(CAST(CASE WHEN e.value BETWEEN b.p5 AND b.p95
                                    THEN e.value END AS DECIMAL(18,6)))
                      AS DOUBLE)
                 / count(CASE WHEN e.value BETWEEN b.p5 AND b.p95
                              THEN 1 END), 6) AS trimmed_mean,
           CAST(count(CASE WHEN e.value < b.p5 OR e.value > b.p95
                           THEN 1 END) AS BIGINT) AS n_clamped
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY e.event_type
    """,
    survey_rows="A8,A1,stats,robust",
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED and TRIMMED means per event type — the robust-mean
    pair that complements MAD (`mad_outlier_days`): winsorizing CLAMPS
    the tails to the [P5, P95] boundary values (keeps n, bounds
    influence), trimming DROPS them (changes n, removes influence);
    reporting both beside the raw mean shows exactly how much the tails
    were moving the estimate.

    Determinism: boundaries are DISCRETE quantiles (actual data values,
    no interpolation drift) computed per type; all three means
    accumulate through exact DECIMAL sums so both engines divide
    identical doubles (the pattern_vshape_dips lesson), and the
    division denominators are exact counts.

    Scale: one percentile aggregate over |types| groups, then one
    partial-agg pass with the |types|-row boundary table broadcast back
    — the same two-pass profile as seasonal_hourly_anomaly."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY value)"
        ).alias("p5"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY value)"
        ).alias("p95"),
    )
    j = e.join(F.broadcast(bounds), "event_type")
    clamped = (
        F.when(F.col("value") < F.col("p5"), F.col("p5"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
    )
    inside = F.col("value").between(F.col("p5"), F.col("p95"))
    dec = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(dec(F.col("value")) / F.count(F.lit(1)), 6).alias(
            "raw_mean"
        ),
        F.round(dec(clamped) / F.count(F.lit(1)), 6).alias(
            "winsorized_mean"
        ),
        F.round(
            dec(F.when(inside, F.col("value")))
            / F.count(F.when(inside, F.lit(1))),
            6,
        ).alias("trimmed_mean"),
        F.count(F.when(~inside, F.lit(1))).alias("n_clamped"),
    )
