"""Statistical-test operators: distribution drift (two-sample
Kolmogorov-Smirnov), mean comparison (Welch's t), and time-to-event
survival (Kaplan-Meier). These are the inference queries an analytics
user runs AFTER the descriptive ones (PSI, chi-square, winsorized means
— all already registered): "did the distribution move", "is the
difference real", "how long until conversion, given censoring".

All three reduce to §2 primitives — grouped aggregation, a window
cumsum over a GROUPED (bounded-domain) key, and scalar math — so the
corpus is never shuffled more than once and nothing is iterative.
Exactness discipline: integer counts divide as doubles (identical IEEE
both engines), decimal-cast sums where sums feed the statistic, libm
outputs rounded to 6dp (the F3 guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table, widen


@register(
    "ks_drift_totalprice",
    """
    WITH pts AS (
      SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
             CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END AS a,
             CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END AS b
      FROM orders
      WHERE year(o_orderdate) IN (1995, 1996)
    ), g AS (
      SELECT v, sum(a) AS ca, sum(b) AS cb FROM pts GROUP BY v
    ), cdf AS (
      SELECT sum(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
             sum(ca) OVER () AS n_a,
             sum(cb) OVER () AS n_b
      FROM g
    )
    SELECT CAST(max(n_a) AS BIGINT) AS n_1995,
           CAST(max(n_b) AS BIGINT) AS n_1996,
           round(max(abs(CAST(cum_a AS DOUBLE) / n_a
                         - CAST(cum_b AS DOUBLE) / n_b)), 6) AS ks_stat
    FROM cdf
    """,
    survey_rows="A1,W3,stats-tests",
)
def ks_drift_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the 1995
    and 1996 order-value distributions: D = max_x |F95(x) - F96(x)|,
    computed on a whole-dollar grid (KS of the quantized distributions
    is exact for the grid — and a fixed grid is what makes the operator
    scale: the CDF cumsum runs over DISTINCT grid values, a bounded
    domain, not over rows).

    Plan shape: one partial-agg groupBy collapses the corpus to the
    grid (≤ price-range rows), a single ordered cumsum window produces
    both CDFs in one pass, and a global max reduces to one row. At
    100 TB the grouped domain is ~10^5-10^6 cells regardless of row
    count; if a finer grid ever mattered, the cumsum distributes via
    rank.with_global_rank (repartitionByRange + broadcast offsets).
    Exactness: cum/n is exact-int-to-double division — bit-identical
    across engines; 6dp rounding is belt-and-braces."""
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").alias("y"),
            F.floor("o_totalprice").cast("bigint").alias("v"),
        )
        .filter(F.col("y").isin(1995, 1996))
    )
    g = o.groupBy("v").agg(
        F.sum((F.col("y") == 1995).cast("long")).alias("ca"),
        F.sum((F.col("y") == 1996).cast("long")).alias("cb"),
    )
    cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = g.select(
        F.sum("ca").over(cum).alias("cum_a"),
        F.sum("cb").over(cum).alias("cum_b"),
    )
    totals = g.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    return cdf.crossJoin(F.broadcast(totals)).agg(
        F.max("n_a").cast("bigint").alias("n_1995"),
        F.max("n_b").cast("bigint").alias("n_1996"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("n_a")
                    - F.col("cum_b").cast("double") / F.col("n_b")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


@register(
    "welch_ttest_priority",
    """
    WITH agg AS (
      SELECT
        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS n1,
        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS s1,
        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2)) END) AS ss1,
        sum(CASE WHEN o_orderpriority = '5-LOW'
                 THEN 1 ELSE 0 END) AS n2,
        sum(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS s2,
        sum(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2)) END) AS ss2
      FROM orders
    ), st AS (
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             CAST(s1 AS DOUBLE) / n1 AS m1,
             CAST(s2 AS DOUBLE) / n2 AS m2,
             (CAST(ss1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
             / (n1 - 1) / n1 AS q1,
             (CAST(ss2 AS DOUBLE)
              - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
             / (n2 - 1) / n2 AS q2
      FROM agg
    )
    SELECT n1 AS n_high, n2 AS n_low,
           round(m1, 2) AS mean_high, round(m2, 2) AS mean_low,
           round((m1 - m2) / sqrt(q1 + q2), 6) AS t_stat,
           round((q1 + q2) * (q1 + q2)
                 / (q1 * q1 / (n1 - 1) + q2 * q2 / (n2 - 1)), 4)
             AS dof_welch
    FROM st
    """,
    survey_rows="A5,A6,T1,stats-tests",
)
def welch_ttest_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: is mean order value different
    between high-priority ('1-URGENT'/'2-HIGH') and '5-LOW' orders?
    One conditional-aggregation pass (the A6 filtered-agg shape)
    produces exact DECIMAL sums and sums-of-squares for both groups —
    the whole test then evaluates on the driver-free 1-row frame:
    t = (m1-m2)/sqrt(s1²/n1 + s2²/n2), dof by Welch-Satterthwaite.

    Exactness: the sums are DECIMAL (no float summation-order hazard
    at any scale); every double expression after that is written in
    the same operation order on both engines, and sqrt is
    IEEE-correctly-rounded, so t is bit-identical before the 6dp
    rounding. One corpus scan, one partial agg, no shuffle beyond the
    1-row reduce — the same cost as a count(*) at 100 TB."""
    d = F.col("o_totalprice").cast("decimal(18,2)")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lo = F.col("o_orderpriority") == "5-LOW"
    agg = load_table(spark, sf_dir, "orders").agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(hi, d)).alias("s1"),
        F.sum(F.when(hi, d * d)).alias("ss1"),
        F.sum(F.when(lo, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(lo, d)).alias("s2"),
        F.sum(F.when(lo, d * d)).alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    st = agg.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        (F.col("s1").cast("double") / n1).alias("m1"),
        (F.col("s2").cast("double") / n2).alias("m2"),
        (
            (
                F.col("ss1").cast("double")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / n1
            )
            / (n1 - 1)
            / n1
        ).alias("q1"),
        (
            (
                F.col("ss2").cast("double")
                - F.col("s2").cast("double")
                * F.col("s2").cast("double")
                / n2
            )
            / (n2 - 1)
            / n2
        ).alias("q2"),
    )
    q1, q2 = F.col("q1"), F.col("q2")
    return st.select(
        F.col("n1").alias("n_high"),
        F.col("n2").alias("n_low"),
        F.round("m1", 2).alias("mean_high"),
        F.round("m2", 2).alias("mean_low"),
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(q1 + q2), 6
        ).alias("t_stat"),
        F.round(
            (q1 + q2)
            * (q1 + q2)
            / (
                q1 * q1 / (F.col("n1") - 1)
                + q2 * q2 / (F.col("n2") - 1)
            ),
            4,
        ).alias("dof_welch"),
    )


@register(
    "logrank_conversion_groups",
    """
    WITH horizon AS (SELECT max(ts) AS h FROM events),
    s AS (
      SELECT user_id, user_id % 2 AS grp, min(ts) AS st FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT s.user_id, min(e.ts) AS pt
      FROM s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND e.ts >= s.st
      GROUP BY s.user_id
    ),
    u AS (
      SELECT s.grp,
             CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END AS ev,
             CAST(floor(date_diff('second', st, coalesce(pt, h))
                        / 3600.0) AS BIGINT) AS dur_h
      FROM s LEFT JOIN p ON s.user_id = p.user_id CROSS JOIN horizon
    ),
    g AS (
      SELECT dur_h,
             sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS d1,
             sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS t1,
             sum(ev) AS d, count(*) AS t
      FROM u GROUP BY dur_h
    ),
    k AS (
      SELECT dur_h, d1, d,
             (SELECT sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) FROM u)
             - coalesce(sum(t1) OVER (ORDER BY dur_h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n1,
             (SELECT count(*) FROM u)
             - coalesce(sum(t) OVER (ORDER BY dur_h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n
      FROM g
    ),
    terms AS (
      SELECT d1,
             CAST(d * (CAST(n1 AS DOUBLE) / n) AS DECIMAL(20,8)) AS e1,
             CAST(CASE WHEN n > 1
                  THEN d * (CAST(n1 AS DOUBLE) / n)
                       * (1.0 - CAST(n1 AS DOUBLE) / n)
                       * (n - d) / (n - 1)
                  ELSE 0.0 END AS DECIMAL(20,8)) AS v
      FROM k WHERE d > 0
    )
    SELECT CAST(sum(d1) AS BIGINT) AS observed_g1,
           round(CAST(sum(e1) AS DOUBLE), 6) AS expected_g1,
           round((sum(d1) - CAST(sum(e1) AS DOUBLE))
                 * (sum(d1) - CAST(sum(e1) AS DOUBLE))
                 / CAST(sum(v) AS DOUBLE), 6)
             AS chisq_logrank
    FROM terms
    """,
    survey_rows="A1,W3,A6,stats-tests",
)
def logrank_conversion_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: do odd- and even-keyed users convert
    (signup→purchase) at the same rate, censoring included? At every
    event time the observed group-1 events are compared with the
    hypergeometric expectation d·n1/n given the at-risk sets; the
    statistic (O−E)²/V is χ²₁ under the null. Same bounded-domain
    window shape as the Kaplan-Meier query — per-user mins, one
    groupBy on the hour grid, cumulative at-risk windows over the
    grid, a 1-row reduce. All inputs to the doubles are exact integer
    counts, so both engines evaluate identical IEEE expressions (6dp
    rounding is belt-and-braces)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    horizon = e.agg(F.max("ts").alias("h"))
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
        .withColumn("grp", F.col("user_id") % 2)
    )
    p = (
        s.join(
            e.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
            ),
            (F.col("p_user") == s.user_id) & (F.col("pts") >= F.col("st")),
        )
        .groupBy("user_id")
        .agg(F.min("pts").alias("pt"))
    )
    sec = F.unix_timestamp(F.coalesce("pt", "h")) - F.unix_timestamp("st")
    u = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "grp",
            F.col("pt").isNotNull().cast("long").alias("ev"),
            F.floor(sec / 3600.0).cast("bigint").alias("dur_h"),
        )
    )
    g = u.groupBy("dur_h").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("ev")).otherwise(0)).alias(
            "d1"
        ),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("t1"),
        F.sum("ev").alias("d"),
        F.count(F.lit(1)).alias("t"),
    )
    totals = u.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1_tot"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    prior = Window.orderBy("dur_h").rowsBetween(
        Window.unboundedPreceding, -1
    )
    k = (
        g.crossJoin(F.broadcast(totals))
        .withColumn(
            "n1",
            F.col("n1_tot")
            - F.coalesce(F.sum("t1").over(prior), F.lit(0)),
        )
        .withColumn(
            "n",
            F.col("n_tot") - F.coalesce(F.sum("t").over(prior), F.lit(0)),
        )
        .filter(F.col("d") > 0)
    )
    frac = F.col("n1").cast("double") / F.col("n")
    e1 = F.col("d") * frac
    v = F.when(
        F.col("n") > 1,
        F.col("d")
        * frac
        * (F.lit(1.0) - frac)
        * (F.col("n") - F.col("d"))
        / (F.col("n") - 1),
    ).otherwise(F.lit(0.0))
    # per-time terms quantize to exact DECIMAL before summing so the
    # reduce is order-independent (the winsorized-means idiom); the
    # rationals d·n1/n cannot land on a half-1e-8 boundary (power-of-2
    # denominators terminate earlier, others are off the decimal grid)
    return k.select(
        F.col("d1"),
        e1.cast("decimal(20,8)").alias("e1"),
        v.cast("decimal(20,8)").alias("v"),
    ).agg(
        F.sum("d1").cast("bigint").alias("observed_g1"),
        F.round(F.sum("e1").cast("double"), 6).alias("expected_g1"),
        F.round(
            (F.sum("d1") - F.sum("e1").cast("double"))
            * (F.sum("d1") - F.sum("e1").cast("double"))
            / F.sum("v").cast("double"),
            6,
        ).alias("chisq_logrank"),
    )


@register(
    "ks_drift_by_event_type",
    """
    WITH bounds AS (
      SELECT min(ts) AS lo, max(ts) AS hi FROM events
    ), pts AS (
      SELECT event_type,
             CAST(floor(value * 100.0) AS BIGINT) AS v,
             CASE WHEN date_diff('second', lo, ts)
                       * 2 < date_diff('second', lo, hi)
                  THEN 1 ELSE 0 END AS a
      FROM events CROSS JOIN bounds
      WHERE value IS NOT NULL
    ), g AS (
      SELECT event_type, v,
             sum(a) AS ca, count(*) - sum(a) AS cb
      FROM pts GROUP BY event_type, v
    ), cdf AS (
      SELECT event_type,
             sum(ca) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             sum(cb) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
             sum(ca) OVER (PARTITION BY event_type) AS n_a,
             sum(cb) OVER (PARTITION BY event_type) AS n_b
      FROM g
    )
    SELECT event_type,
           CAST(max(n_a) AS BIGINT) AS n_early,
           CAST(max(n_b) AS BIGINT) AS n_late,
           round(max(abs(CAST(cum_a AS DOUBLE) / n_a
                         - CAST(cum_b AS DOUBLE) / n_b)), 6) AS ks_stat
    FROM cdf
    GROUP BY event_type
    """,
    survey_rows="A1,W3,stats-tests",
)
def ks_drift_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment drift monitor — the production shape of the KS
    query: ONE pass computes, for every event type, the exact KS
    statistic between the early-half and late-half value
    distributions (did any segment's distribution move within the
    window?). Values quantize to a 0.01 grid; the corpus collapses to
    (type, grid-cell) via partial agg; the CDF windows PARTITION BY
    type, so unlike the global-window single-sample KS this
    parallelizes across segments — the scalable shape when the
    monitored dimension has thousands of values. The midpoint split
    uses integer second arithmetic (date_diff twin) — no float time
    math."""
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    bounds = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    # NULL values are excluded on both sides: a NULL grid cell would
    # sort NULLS FIRST in Spark but NULLS LAST in DuckDB, desyncing
    # the cumulative CDFs
    pts = e.filter(F.col("value").isNotNull()).crossJoin(
        F.broadcast(bounds)
    ).select(
        "event_type",
        F.floor(F.col("value") * 100.0).cast("bigint").alias("v"),
        (
            (
                (F.unix_timestamp("ts") - F.unix_timestamp("lo")) * 2
                < F.unix_timestamp("hi") - F.unix_timestamp("lo")
            ).cast("long")
        ).alias("a"),
    )
    g = pts.groupBy("event_type", "v").agg(
        F.sum("a").alias("ca"),
        (F.count(F.lit(1)) - F.sum("a")).alias("cb"),
    )
    cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    whole = Window.partitionBy("event_type")
    cdf = g.select(
        "event_type",
        F.sum("ca").over(cum).alias("cum_a"),
        F.sum("cb").over(cum).alias("cum_b"),
        F.sum("ca").over(whole).alias("n_a"),
        F.sum("cb").over(whole).alias("n_b"),
    )
    return cdf.groupBy("event_type").agg(
        F.max("n_a").cast("bigint").alias("n_early"),
        F.max("n_b").cast("bigint").alias("n_late"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("n_a")
                    - F.col("cum_b").cast("double") / F.col("n_b")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


@register(
    "mannwhitney_value_groups",
    """
    WITH pts AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('click', 'view')
    ), g AS (
      SELECT v, sum(a) AS c1, sum(b) AS c2, count(*) AS c
      FROM pts GROUP BY v
    ), ranked AS (
      SELECT c1, c2, c,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
      FROM g
    ), agg AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c1 * (2 * s + c + 1)) AS BIGINT) AS r1x2,
             CAST(sum(c * c * c - c) AS BIGINT) AS ties
      FROM ranked
    )
    SELECT n1, n2,
           round(CAST(r1x2 AS DOUBLE) / 2.0
                 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0, 1) AS u1,
           round((CAST(r1x2 AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
                  - CAST(n1 AS DOUBLE) * n2 / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                        * ((n1 + n2 + 1.0)
                           - CAST(ties AS DOUBLE)
                             / ((n1 + n2) * (n1 + n2 - 1.0)))), 6)
             AS z_stat
    FROM agg
    """,
    survey_rows="A1,W3,stats-tests",
)
def mannwhitney_value_groups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney U (tie-corrected): are click and view event values
    drawn from the same distribution? Rank-based, so it needs no
    normality assumption — and it distributes exactly like the KS
    query: collapse to distinct values (partial agg), one cumulative
    window over the grouped domain for the rank prefix, then a 1-row
    reduce. EXACTNESS BY CONSTRUCTION: 2·R1 = Σ c1·(2·prefix + c + 1)
    is an INTEGER (average ranks are half-integers), so the rank sum
    aggregates as a bigint — no float summation order anywhere; the
    z statistic is a fixed double expression over five exact integers
    (at 100 TB-scale counts, swap the bigint for DECIMAL(38,0) before
    2·R1 overflows ~9.2e18)."""
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("value").alias("v"),
            (F.col("event_type") == "click").cast("long").alias("a"),
            (F.col("event_type") == "view").cast("long").alias("b"),
        )
    )
    g = pts.groupBy("v").agg(
        F.sum("a").alias("c1"),
        F.sum("b").alias("c2"),
        F.count(F.lit(1)).alias("c"),
    )
    prior = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = g.select(
        "c1",
        "c2",
        "c",
        F.coalesce(F.sum("c").over(prior), F.lit(0)).alias("s"),
    )
    agg = ranked.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(
            F.col("c1") * (2 * F.col("s") + F.col("c") + 1)
        ).cast("bigint").alias("r1x2"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).cast("bigint").alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    r1 = F.col("r1x2").cast("double") / 2.0
    u1 = r1 - n1d * (F.col("n1") + 1) / 2.0
    sigma = F.sqrt(
        n1d * F.col("n2") / 12.0
        * (
            (F.col("n1") + F.col("n2") + F.lit(1.0))
            - F.col("ties").cast("double")
            / ((F.col("n1") + F.col("n2"))
               * (F.col("n1") + F.col("n2") - F.lit(1.0)))
        )
    )
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round((u1 - n1d * n2d / 2.0) / sigma, 6).alias("z_stat"),
    )


B_REPLICATES = 100

# Poisson(1) inverse CDF as a portable CASE chain: u (8 md5 hex digits
# of "orderkey_replicate" folded into [0,1) — every term digit × exact
# power of two, bit-identical on both engines) maps to the resample
# weight. Constants are the cumulative Poisson(1) probabilities.
_BOOT_U = (
    "("
    + " + ".join(
        "(instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS STRING)"
        f" || '_' || CAST(b AS STRING)), {i}, 1)) - 1) * power(16.0, -{i})"
        for i in range(1, 9)
    )
    + ")"
)
_POISSON_CUM = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
]
_BOOT_W = (
    "(CASE "
    + " ".join(
        f"WHEN {_BOOT_U} < {c!r} THEN {k}"
        for k, c in enumerate(_POISSON_CUM)
    )
    + " ELSE 8 END)"
)


@register(
    "bootstrap_ci_mean",
    f"""
    WITH pts AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS x
      FROM orders WHERE year(o_orderdate) = 1996
    ), rep AS (
      SELECT b, {_BOOT_W} AS w, x
      FROM pts CROSS JOIN (SELECT unnest(range({B_REPLICATES})) AS b)
    ), means AS (
      SELECT b, CAST(sum(w * x) AS DOUBLE) / sum(w) AS m
      FROM rep GROUP BY b
    ), est AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(x) AS DOUBLE) / count(*) AS mean_full
      FROM pts
    )
    SELECT n_rows, {B_REPLICATES} AS n_replicates,
           round(mean_full, 6) AS est_mean,
           round(quantile_cont(m, 0.025), 6) AS ci_lo95,
           round(quantile_cont(m, 0.975), 6) AS ci_hi95
    FROM est, means
    GROUP BY n_rows, mean_full
    """,
    survey_rows="A5,F7,W3,stats-tests",
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for mean order value (1996): the
    DISTRIBUTED bootstrap — classical resampling needs n draws per
    replicate from a global index (a shuffle per replicate), while the
    Poisson bootstrap gives each (row, replicate) an independent
    Poisson(1) weight, so all B resamples ride ONE scan: explode ×B,
    weight from a hash (no RNG state — deterministic, replayable,
    identical on both engines), one partial-agg'd groupBy(replicate).
    The shuffle carries B×partitions partial rows, never B×n.

    Exactness: weights are integers from bit-identical hash uniforms;
    x sums as DECIMAL (no float order hazard); each replicate mean is
    one exact-int/decimal double division; the CI is the exact
    interpolated percentile over the B means (A8 parity)."""
    B = B_REPLICATES
    # widen: the ~1M per-(row, replicate) md5 evaluations streamed
    # through the orders scan's ONE partition (round-14, guide §2.5/§6;
    # sums here are exact decimal/int — order-insensitive, oracle hash
    # PASS both SFs). Measured warm median at sf0.1: 4.0 s → 0.75 s.
    pts = widen(
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1996)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        )
    )
    # Round-14 (guide §1.2 step 2, per-task work): the one-shot
    # `F.expr(_BOOT_W)` CASE chain re-evaluated the md5 uniform in
    # every WHEN branch — up to 8 md5 calls × 8 digit extractions per
    # (row, replicate); codegen's conditional-branch subexpression
    # elimination does not hoist them. Stage the SAME arithmetic
    # through named columns instead: one md5 per (row, replicate), one
    # digit-fold `u`, then the CASE compares a plain column. Catalyst
    # keeps the staged projections (CollapseProject refuses to inline
    # non-cheap aliases referenced more than once), so the md5 runs
    # once. Bit-identical: identical expressions, identical
    # left-to-right fold order, identical CASE thresholds — the oracle
    # hash match at both SFs is the witness. Honest measurement
    # (sf0.1, noop, warm median): wall UNCHANGED at ~4.2 s — codegen's
    # runtime subexpression elimination was already deduping the md5;
    # kept because the single evaluation is now guaranteed at the plan
    # level (interpreted fallback, codegen size limits) and the plan
    # shrinks 2.5× (64 md5 refs → 1).
    digit_fold = " + ".join(
        f"(instr('0123456789abcdef', substr(_h, {i}, 1)) - 1)"
        f" * power(16.0, -{i})"
        for i in range(1, 9)
    )
    case_w = (
        "(CASE "
        + " ".join(
            f"WHEN _u < {c!r} THEN {k}"
            for k, c in enumerate(_POISSON_CUM)
        )
        + " ELSE 8 END)"
    )
    rep = (
        pts.select(
            "o_orderkey",
            "x",
            F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("b"),
        )
        .withColumn(
            "_h",
            F.expr(
                "md5(CAST(o_orderkey AS STRING) || '_' ||"
                " CAST(b AS STRING))"
            ),
        )
        .withColumn("_u", F.expr(f"({digit_fold})"))
        .select(F.expr(case_w).alias("w"), "x", "b")
    )
    means = rep.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("x")).cast("double") / F.sum("w")
        ).alias("m")
    )
    est = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias(
            "mean_full"
        ),
    )
    return means.crossJoin(F.broadcast(est)).groupBy(
        "n_rows", "mean_full"
    ).agg(
        F.round(F.percentile("m", 0.025), 6).alias("ci_lo95"),
        F.round(F.percentile("m", 0.975), 6).alias("ci_hi95"),
    ).select(
        "n_rows",
        F.lit(B).alias("n_replicates"),
        F.round("mean_full", 6).alias("est_mean"),
        "ci_lo95",
        "ci_hi95",
    )


@register(
    "survival_km_signup_purchase",
    """
    WITH horizon AS (SELECT max(ts) AS h FROM events),
    s AS (
      SELECT user_id, min(ts) AS st FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT s.user_id, min(e.ts) AS pt
      FROM s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND e.ts >= s.st
      GROUP BY s.user_id
    ),
    u AS (
      SELECT s.user_id,
             CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END AS ev,
             CAST(floor(date_diff('second', st, coalesce(pt, h))
                        / 3600.0) AS BIGINT) AS dur_h
      FROM s LEFT JOIN p ON s.user_id = p.user_id CROSS JOIN horizon
    ),
    g AS (
      SELECT dur_h, sum(ev) AS d, count(*) - sum(ev) AS c
      FROM u GROUP BY dur_h
    ),
    k AS (
      SELECT dur_h, d, c,
             (SELECT count(*) FROM u)
             - coalesce(sum(d + c) OVER (ORDER BY dur_h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM g
    ),
    surv AS (
      SELECT dur_h, d, c, n_risk,
             sum(CASE WHEN d < n_risk
                      THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                 END) OVER (ORDER BY dur_h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_ln
      FROM k
    )
    SELECT dur_h, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
           CASE WHEN d >= n_risk THEN 0.0
                ELSE round(exp(cum_ln), 6) END AS survival
    FROM surv
    WHERE d > 0
    ORDER BY dur_h
    LIMIT 30
    """,
    survey_rows="A1,J5,W3,O2,stats-tests",
)
def survival_km_signup_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier survival for signup→first-purchase conversion with
    RIGHT CENSORING: users who never purchase are censored at the
    corpus horizon (they were at risk the whole observed window — a
    naive conversion-latency average silently drops them and biases
    fast). S(t) = Π_{t_i ≤ t} (1 - d_i / n_i) over event times, folded
    as exp(Σ ln(1 - d/n)) so the cumulative product is one window
    cumsum (libm outputs rounded 6dp, the F3 guard; a d = n_risk final
    step short-circuits to exactly 0 on both engines, sidestepping
    Spark's ln(0) → NULL vs DuckDB's -inf).

    Plan shape: two per-user min-aggregations (signup, first qualifying
    purchase — equi hash join on user_id with the ts residual), one
    groupBy on the HOUR-quantized duration, then the at-risk/survival
    windows run over that bounded domain (hours since signup ≤ corpus
    span — thousands of rows at any corpus size). Purchases join
    against the user table, not the reverse, so the event corpus
    shuffles once on user_id. At 100 TB everything before the windows
    is partial-agg + one shuffle; the window input is control-plane
    sized."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    horizon = e.agg(F.max("ts").alias("h"))
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    p = (
        s.join(
            e.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
            ),
            (F.col("p_user") == s.user_id) & (F.col("pts") >= F.col("st")),
        )
        .groupBy("user_id")
        .agg(F.min("pts").alias("pt"))
    )
    sec = F.unix_timestamp(F.coalesce("pt", "h")) - F.unix_timestamp("st")
    u = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.col("pt").isNotNull().cast("long").alias("ev"),
            F.floor(sec / 3600.0).cast("bigint").alias("dur_h"),
        )
    )
    g = u.groupBy("dur_h").agg(
        F.sum("ev").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).alias("c"),
    )
    total = u.agg(F.count(F.lit(1)).alias("n_total"))
    prior = Window.orderBy("dur_h").rowsBetween(
        Window.unboundedPreceding, -1
    )
    k = g.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("n_total")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(prior), F.lit(0)),
    )
    cum = Window.orderBy("dur_h").rowsBetween(Window.unboundedPreceding, 0)
    surv = k.withColumn(
        "cum_ln",
        F.sum(
            F.when(
                F.col("d") < F.col("n_risk"),
                F.log(
                    F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
                ),
            )
        ).over(cum),
    )
    return (
        surv.filter(F.col("d") > 0)
        .select(
            "dur_h",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("n_events"),
            F.col("c").cast("bigint").alias("n_censored"),
            F.when(F.col("d") >= F.col("n_risk"), F.lit(0.0))
            .otherwise(F.round(F.exp("cum_ln"), 6))
            .alias("survival"),
        )
        .orderBy("dur_h")
        .limit(30)
    )


@register(
    "mann_kendall_trend",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             sum(CAST(value AS DECIMAL(18,2))) AS x
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT a.event_type,
             CAST(sum(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
      GROUP BY 1
    ), nd AS (
      SELECT event_type, count(*) AS n FROM daily GROUP BY 1
    ), ties AS (
      SELECT event_type,
             sum(t * (t - 1) * (2 * t + 5)) AS tie_term
      FROM (SELECT event_type, x, count(*) AS t
            FROM daily GROUP BY 1, 2) GROUP BY 1
    )
    SELECT s.event_type, nd.n AS n_days, s.s_stat,
           round((nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term)
                 / 18.0, 6) AS var_s,
           round(CASE
             WHEN s.s_stat > 0 THEN (s.s_stat - 1)
               / sqrt((nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term)
                      / 18.0)
             WHEN s.s_stat < 0 THEN (s.s_stat + 1)
               / sqrt((nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term)
                      / 18.0)
             ELSE 0.0 END, 6) AS z_stat
    FROM s JOIN nd USING (event_type) JOIN ties USING (event_type)
    """,
    survey_rows="A1,J5,W,stats-tests",
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event segment — the
    standard nonparametric drift detector for daily KPI series (does
    revenue trend up, independent of distribution shape?).

    S = sum over day pairs i<j of sign(x_j - x_i); under H0,
    Var(S) = [n(n-1)(2n+5) - sum t(t-1)(2t+5)] / 18 with the tie
    correction, and Z = (S -+ 1)/sqrt(Var) is ~N(0,1).

    Exactness discipline (float-hash rules): daily totals are exact
    DECIMAL(18,2) sums (value is 2dp-quantized), so every sign
    comparison is exact and S is a bigint; n and the tie term are
    integers; Var's /18.0 and Z's one division + one IEEE-exact sqrt
    are bit-identical given identical integer inputs — no libm hazard
    anywhere, 6dp rounding is belt-and-braces.

    Scale shape: the corpus collapses to the (segment, day) grid in
    one partial-agg pass; the pairwise self-join runs on the BOUNDED
    grid (30 days -> 435 pairs per segment), never on raw events —
    the same bounded-domain pattern as the KS/KM/log-rank family. At
    100 TB: one shuffle of segment-day partials, then grid-sized
    work."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type"), F.to_date("ts").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("x"))
    a = daily.select(
        "event_type", F.col("d").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        "event_type", F.col("d").alias("db"), F.col("x").alias("xb")
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.signum(F.col("xb") - F.col("xa")).cast("bigint")
            ).alias("s_stat")
        )
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n = F.col("n")
    var_expr = (
        (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / F.lit(18.0)
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(var_expr),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(var_expr),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(nd, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "s_stat",
            F.round(var_expr, 6).alias("var_s"),
            F.round(z, 6).alias("z_stat"),
        )
    )
