"""Remaining surface rows: statistical aggregates, JSON map functions
(F6), a real Python UDTF (X4), and the events→customer FK join the
testdata encodes (SURVEY.md §2.3 key list).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..registry import register
from ..sources.io import fixture_tag, load_table


@register(
    "agg_stats_moments",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)            AS qty_stddev,
           round(var_samp(l_quantity), 6)               AS qty_var,
           round(median(l_extendedprice), 6)            AS price_median,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90,
           round(avg(l_quantity), 6)                    AS qty_avg
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows="A1-stats",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance (both engines use
    ddof=1), exact interpolated median and p90.

    Round-14 (guide §2.3/§5): `F.percentile` in the grouped agg forced
    the WHOLE aggregate onto ObjectHashAggregate — every partial task
    builds a boxed value->count hashmap of the group's prices, the
    final merge re-sorts it single-threaded per group, and the codegen
    moments ride along at boxed speed. Split instead: moments stay a
    codegen HashAggregate over the unchanged scan (identical float
    sequence), and the exact percentiles come from order statistics —
    row_number over (flag, price) picks the floor/ceil ranks, then
    Spark's own Percentile interpolation, `(higher - position) * lower
    + (position - lower) * higher` with `position = p * (n-1)`, is
    applied verbatim so the doubles are bit-identical (verified: full
    row equality vs the agg form at sf0.1, and the DuckDB oracle at
    both SFs). 2178 -> 931 ms warm. At 100 TB both forms bottleneck on
    one task per group (3 groups) — switch to `approx_percentile`
    (t-digest, mergeable partials) there; kept exact for the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    # round-15 ADVICE fix: F.percentile ignores NULLs, but row_number
    # ranks them (nulls first) and count() would include them — filter
    # non-null so the order statistics keep F.percentile's semantics on
    # a corpus that ever carries NULL prices (TPC-H has none, so the
    # oracle hash is unchanged; the predicate pushes to the scan).
    src = li.select("l_returnflag", "l_extendedprice").filter(
        F.col("l_extendedprice").isNotNull()
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    rn = src.withColumn("i", F.row_number().over(w) - 1)
    cnt = src.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    j = rn.join(F.broadcast(cnt), "l_returnflag")

    def pos(p):
        return F.lit(p) * (F.col("n") - 1).cast("double")

    sel = j.filter(
        (F.col("i") == F.floor(pos(0.5))) | (F.col("i") == F.ceil(pos(0.5)))
        | (F.col("i") == F.floor(pos(0.9))) | (F.col("i") == F.ceil(pos(0.9)))
    )
    g = sel.groupBy("l_returnflag", "n").agg(
        F.max(F.when(F.col("i") == F.floor(pos(0.5)), F.col("l_extendedprice"))).alias("lo5"),
        F.max(F.when(F.col("i") == F.ceil(pos(0.5)), F.col("l_extendedprice"))).alias("hi5"),
        F.max(F.when(F.col("i") == F.floor(pos(0.9)), F.col("l_extendedprice"))).alias("lo9"),
        F.max(F.when(F.col("i") == F.ceil(pos(0.9)), F.col("l_extendedprice"))).alias("hi9"),
    )

    def interp(p, lo, hi):
        position = pos(p)
        lower = F.floor(position).cast("double")
        higher = F.ceil(position).cast("double")
        return F.when(higher == lower, F.col(lo)).otherwise(
            (higher - position) * F.col(lo) + (position - lower) * F.col(hi)
        )

    pct = g.select(
        "l_returnflag",
        F.round(interp(0.5, "lo5", "hi5"), 6).alias("price_median"),
        F.round(interp(0.9, "lo9", "hi9"), 6).alias("price_p90"),
    )
    moments = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.avg("l_quantity"), 6).alias("qty_avg"),
    )
    return moments.join(F.broadcast(pct), "l_returnflag").select(
        "l_returnflag", "qty_stddev", "qty_var",
        "price_median", "price_p90", "qty_avg",
    )


@register(
    "json_map_functions",
    """
    SELECT event_id,
           array_to_string(json_keys(props), ',')        AS prop_keys,
           CAST(json_extract(props, '$.k') AS BIGINT)    AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events WHERE event_id < 500
    """,
    survey_rows="F6",
)
def json_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: parse props JSON once into a typed map, then project keys and
    values — the parse-once pattern (vs repeated get_json_object path
    extraction, which re-parses per call)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.filter(F.col("event_id") < 500).select(
        "event_id", F.from_json("props", "map<string,bigint>").alias("m")
    )
    return parsed.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("prop_keys"),
        F.element_at("m", "k").alias("k_val"),
        (F.element_at("m", "k") * 2).alias("k_doubled"),
    )


@register(
    "udtf_token_positions",
    """
    SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS token
    FROM documents CROSS JOIN range(1, 400) r(i)
    WHERE doc_id < 20 AND i <= len(string_split(text, ' '))
    """,
    survey_rows="X4",
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: genuine Python UDTF (row → rows) emitting (pos, token) pairs.

    Exists to exercise the UDTF surface; `posexplode` expresses the same
    thing JVM-side and is what production code should use (see
    token_counts). Restricted to 20 docs — per-row Python is the slow
    path by design."""
    from pyspark.sql.functions import udtf

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pos", LongType()),
            StructField("token", StringType()),
        ]
    )

    class SplitTokens:
        def eval(self, doc_id, text):
            for i, tok in enumerate(text.split(" "), start=1):
                yield doc_id, i, tok

    spark.udtf.register("split_tokens", udtf(SplitTokens, returnType=schema))
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.select(F.col("doc_id").alias("in_doc_id"), "text").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM _udtf_docs, LATERAL split_tokens(in_doc_id, text) t"
    )


@register(
    "events_per_segment",
    """
    SELECT c_mktsegment,
           count(*)                 AS n_events,
           round(avg(value), 6)    AS avg_value,
           count(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    survey_rows="J1,A1,A2",
)
def events_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim join over the measured events.user_id → customer FK:
    event volume per market segment (customer broadcast)."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "gapfill_hourly",
    """
    WITH bounds AS (
      SELECT (epoch_us(min(ts)) // 3600000000) * 3600 AS t0,
             (epoch_us(max(ts)) // 3600000000) * 3600 AS t1
      FROM events
    ), grid AS (
      SELECT t0 + 3600 * i AS bucket_start
      FROM bounds CROSS JOIN range(0, 2000) r(i)
      WHERE t0 + 3600 * i <= t1
    ), agg AS (
      SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket_start,
             count(*) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1
    )
    SELECT g.bucket_start,
           coalesce(a.n_events, 0)    AS n_events,
           coalesce(a.sum_value, 0.0) AS sum_value
    FROM grid g LEFT JOIN agg a USING (bucket_start)
    """,
    survey_rows="ST1,J2,F2,gapfill",
)
def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly grid (sequence between the
    corpus min/max hour) left-joined to the tumbling aggregate — empty
    buckets appear with zeros instead of being absent. Scale: the grid is
    generated from a 1-row bounds aggregate (time-range/3600 rows total);
    the join broadcasts the real aggregate, never the raw events."""
    e = load_table(spark, sf_dir, "events")
    # integer `div`, not float `/`+cast: FP rounding could shift an exact
    # hour boundary into the wrong bucket (same hazard as pane bucketing)
    bounds = e.agg(
        (F.expr("unix_micros(min(ts)) div 3600000000") * 3600).alias("t0"),
        (F.expr("unix_micros(max(ts)) div 3600000000") * 3600).alias("t1"),
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("t0"), F.col("t1"), F.lit(3600))).alias(
            "bucket_start"
        )
    )
    agg = e.groupBy(
        (F.expr("unix_micros(ts) div 3600000000") * 3600).alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return grid.join(agg, "bucket_start", "left").select(
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@register(
    "window_distribution",
    """
    SELECT event_id, user_id,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           first_value(event_id) OVER w    AS first_event,
           last_value(event_id) OVER (PARTITION BY user_id ORDER BY value, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    survey_rows="W1,W2",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2: distribution (percent_rank, cume_dist) and positional
    (first_value, full-frame last_value) window functions."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
    )


@register(
    "levenshtein_neighbors",
    """
    SELECT a.doc_id,
           levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS edit_dist,
           CAST(abs(a.n_chars - b.n_chars) AS BIGINT) AS len_diff
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id < 100
    """,
    survey_rows="F1",
)
def levenshtein_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: edit distance between consecutive documents' 30-char prefixes
    (string-similarity surface; both engines implement classic
    Wagner-Fischer so values agree exactly)."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select("doc_id", F.col("text").alias("ta"), F.col("n_chars").alias("na"))
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("text").alias("tb"),
        F.col("n_chars").alias("nb"),
    )
    return (
        a.filter(F.col("doc_id") < 100)
        .join(b, "doc_id")
        .select(
            "doc_id",
            F.levenshtein(
                F.substring("ta", 1, 30), F.substring("tb", 1, 30)
            ).cast("long").alias("edit_dist"),
            F.abs(F.col("na") - F.col("nb")).alias("len_diff"),
        )
    )


@register(
    "dq_summary",
    """
    SELECT (SELECT count(*) FROM lineitem l LEFT JOIN orders o
              ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
             AS orphan_lineitems,
           (SELECT count(*) FROM events e LEFT JOIN customer c
              ON e.user_id = c.c_custkey WHERE c.c_custkey IS NULL)
             AS orphan_events,
           (SELECT count(*) FROM (SELECT o_orderkey FROM orders
              GROUP BY 1 HAVING count(*) > 1)) AS dup_orderkeys,
           (SELECT count(*) FROM documents WHERE n_chars <> length(text))
             AS bad_nchars
    """,
    survey_rows="J3,A5,quality",
)
def dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality scorecard: FK orphans, duplicate keys, and row-level
    invariant violations in one row (all zero on this corpus — measured
    invariants from FIXTURES.md). Composes the quality module's checks;
    each is an anti join or aggregate, so the scorecard runs at corpus
    scale as a handful of shuffles."""
    from .. import quality
    from pyspark.sql import functions as F2

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")
    counts = [
        quality.fk_orphans(li, "l_orderkey", o, "o_orderkey")
        .agg(F2.count(F2.lit(1)).alias("orphan_lineitems")),
        quality.fk_orphans(e, "user_id", c, "c_custkey")
        .agg(F2.count(F2.lit(1)).alias("orphan_events")),
        quality.duplicate_keys(o, ["o_orderkey"])
        .agg(F2.count(F2.lit(1)).alias("dup_orderkeys")),
        quality.range_violations(d, F2.col("n_chars") == F2.length("text"))
        .agg(F2.count(F2.lit(1)).alias("bad_nchars")),
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.crossJoin(df)
    return out


@register(
    "stratified_sample",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN substr(md5(doc_id::VARCHAR), 1, 4) < '4000'
               ELSE TRUE END
    """,
    survey_rows="P2,sampling",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling via deterministic hash-mod: downsample the
    dominant language to ~25% (md5 prefix < 0x4000 = 16384/65536), keep
    rare strata whole — the class-balancing primitive for training-data
    curation. Hash-mod instead of RNG `sampleBy` keeps the pick set
    identical across engines, runs, and partition layouts, so a resumed or
    re-sharded 100 TB job selects exactly the same documents."""
    d = load_table(spark, sf_dir, "documents")
    en_keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < "4000"
    return d.filter(
        F.when(F.col("lang") == "en", en_keep).otherwise(F.lit(True))
    ).select("doc_id", "lang", "source")


@register(
    "sql_scalar_function",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem WHERE l_orderkey < 50
    """,
    survey_rows="S4,X-sqludf,P1",
)
def sql_scalar_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (CREATE TEMPORARY FUNCTION ... RETURN expr): the
    user-extensible function surface that stays fully JVM-side — the
    function body is inlined by the analyzer, so unlike Python UDFs it
    costs nothing at 100 TB. Oracle inlines the same expression."""
    from ..sources.io import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION charged_price(
               price DOUBLE, disc DOUBLE, tax DOUBLE)
           RETURNS DOUBLE RETURN price * (1 - disc) * (1 + tax)"""
    )
    return spark.sql(
        """SELECT l_orderkey, l_linenumber,
                  charged_price(l_extendedprice, l_discount, l_tax) AS charged
           FROM lineitem WHERE l_orderkey < 50"""
    )


@register(
    "agg_argminmax_mode",
    """
    SELECT o.o_orderstatus,
           arg_max(o.o_orderkey, o.o_totalprice) AS priciest_order,
           arg_min(o.o_orderkey, o.o_totalprice) AS cheapest_order,
           md.top_priority                       AS top_priority,
           round(max(o.o_totalprice), 2)         AS max_price
    FROM orders o
    JOIN (
      SELECT o_orderstatus, o_orderpriority AS top_priority
      FROM (
        SELECT o_orderstatus, o_orderpriority,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY count(*) DESC,
                                           o_orderpriority) AS rn
        FROM orders GROUP BY o_orderstatus, o_orderpriority
      ) WHERE rn = 1
    ) md ON o.o_orderstatus = md.o_orderstatus
    GROUP BY o.o_orderstatus, md.top_priority
    """,
    survey_rows="A1,argminmax",
)
def agg_argminmax_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+: positional aggregates — max_by/min_by (arg_max/arg_min) and
    mode. Extrema winners are verified unique per group on this corpus;
    the MODE is NOT (sf0.001 has a 111-vs-111 priority tie in status P,
    round 15), and a tied `mode()` is nondeterministic in BOTH engines
    (winner follows aggregation-map merge order, which shifts with
    machine load — observed flipping between gate runs). Pin the
    tie-break explicitly: Spark's mode(deterministic=True) returns the
    LOWEST value among the most frequent; the oracle mirrors it with
    ORDER BY count(*) DESC, value ASC. Untied groups (every group at
    sf0.01/sf0.1 and F/O at sf0.001) are unchanged."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.mode("o_orderpriority", True).alias("top_priority"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "agg_grouping_sets",
    """
    SELECT c_mktsegment, n_name,
           count(*) AS n_customers,
           GROUPING(c_mktsegment) + 2 * GROUPING(n_name) AS gid
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
    """,
    survey_rows="A4",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: explicit GROUPING SETS (neither rollup nor cube) with a
    grouping-id so NULL group markers are distinguishable from NULL data.
    Spark's grouping_id bit order is reversed vs the per-column GROUPING
    sum — the oracle composes GROUPING() bits to match."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).createOrReplaceTempView(
        "_gs_cust"
    )
    return spark.sql(
        """SELECT c_mktsegment, n_name, count(*) AS n_customers,
                  grouping(c_mktsegment) + 2 * grouping(n_name) AS gid
           FROM _gs_cust
           GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())"""
    )


@register(
    "agg_corr_regression",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)          AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4)    AS qty_price_covar,
           round(regr_slope(l_extendedprice, l_quantity), 6)    AS price_per_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS price_intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)       AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows="A1,stats",
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates: sample correlation/covariance and
    single-pass linear regression (slope/intercept/R²) per group — all
    mergeable moment computations, so they stay two-phase map-side
    partials at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "price_per_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "price_intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@register(
    "hll_sketch_rollup",
    """
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL_MERGED' AS event_type, count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events
    """,
    survey_rows="A3,sketch",
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Apache DataSketches HLL): per-event-type
    distinct-user sketches, then a SKETCH MERGE for the overall count —
    the pattern that makes 100 TB distinct-count rollups cheap: daily
    partitions keep tiny sketch blobs instead of raw IDs, and any
    cross-partition rollup is a union of sketches, never a re-scan.
    Accuracy is asserted inside the query: each row carries the exact
    count plus a boolean witness that the sketch estimate (including the
    MERGED union, which must reflect union cardinality, not the sum of
    parts) landed within 5%; the DuckDB oracle hash-checks both. The exact
    columns are oracle witnesses — production keeps only sketch blobs."""
    e = load_table(spark, sf_dir, "events")

    def ok(approx_col, exact_col):
        return (
            F.abs(approx_col.cast("double") - exact_col)
            <= F.greatest(F.lit(3.0), F.lit(0.05) * exact_col)
        ).alias("approx_ok")

    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    detail = per_type.select(
        "event_type",
        "exact_users",
        ok(F.hll_sketch_estimate("sketch"), F.col("exact_users")),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_approx")
    )
    total = (
        e.agg(F.count_distinct("user_id").alias("exact_users"))
        .crossJoin(merged)
        .select(
            F.lit("ALL_MERGED").alias("event_type"),
            "exact_users",
            ok(F.col("_approx"), F.col("exact_users")),
        )
    )
    return detail.unionByName(total)


@register(
    "kll_quantile_rollup",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS exact_median,
           round(quantile_cont(value, 0.9), 6) AS exact_p90,
           TRUE AS median_rank_ok, TRUE AS p90_rank_ok
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL_MERGED' AS event_type,
           round(quantile_cont(value, 0.5), 6) AS exact_median,
           round(quantile_cont(value, 0.9), 6) AS exact_p90,
           TRUE AS median_rank_ok, TRUE AS p90_rank_ok
    FROM events
    """,
    survey_rows="A3,sketch,ST12",
)
def kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile rollup (Apache DataSketches KLL): hourly
    per-event-type value sketches merged upward hour→type→global — the
    missing half of the sketch story next to hll_sketch_rollup, and the
    fix for the documented "medians don't chain across rollup levels"
    caveat (timeseries.py multi-resolution rollup): a KLL blob per
    rollup cell makes any coarser quantile a sketch UNION, never a
    re-scan of raw values. Two merge levels run here (kll_merge_agg over
    hourly sketches, then again over per-type sketches) to pin exactly
    the chaining the caveat rules out for exact medians.

    Witness design (same as the HLL row): each output row carries the
    EXACT interpolated median/p90 (Spark `percentile` == DuckDB
    `quantile_cont`, hash-checked) plus booleans asserting the sketch
    estimate's true rank — measured by a second scan counting values ≤
    the estimate — lands within 5% of the target rank (KLL k=200 bounds
    rank error at ~1.65% w.h.p.; 5% absorbs compaction randomness).
    Production keeps only the sketch blobs; the exact columns exist for
    the oracle."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    # union-with-relabel gives the global row the same code path as the
    # per-type rows (one grouped agg each for exact stats and ranks)
    ev2 = ev.select("event_type", "value").unionByName(
        ev.select(F.lit("ALL_MERGED").alias("event_type"), "value")
    )
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("_hr")
    ).agg(F.kll_sketch_agg_double("value").alias("sk"))
    per_type = hourly.groupBy("event_type").agg(
        F.kll_merge_agg_double("sk").alias("sk")
    )
    merged = per_type.agg(F.kll_merge_agg_double("sk").alias("sk")).select(
        F.lit("ALL_MERGED").alias("event_type"), "sk"
    )
    targets = per_type.unionByName(merged).select(
        "event_type",
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("_a50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("_a90"),
    )
    stats = (
        ev2.join(F.broadcast(targets), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 6).alias("exact_median"),
            F.round(F.percentile("value", 0.9), 6).alias("exact_p90"),
            F.avg((F.col("value") <= F.col("_a50")).cast("double")).alias("_r50"),
            F.avg((F.col("value") <= F.col("_a90")).cast("double")).alias("_r90"),
        )
    )
    return stats.select(
        "event_type",
        "exact_median",
        "exact_p90",
        (F.abs(F.col("_r50") - 0.5) <= 0.05).alias("median_rank_ok"),
        (F.abs(F.col("_r90") - 0.9) <= 0.05).alias("p90_rank_ok"),
    )


_THETA_PAIRS = [("click", "purchase"), ("signup", "purchase"), ("view", "error")]


@register(
    "theta_setops_rollup",
    """
    WITH flags AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS f_click,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS f_purchase,
             max(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS f_signup,
             max(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS f_view,
             max(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS f_error
      FROM events GROUP BY user_id
    )
    SELECT 'click' AS type_a, 'purchase' AS type_b,
           count(*) FILTER (WHERE f_click = 1 OR f_purchase = 1)  AS exact_union,
           count(*) FILTER (WHERE f_click = 1 AND f_purchase = 1) AS exact_intersect,
           count(*) FILTER (WHERE f_click = 1 AND f_purchase = 0) AS exact_diff,
           TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok
    FROM flags
    UNION ALL
    SELECT 'signup', 'purchase',
           count(*) FILTER (WHERE f_signup = 1 OR f_purchase = 1),
           count(*) FILTER (WHERE f_signup = 1 AND f_purchase = 1),
           count(*) FILTER (WHERE f_signup = 1 AND f_purchase = 0),
           TRUE, TRUE, TRUE
    FROM flags
    UNION ALL
    SELECT 'view', 'error',
           count(*) FILTER (WHERE f_view = 1 OR f_error = 1),
           count(*) FILTER (WHERE f_view = 1 AND f_error = 1),
           count(*) FILTER (WHERE f_view = 1 AND f_error = 0),
           TRUE, TRUE, TRUE
    FROM flags
    """,
    survey_rows="A3,sketch,U2",
)
def theta_setops_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA (Apache DataSketches): per-event-type
    user sketches, then union / intersection / difference cardinality
    estimates per audience pair — the capability HLL lacks (HLL merges
    unions only; Theta's KMV-style retained-sample supports A∩B and
    A\\B too). This is the 100 TB audience-overlap shape: each
    partition keeps one small sketch blob per segment, and any overlap
    question across segments is sketch algebra on k hashes — never a
    re-scan, never a user_id-level join.

    Witness design (family: hll_sketch_rollup, kll_quantile_rollup):
    rows carry the EXACT union/intersect/difference counts (hash-checked
    vs a per-user flag matrix in DuckDB) plus booleans asserting each
    sketch estimate lands within max(3, 5%) of exact. At this corpus's
    NDV (≤ ~1.5k users) the default 4096-entry sketch is in exact mode,
    so the booleans pin exactness; past 4096 the same query degrades
    gracefully to ±1.6% estimates."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    types = sorted({t for pair in _THETA_PAIRS for t in pair})
    flags = ev.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"f_{t}")
            for t in types
        ]
    )
    exact_aggs = []
    for a, b in _THETA_PAIRS:
        fa, fb = F.col(f"f_{a}"), F.col(f"f_{b}")
        exact_aggs += [
            F.count(F.when((fa == 1) | (fb == 1), True)).alias(f"u_{a}_{b}"),
            F.count(F.when((fa == 1) & (fb == 1), True)).alias(f"i_{a}_{b}"),
            F.count(F.when((fa == 1) & (fb == 0), True)).alias(f"d_{a}_{b}"),
        ]
    wide = flags.agg(*exact_aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', u_{a}_{b}, i_{a}_{b}, d_{a}_{b}" for a, b in _THETA_PAIRS
    )
    exact = wide.select(
        F.expr(
            f"stack({len(_THETA_PAIRS)}, {stack_args}) AS "
            "(type_a, type_b, exact_union, exact_intersect, exact_diff)"
        )
    )
    sk = ev.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    pairs = spark.createDataFrame(_THETA_PAIRS, "type_a string, type_b string")
    est = (
        pairs.join(
            F.broadcast(sk.select(F.col("event_type").alias("type_a"),
                                  F.col("sk").alias("_ska"))),
            "type_a",
        )
        .join(
            F.broadcast(sk.select(F.col("event_type").alias("type_b"),
                                  F.col("sk").alias("_skb"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            F.theta_sketch_estimate(F.theta_union("_ska", "_skb")).alias("_eu"),
            F.theta_sketch_estimate(F.theta_intersection("_ska", "_skb")).alias("_ei"),
            F.theta_sketch_estimate(F.theta_difference("_ska", "_skb")).alias("_ed"),
        )
    )

    def ok(approx_col, exact_col):
        return F.abs(approx_col.cast("double") - exact_col) <= F.greatest(
            F.lit(3.0), F.lit(0.05) * exact_col
        )

    return exact.join(F.broadcast(est), ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "exact_union",
        "exact_intersect",
        "exact_diff",
        ok(F.col("_eu"), F.col("exact_union")).alias("union_ok"),
        ok(F.col("_ei"), F.col("exact_intersect")).alias("intersect_ok"),
        ok(F.col("_ed"), F.col("exact_diff")).alias("diff_ok"),
    )


@register(
    "scd2_priority_history",
    """
    WITH snaps AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), versions AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM snaps WHERE chg = 1
    )
    SELECT o_custkey, o_orderpriority,
           epoch_us(o_orderdate) AS valid_from_us,
           epoch_us(lead(o_orderdate) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)) AS valid_to_us
    FROM versions
    WHERE o_custkey < 100
    """,
    survey_rows="W2,scd2",
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 built from order history: each customer's order-priority
    timeline collapsed to validity intervals (same lag-compare + lead
    idiom as pipelines.scd2_build, inlined here because the change scan
    needs a composite (date, orderkey) total order; interval endpoints
    use the same (date, orderkey) order so two priority changes on the
    same date get DETERMINISTIC version ordering — the earlier one is
    closed with valid_from == valid_to (an empty interval), never an
    ambiguous overlap — both sides of the oracle agree on that order)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = ~F.lag("o_orderpriority").over(w).eqNullSafe(F.col("o_orderpriority"))
    versions = o.withColumn("_chg", chg | F.lag("o_orderdate").over(w).isNull()).filter(
        F.col("_chg")
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        versions.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderpriority",
            F.unix_micros("o_orderdate").alias("valid_from_us"),
            F.unix_micros(F.lead("o_orderdate").over(w2)).alias("valid_to_us"),
        )
    )


@register(
    "approx_percentile_witness",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderstatus
    """,
    survey_rows="A3,sketch",
)
def approx_percentile_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-family: quantile sketch (percentile_approx — constant memory per
    group, mergeable, the 100 TB path for latency/price distributions)
    validated in-query against the exact interpolated percentile, same
    witness pattern as agg_approx_distinct: the row carries the exact
    values plus a boolean that the sketch landed within 1% of the group's
    price range, so the DuckDB oracle (quantile_cont == Spark exact
    `percentile`) hash-checks grouping, exact math, AND sketch accuracy."""
    o = load_table(spark, sf_dir, "orders")
    exact = F.expr(
        "percentile(o_totalprice, array(0.5D, 0.95D))"
    )
    approx = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
    )
    g = o.groupBy("o_orderstatus").agg(
        exact.alias("_ex"),
        approx.alias("_ap"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("_rng"),
    )
    tol = F.lit(0.01) * F.col("_rng")
    return g.select(
        "o_orderstatus",
        F.round(F.col("_ex").getItem(0), 2).alias("p50"),
        F.round(F.col("_ex").getItem(1), 2).alias("p95"),
        (
            (F.abs(F.col("_ap").getItem(0) - F.col("_ex").getItem(0)) <= tol)
            & (F.abs(F.col("_ap").getItem(1) - F.col("_ex").getItem(1)) <= tol)
        ).alias("approx_ok"),
    )


@register(
    "salted_skew_agg",
    """
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    survey_rows="A1,skew",
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation recipe as an oracle-checked query: the two-stage
    salted aggregation (operators/skew.py) — partial agg on (key, salt
    from a row-unique hash, so deterministic), final re-agg on key — must
    produce EXACTLY the plain GROUP BY answer. This is the recipe for a
    hot group key whose single reducer would otherwise bottleneck a
    100 TB aggregation; n_users rides along as a salted partial
    count-distinct (distinct user sets are disjoint across salt only
    after the per-(key,salt) collect_set union — here sum of partial
    distincts would be WRONG, so the final stage unions sets and sizes
    them, the subtlety worth proving against an oracle).

    Float note: value sums combine per-(key,salt) partials then re-sum —
    2dp rounding after the two-level tree absorbs ordering drift (same
    argument as the pane-optimized sliding window)."""
    from .skew import salted_grouped_agg

    e = load_table(spark, sf_dir, "events")
    out = salted_grouped_agg(
        e,
        key="event_type",
        row_id="event_id",
        aggs=[
            F.count(F.lit(1)).alias("pn"),
            F.sum("value").alias("ps"),
            F.collect_set("user_id").alias("pu"),
        ],
        reaggs=[
            F.sum("pn").alias("n_events"),
            F.round(F.sum("ps"), 2).alias("sum_value"),
            F.size(F.array_distinct(F.flatten(F.collect_list("pu")))).cast(
                "long"
            ).alias("n_users"),
        ],
    )
    return out


@register(
    "salted_join_enrich",
    """
    SELECT o.o_orderpriority, count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    survey_rows="J1,skew",
)
def salted_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated JOIN as an oracle-checked query (the join-side
    sibling of salted_skew_agg): lineitem→orders enrichment routed
    through skew.salted_join — facts get a deterministic salt from a
    row-unique column, the dim side replicates n_salt×, the shuffle key
    becomes (key, salt) so ONE hot order key spreads over n_salt
    reducers — and the result must equal the plain join exactly. This is
    the recipe for when AQE's skew splitting can't help (the skewed side
    feeds a single reducer from a shuffle AQE already coalesced, or the
    skew is in a broadcast-ineligible dim)."""
    from .skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, key="l_orderkey", row_id="l_linenumber")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@register(
    "histogram_equidepth",
    """
    WITH r AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER () AS n
      FROM orders)
    SELECT (rn - 1) * 8 // n + 1 AS bucket, count(*) AS n_rows,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM r GROUP BY 1
    """,
    survey_rows="A9,W1",
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram — the A9 sibling where
    bucket BOUNDARIES adapt to the distribution (what optimizers store
    as quantile stats). bucket = floor((rank-1)·k/n)+1 from the exact
    global rank, NOT ntile(), whose unpartitioned window would funnel
    the corpus through one task: the rank comes from
    rank.with_global_rank (range shuffle + broadcast offsets — same
    recipe as sorted-neighborhood ER), the total count from a 1-row
    broadcast aggregate, and the DuckDB oracle uses the identical
    closed-form bucket assignment."""
    from .rank import with_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    ranked = with_global_rank(o, ["o_totalprice", "o_orderkey"])
    total = o.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            (F.expr("(rn - 1) * 8 div n") + 1).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "scd2_pointintime_join",
    """
    WITH snaps AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), versions AS (
      SELECT o_custkey, o_orderpriority,
             epoch_us(o_orderdate) AS valid_from_us,
             epoch_us(lead(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey)) AS valid_to_us
      FROM snaps WHERE chg = 1
    )
    SELECT e.event_id, e.user_id,
           coalesce(v.o_orderpriority, 'NONE') AS priority_at_event
    FROM events e
    LEFT JOIN versions v
      ON e.user_id = v.o_custkey
     AND epoch_us(e.ts) >= v.valid_from_us
     AND (v.valid_to_us IS NULL OR epoch_us(e.ts) < v.valid_to_us)
    WHERE e.user_id < 100
    """,
    survey_rows="J9,scd2,J2,F2",
)
def scd2_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension lookup: each event joined to the
    SCD2 priority version VALID AT its timestamp — the warehouse pattern
    for "what did the dimension say when the fact happened" (and the
    training-data analogue: feature-store time travel, no leakage from
    future versions).

    Shape: equi-key on the entity id carries the hash join; the validity
    range rides as a residual filter — never a nested loop, and per-key
    version counts are small (bounded fan-out). Events before the first
    version keep the row with 'NONE' (left join): silent drops would bias
    any downstream aggregate. At 100 TB: identical plan, dimension side
    is |entities|x|versions| (usually broadcastable); if version churn is
    extreme, bin by validity month exactly like the interval join."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    chg = ~F.lag("o_orderpriority").over(w).eqNullSafe(F.col("o_orderpriority"))
    versions = (
        o.withColumn("_chg", chg | F.lag("o_orderdate").over(w).isNull())
        .filter(F.col("_chg"))
        .select(
            "o_custkey",
            "o_orderpriority",
            F.unix_micros("o_orderdate").alias("valid_from_us"),
            F.unix_micros(F.lead("o_orderdate").over(w2)).alias("valid_to_us"),
        )
    )
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 100)
        .select("event_id", "user_id", F.unix_micros("ts").alias("_us"))
    )
    cond = (
        (e.user_id == versions.o_custkey)
        & (F.col("_us") >= F.col("valid_from_us"))
        & (F.col("valid_to_us").isNull() | (F.col("_us") < F.col("valid_to_us")))
    )
    return e.join(versions, cond, "left").select(
        "event_id",
        "user_id",
        F.coalesce("o_orderpriority", F.lit("NONE")).alias("priority_at_event"),
    )


# Efraimidis–Spirakis key expression, written once and used VERBATIM on
# both engines (only portable functions: md5, substr, instr, power, ln).
# u = 8 md5 hex digits mapped into (0,1) + 16^-9 (never exactly 0, so ln
# is defined); key = -ln(u)/weight — the k smallest keys are a
# probability-proportional-to-size sample without replacement.
_PPS_U = (
    "("
    + " + ".join(
        f"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), {i}, 1)) - 1)"
        f" * power(16.0, -{i})"
        for i in range(1, 9)
    )
    + " + power(16.0, -9))"
)
_PPS_KEY = f"(-ln({_PPS_U}) / n_chars)"


@register(
    "orc_ingest_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
    survey_rows="S2,S3,A1",
)
def orc_ingest_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3 ORC leg, oracle-checked end-to-end: the supplier table is
    written to ORC (write_orc) and read back with its pinned schema
    (read_orc), and the aggregate over the ORC copy must hash-match the
    DuckDB oracle running on the ORIGINAL parquet — proving the format
    roundtrip preserves every value (decimals, strings, keys) bit-for-bit.

    The ORC copy is materialized once per (tmpdir, sf) and reused; at
    scale this is the 'same engine, second columnar format' ingestion
    path — the vectorized ORC reader keeps predicate pushdown and column
    pruning like parquet."""
    import tempfile

    from .. import schemas
    from ..sources.io import read_orc, write_orc

    tag = fixture_tag(sf_dir)
    orc_path = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_orc", tag, "supplier"
    )
    if not os.path.exists(os.path.join(orc_path, "_SUCCESS")):
        write_orc(load_table(spark, sf_dir, "supplier"), orc_path)
    s = read_orc(spark, orc_path, schemas.TABLES["supplier"])
    return s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "jdbc_ingest_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
    survey_rows="S2,A1",
)
def jdbc_ingest_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 JDBC leg (round-11 — closes the verdict's 'no JDBC driver in
    the container': Spark ships the embedded Derby engine in its own
    jars), oracle-checked end-to-end: the supplier table is written to
    a Derby database THROUGH Spark's JDBC sink once per fixture, read
    back as a PARTITIONED parallel extraction (one bounded query per
    task on s_suppkey — the 100 TB ingest shape), and the aggregate
    over the JDBC copy must hash-match the DuckDB oracle on the
    ORIGINAL parquet — proving the database roundtrip preserves every
    value. Filter/column pushdown into the database is pinned in
    tests/test_jdbc.py; the same reader speaks to any RDBMS by
    switching url/driver.

    Contention-proof (round-12, closes the round-11 verdict's only
    defect): embedded Derby permits ONE JVM per database directory and
    holds the boot lock for the owning JVM's lifetime, so a fixture dir
    keyed on content alone fails with 'Failed to start database' the
    moment a second JVM (check_oracle concurrent with pytest — the
    repo's own documented ritual) touches the same key. The directory
    key is therefore (content tag, Spark applicationId): every JVM
    owner seeds and boots its OWN database (supplier is dimension-sized
    at gate SFs, so the extra seed is milliseconds), and no two JVMs
    can ever race on a Derby boot lock. Lockfile+retry was rejected:
    the first JVM holds the db booted until exit, so a waiter would
    block for an entire pytest session, not a bounded retry window.
    Regression: tests/test_jdbc.py boots a second SparkSession in a
    subprocess against the same content key while this session's
    database stays booted."""
    import re
    import tempfile

    from ..sources.jdbc import derby_url, read_jdbc, write_jdbc

    tag = fixture_tag(sf_dir)
    app = re.sub(r"[^A-Za-z0-9_.-]", "_", spark.sparkContext.applicationId)
    root = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_jdbc", f"{tag}-{app}"
    )
    marker = os.path.join(root, "_seeded")
    url = derby_url(os.path.join(root, "db"))
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        write_jdbc(s, url, "supplier", num_partitions=1)
        with open(marker, "w"):
            pass
    lo, hi = s.agg(
        F.min("s_suppkey").alias("lo"), F.max("s_suppkey").alias("hi")
    ).head()[:2]
    j = read_jdbc(
        spark, url, "supplier",
        partition_column="s_suppkey", lower=int(lo), upper=int(hi) + 1,
        num_partitions=4,
    )
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


def _delta_fixture_root(spark, sf_dir: str, name: str) -> str:
    """Per-(content, JVM) fixture root for Delta-log gate tables — the
    same double key as the Derby fixture (round-12): Delta's log is
    single-writer by design here, and two concurrent JVMs seeding the
    same content key would interleave commits."""
    import re
    import tempfile

    tag = fixture_tag(sf_dir)
    app = re.sub(r"[^A-Za-z0-9_.-]", "_", spark.sparkContext.applicationId)
    return os.path.join(
        tempfile.gettempdir(), "novelti_dingo_delta", f"{tag}-{app}", name
    )


@register(
    "delta_ingest_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
    survey_rows="S2,S3,A1",
)
def delta_ingest_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3 Delta-log leg (round-12 — closes the round-11 verdict's
    missing #2: open-table-format interop without delta jars): the
    supplier table is committed to a Delta table through the clean-room
    public-protocol writer (sources/delta_log.py — JSON commit with
    protocol/metaData/add actions over plain parquet), read back by
    REPLAYING THE TRANSACTION LOG (active file set from add/remove
    reconciliation, schema from the log's schemaString — no directory
    listing), and the aggregate over the Delta copy must hash-match the
    DuckDB oracle on the ORIGINAL parquet: the table-format roundtrip
    preserves every value bit-for-bit. Time travel, overwrite
    semantics, and log-level partition pruning are pinned in
    tests/test_delta.py."""
    from ..sources.delta_log import read_delta_table, write_delta_table

    base = _delta_fixture_root(spark, sf_dir, "supplier")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s, base)
    d = read_delta_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_time_travel_agg",
    """
    SELECT 'v0' AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier WHERE s_suppkey % 2 = 0
    UNION ALL
    SELECT 'latest' AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier
    """,
    survey_rows="S2,S5,U1,A5",
)
def delta_time_travel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta TIME TRAVEL through the clean-room log reader: commit 0
    holds the even-suppkey half of supplier, commit 1 appends the odd
    half; reading `version=0` replays only the first commit's add
    actions while the versionless read resolves the full table — both
    snapshots aggregated side by side and hash-matched against DuckDB
    computing the same two states from the source parquet. This is the
    log-replay semantics doing real work: same table path, two
    different consistent file sets."""
    from ..sources.delta_log import read_delta_table, write_delta_table

    base = _delta_fixture_root(spark, sf_dir, "supplier_tt")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s.filter(F.col("s_suppkey") % 2 == 0), base)
        write_delta_table(
            s.filter(F.col("s_suppkey") % 2 == 1), base, mode="append"
        )
    v0 = read_delta_table(spark, base, version=0)
    latest = read_delta_table(spark, base)

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        ).select(F.lit(snap).alias("snap"), "n", "bal")

    return agg(v0, "v0").unionAll(agg(latest, "latest"))


@register(
    "delta_partition_pruned_agg",
    """
    SELECT count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal,
           round(avg(s_acctbal), 6) AS avg_bal
    FROM supplier WHERE s_nationkey = 3
    """,
    survey_rows="S2,S5,S7,A5",
)
def delta_partition_pruned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-level PARTITION PRUNING on a Delta table: supplier committed
    partitioned by s_nationkey (partition values live in the adds'
    partitionValues, NOT in the data files — the spec's contract), and
    the read passes partition_filter={'s_nationkey': 3}, so the file
    list is pruned DRIVER-SIDE from the log before any scan is planned:
    the parquet scan opens exactly nation 3's files. The typed
    partition column is re-injected from the log values; the aggregate
    hash-matches DuckDB filtering the original parquet."""
    from ..sources.delta_log import read_delta_table, write_delta_table

    base = _delta_fixture_root(spark, sf_dir, "supplier_part")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s, base, partition_by=["s_nationkey"])
    d = read_delta_table(
        spark, base, partition_filter={"s_nationkey": 3}
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        F.round(F.avg("s_acctbal"), 6).alias("avg_bal"),
    )


@register(
    "iceberg_ingest_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
    survey_rows="S2,S3,A1",
)
def iceberg_ingest_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3 Iceberg leg (round-12, the second open-table-format beside
    delta_ingest_agg): supplier committed as a format-v2 Iceberg table
    through the clean-room writer (sources/iceberg.py — metadata.json +
    manifest-list/manifest Avro via the repo's own Avro codec), read
    back by resolving the FULL metadata chain driver-side (snapshot →
    manifest list → manifests → live parquet files; no directory
    listing, no Iceberg jars), and the aggregate must hash-match the
    DuckDB oracle on the ORIGINAL parquet. Snapshot time travel,
    overwrite semantics, and manifest-level partition pruning are
    pinned in tests/test_iceberg.py."""
    from ..sources.iceberg import read_iceberg_table, write_iceberg_table

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s, base)
    d = read_iceberg_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "iceberg_time_travel_agg",
    """
    SELECT 'v0' AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier WHERE s_suppkey % 2 = 0
    UNION ALL
    SELECT 'latest' AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier
    """,
    survey_rows="S2,S5,U1,A5",
)
def iceberg_time_travel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg SNAPSHOT time travel: commit 1 = the even-suppkey half,
    commit 2 appends the odd half (its manifest list references the
    first commit's manifest plus its own — the spec's append shape);
    reading the FIRST snapshot id resolves only the original manifest
    while the current read resolves both. Both states aggregated side
    by side, hash-matched against DuckDB recomputing them from the
    source parquet."""
    from ..sources.iceberg import (
        iceberg_snapshots,
        read_iceberg_table,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_tt")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s.filter(F.col("s_suppkey") % 2 == 0), base)
        write_iceberg_table(
            s.filter(F.col("s_suppkey") % 2 == 1), base, mode="append"
        )
    first = iceberg_snapshots(base)[0]["snapshot_id"]
    v0 = read_iceberg_table(spark, base, snapshot_id=first)
    latest = read_iceberg_table(spark, base)

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        ).select(F.lit(snap).alias("snap"), "n", "bal")

    return agg(v0, "v0").unionAll(agg(latest, "latest"))


@register(
    "iceberg_partition_pruned_agg",
    """
    SELECT count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal,
           round(avg(s_acctbal), 6) AS avg_bal
    FROM supplier WHERE s_nationkey = 3
    """,
    survey_rows="S2,S5,S7,A5",
)
def iceberg_partition_pruned_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MANIFEST-level partition pruning on an Iceberg table: supplier
    committed partitioned by s_nationkey (identity transform; one data
    file per partition tuple, per-file partition record in the
    manifest), read with partition_filter={'s_nationkey': 3} — the
    manifest entries prune the file list DRIVER-SIDE, so the parquet
    scan opens exactly nation 3's files. Iceberg data files CONTAIN
    their partition columns (spec contract, unlike hive layouts), so
    no value injection is needed; hash-matched against DuckDB filtering
    the source parquet."""
    from ..sources.iceberg import read_iceberg_table, write_iceberg_table

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_part")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s, base, partition_by=["s_nationkey"])
    d = read_iceberg_table(
        spark, base, partition_filter={"s_nationkey": 3}
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        F.round(F.avg("s_acctbal"), 6).alias("avg_bal"),
    )


@register(
    "lake_export_delta_agg",
    """
    SELECT 'v1' AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier WHERE s_suppkey % 2 = 0
    UNION ALL
    SELECT 'v2' AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier
    """,
    survey_rows="S2,S3,S5,U1,A5",
)
def lake_export_delta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EGRESS interop: the repo's OWN versioned lake (publish_versioned
    — v=N dirs + LATEST pointer) exports to a Delta table version for
    version (export_versioned_lake_to_delta), and a stock Delta-reading
    consumer gets the same time-travel surface: lake v=1 (even-suppkey
    half) ↔ delta version 0, lake v=2 (full supplier) ↔ delta version
    1. Both exported snapshots aggregated through the DELTA reader and
    hash-matched against DuckDB computing the same states from the
    source parquet — the full publish → export → foreign-read chain is
    value-exact."""
    from ..pipelines import publish_versioned
    from ..sources.delta_log import (
        export_versioned_lake_to_delta,
        read_delta_table,
    )

    root = _delta_fixture_root(spark, sf_dir, "lake_export")
    lake = os.path.join(root, "lake")
    delta = os.path.join(root, "delta")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(delta, "_delta_log")):
        publish_versioned(s.filter(F.col("s_suppkey") % 2 == 0), lake)
        publish_versioned(s, lake)
        export_versioned_lake_to_delta(spark, lake, delta)
    v1 = read_delta_table(spark, delta, version=0)
    v2 = read_delta_table(spark, delta, version=1)

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        ).select(F.lit(snap).alias("snap"), "n", "bal")

    return agg(v1, "v1").unionAll(agg(v2, "v2"))


@register(
    "lake_export_iceberg_agg",
    """
    SELECT 'v1' AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier WHERE s_suppkey % 2 = 0
    UNION ALL
    SELECT 'v2' AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier
    """,
    survey_rows="S2,S3,S5,U1,A5",
)
def lake_export_iceberg_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EGRESS interop, Iceberg twin of lake_export_delta_agg (round-13
    — the round-12 verdict's #3 item): the repo's OWN versioned lake
    exports to an Iceberg table version for snapshot
    (export_versioned_lake_to_iceberg), and a stock Iceberg-reading
    consumer gets the same time-travel surface: lake v=1 (even-suppkey
    half) ↔ snapshot 0, lake v=2 (full supplier) ↔ snapshot 1. Both
    exported snapshots aggregated through the ICEBERG reader (snapshot
    time travel) and hash-matched against DuckDB computing the same
    states from the source parquet — publish → export → foreign-read,
    value-exact."""
    from ..pipelines import publish_versioned
    from ..sources.iceberg import (
        export_versioned_lake_to_iceberg,
        iceberg_snapshots,
        read_iceberg_table,
    )

    root = _delta_fixture_root(spark, sf_dir, "lake_export_ice")
    lake = os.path.join(root, "lake")
    ice = os.path.join(root, "iceberg")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(ice, "metadata")):
        publish_versioned(s.filter(F.col("s_suppkey") % 2 == 0), lake)
        publish_versioned(s, lake)
        export_versioned_lake_to_iceberg(spark, lake, ice)
    snaps = [h["snapshot_id"] for h in iceberg_snapshots(ice)]
    v1 = read_iceberg_table(spark, ice, snapshot_id=snaps[0])
    v2 = read_iceberg_table(spark, ice, snapshot_id=snaps[1])

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        ).select(F.lit(snap).alias("snap"), "n", "bal")

    return agg(v1, "v1").unionAll(agg(v2, "v2"))


@register(
    "iceberg_row_delete_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier WHERE s_suppkey % 3 <> 0
    GROUP BY s_nationkey
    """,
    survey_rows="S2,S5,A1",
)
def iceberg_row_delete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 POSITION deletes end-to-end (round-12 second pass — the
    refusal turned into capability): supplier committed as an Iceberg
    table, every s_suppkey%3=0 row deleted MERGE-ON-READ via a
    position-delete commit (delete_rows_from_iceberg_table — a
    (file_path, pos) parquet under a content=1 manifest; data files
    untouched), and the aggregate over the post-delete read — which
    applies the deletes as one distributed anti-join on
    (file, _metadata.row_index) — must hash-match DuckDB filtering the
    source parquet with the same predicate. Older snapshots still read
    the full table (pinned in tests/test_iceberg.py)."""
    from ..sources.iceberg import (
        delete_rows_from_iceberg_table,
        read_iceberg_table,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_del")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s, base)
        delete_rows_from_iceberg_table(spark, base, "s_suppkey % 3 = 0")
    d = read_iceberg_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_deletion_vector_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    WHERE s_suppkey % 3 <> 0 AND s_suppkey % 7 <> 0
    GROUP BY s_nationkey
    """,
    survey_rows="S2,S5,A1",
)
def delta_deletion_vector_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION VECTORS end-to-end (round-13 — the round-12 verdict's
    #2 item): supplier committed as a multi-file Delta table, rows
    deleted MERGE-ON-READ twice through delete_rows_from_delta_table —
    each commit re-adds the affected files with a roaring-bitmap DV
    descriptor (clean-room portable-format codec, sources/roaring.py;
    storageType 'u' .bin file with CRC-checked framing) and upgrades
    the protocol to v3/deletionVectors; the SECOND delete must MERGE
    into the first file's bitmaps (spec: a new DV supersedes, never
    increments). The read applies each file's decoded ordinals as one
    broadcast anti-join on (basename, _metadata.row_index) and the
    aggregate hash-matches DuckDB filtering the source parquet with
    both predicates. Storage variants ('i' inline z85 / 'p' absolute),
    checkpoint carry-through, and partitioned composition are pinned
    in tests/test_delta.py."""
    from ..sources.delta_log import (
        delete_rows_from_delta_table,
        read_delta_table,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "supplier_dv")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s.repartition(4), base)
        delete_rows_from_delta_table(spark, base, "s_suppkey % 3 = 0")
        delete_rows_from_delta_table(spark, base, "s_suppkey % 7 = 0")
    d = read_delta_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_dv_compaction_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    WHERE s_suppkey % 3 <> 0
    GROUP BY s_nationkey
    """,
    survey_rows="S2,S3,S5,A1",
)
def delta_dv_compaction_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE over merge-on-read deletes (round-13): supplier as a
    multi-file Delta table, rows DV-deleted, then COMPACTED —
    compact_delta_table rewrites only the DV-bearing files without
    their deleted rows and commits remove + plain adds, so the current
    snapshot scans with NO anti-join (the plan the post-compaction
    reader gets is the plain pruned multi-file scan). The aggregate
    over the compacted table hash-matches DuckDB filtering the source
    parquet — the delete→compact rewrite is value-exact. Pre-compaction
    time travel still applying the DVs is pinned in
    tests/test_delta.py."""
    from ..sources.delta_log import (
        compact_delta_table,
        delete_rows_from_delta_table,
        read_delta_table,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "supplier_dv_opt")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s.repartition(4), base)
        delete_rows_from_delta_table(spark, base, "s_suppkey % 3 = 0")
        compact_delta_table(spark, base)
    d = read_delta_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_vacuum_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    WHERE s_suppkey % 3 <> 0
    GROUP BY s_nationkey
    """,
    survey_rows="S2,S3,S5,A1",
)
def delta_vacuum_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL merge-on-read lifecycle, reclaimed (round-13): write →
    DV delete → OPTIMIZE → VACUUM(retain 0). The vacuum physically
    deletes the superseded originals and the deletion-vector .bin; the
    aggregate over what remains on disk must still hash-match DuckDB
    filtering the source parquet — value-exactness survives every
    lifecycle step including physical reclamation. The fixture asserts
    the vacuum actually removed files (a no-op vacuum would silently
    pass the hash). Loud pre-horizon time-travel failure is pinned in
    tests/test_delta.py."""
    from ..sources.delta_log import (
        compact_delta_table,
        delete_rows_from_delta_table,
        read_delta_table,
        vacuum_delta_table,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "supplier_dv_vac")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s.repartition(4), base)
        delete_rows_from_delta_table(spark, base, "s_suppkey % 3 = 0")
        compact_delta_table(spark, base)
        gone = vacuum_delta_table(spark, base, retain_versions=0)
        assert gone, "vacuum reclaimed nothing — fixture is wrong"
    d = read_delta_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "iceberg_expire_snapshots_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    WHERE s_suppkey % 2 = 0
    GROUP BY s_nationkey
    """,
    survey_rows="S2,S3,S5,A1",
)
def iceberg_expire_snapshots_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """expireSnapshots end-to-end (round-13, the Iceberg reclamation
    twin): full supplier committed, then OVERWRITTEN by its even half,
    then all but the newest snapshot expired — the old snapshot's data
    files and manifests are physically deleted and the metadata swap
    drops its id. The aggregate over the surviving table must
    hash-match DuckDB computing the even half from the source parquet;
    the fixture asserts files were actually reclaimed. Expired-id
    refusal is pinned in tests/test_iceberg.py."""
    from ..sources.iceberg import (
        expire_iceberg_snapshots,
        read_iceberg_table,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_expire")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s, base)
        write_iceberg_table(
            s.filter(F.col("s_suppkey") % 2 == 0), base, mode="overwrite"
        )
        gone = expire_iceberg_snapshots(base, retain_last=1)
        assert gone, "expire reclaimed nothing — fixture is wrong"
    d = read_iceberg_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "iceberg_hidden_partition_agg",
    """
    SELECT count(*) AS n, round(sum(s_acctbal), 2) AS bal,
           min(s_name) AS nm
    FROM supplier WHERE s_suppkey = 13
    """,
    survey_rows="S2,S5,S7",
)
def iceberg_hidden_partition_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HIDDEN PARTITIONING (round-13): supplier committed with
    partition_by=['bucket(4, s_suppkey)'] — the spec's bucket transform
    over the clean-room murmur3 pinned against the Iceberg spec's own
    Appendix-B hash vectors — and read back with a filter ON THE SOURCE
    COLUMN (partition_filter={'s_suppkey': 13}): the reader applies the
    transform to the filter value and prunes the manifest to the one
    bucket's files, the user never names the function. The residual
    in-bucket filter + aggregate hash-matches DuckDB filtering the
    source parquet — a wrong hash (wrong bucket pruned) loses the row
    and fails the gate. File-exact pruning is pinned in
    tests/test_iceberg.py."""
    from ..sources.iceberg import read_iceberg_table, write_iceberg_table

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_hidden")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(
            s, base, partition_by=["bucket(4, s_suppkey)"]
        )
    d = read_iceberg_table(
        spark, base, partition_filter={"s_suppkey": 13}
    )
    return d.filter(F.col("s_suppkey") == 13).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
        F.min("s_name").alias("nm"),
    )


@register(
    "delta_column_mapping_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal,
           min(s_name) AS first_name
    FROM supplier GROUP BY s_nationkey
    """,
    survey_rows="S2,S5,A1",
)
def delta_column_mapping_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN MAPPING (round-14 — the round-13 verdict's #2: any
    managed Delta table that ever renamed or dropped a column is
    minReaderVersion 2, the most common real-world table the reader
    refused): supplier committed with column_mapping='id' — every
    parquet footer carries uuid physicalNames + parquet field-ids, the
    log schema carries delta.columnMapping.{id,physicalName} per field
    — then s_acctbal is RENAMED to account_balance (a metadata-only
    commit, zero data files touched: the rename capability the mapping
    exists for), and the upper-suppkey half is APPENDED under the
    post-rename logical schema (routing through the recorded mapping),
    so the two commits' union is exactly supplier. The read scans by
    physical name and projects back to the logical names; the
    aggregate sums the renamed column, so the oracle over the plain
    supplier parquet hash-fails a wrong physical→logical projection
    (scrambled columns), a broken rename (column vanishes), or an
    append that bypassed the mapping (nulls). Physical footers,
    metadata-only rename, and DV/OPTIMIZE composition are pinned in
    tests/test_delta.py."""
    from ..sources.delta_log import (
        read_delta_table,
        rename_delta_column,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "delta_supplier_cm")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        half = s.agg(F.expr("percentile(s_suppkey, 0.5)")).head()[0]
        write_delta_table(
            s.filter(F.col("s_suppkey") <= half), base,
            column_mapping="id",
        )
        rename_delta_column(base, "s_acctbal", "account_balance")
        write_delta_table(
            s.filter(F.col("s_suppkey") > half)
            .withColumnRenamed("s_acctbal", "account_balance"),
            base,
            mode="append",
        )
    d = read_delta_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("account_balance"), 2).alias("total_bal"),
        F.min("s_name").alias("first_name"),
    )


@register(
    "delta_cdf_agg",
    """
    WITH changes AS (
      SELECT 'insert' AS change_type, s_suppkey % 2 AS commit_version,
             s_acctbal
      FROM supplier
      UNION ALL
      SELECT 'delete', 2, s_acctbal FROM supplier WHERE s_nationkey < 5
    )
    SELECT change_type, commit_version, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM changes GROUP BY change_type, commit_version
    """,
    survey_rows="S2,ST14,A1,change-data-feed",
)
def delta_cdf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta CHANGE DATA FEED interop (round-14 — the round-13
    verdict's #3), composed with COLUMN MAPPING: a CDF-enabled mapped
    table takes three commits — v0 inserts the even-suppkey half, v1
    appends the odd half, v2 row-level-deletes every s_nationkey<5 row
    merge-on-read (deletion vectors + a `cdc` action recording the
    victim rows under _change_data/). read_delta_change_feed(0, 2)
    replays: v0/v1's inserts DERIVED from their dataChange adds (the
    spec's derivation rule — no cdc actions needed for blind appends)
    and v2's deletes from its cdc file (derivation would be WRONG
    there: the DV commit's remove+add pair looks like a whole-file
    rewrite, which is exactly why the writer records cdc actions). The
    oracle reconstructs the same (change_type, commit_version) multiset
    declaratively; the hash match fails if changes are lost,
    duplicated, mis-tagged, or attributed to the wrong commit. The
    lake→Delta-CDF egress replaying pipelines.table_changes verbatim
    is pinned in tests/test_delta.py."""
    from ..sources.delta_log import (
        delete_rows_from_delta_table,
        read_delta_change_feed,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "delta_supplier_cdf")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(
            s.filter(F.col("s_suppkey") % 2 == 0), base,
            column_mapping="name", enable_change_feed=True,
        )
        write_delta_table(
            s.filter(F.col("s_suppkey") % 2 == 1), base, mode="append"
        )
        delete_rows_from_delta_table(spark, base, "s_nationkey < 5")
    feed = read_delta_change_feed(spark, base, 0, 2)
    return feed.groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_update_agg",
    """
    WITH changes AS (
      SELECT 'update_preimage' AS change_type, s_acctbal
      FROM supplier WHERE s_nationkey < 5
      UNION ALL
      SELECT 'update_postimage', s_acctbal + 1000
      FROM supplier WHERE s_nationkey < 5
    )
    SELECT change_type, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM changes GROUP BY change_type
    """,
    survey_rows="S2,ST14,A1,change-data-feed",
)
def delta_update_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOR UPDATE + the full CDF change-type vocabulary (round-14):
    supplier becomes a CDF-enabled COLUMN-MAPPED Delta table, then
    every s_nationkey<5 row gets s_acctbal += 1000 through
    update_delta_table_rows — ONE commit carrying deletion vectors
    over the old rows, a new data file with the updated rows, and
    update_preimage/update_postimage cdc actions (the two change types
    delete/insert commits can't produce). The gate aggregates the
    change feed of that single commit per change_type: the preimage
    line must reproduce the ORIGINAL balances and the postimage line
    the shifted ones — a feed that replays the post-update state for
    the preimage (or vice versa), loses rows, or double-counts the DV
    add/remove pair hash-fails. Atomic single-commit visibility,
    partitioned updates, compaction-after-update, and the
    partition-column refusal are pinned in tests/test_delta.py."""
    from ..sources.delta_log import (
        read_delta_change_feed,
        update_delta_table_rows,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "delta_supplier_upd")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(
            s, base, column_mapping="name", enable_change_feed=True
        )
        update_delta_table_rows(
            spark, base, "s_nationkey < 5",
            {"s_acctbal": "s_acctbal + 1000"},
        )
    feed = read_delta_change_feed(spark, base, 1, 1)
    return feed.groupBy(
        F.col("_change_type").alias("change_type")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_merge_agg",
    """
    WITH changes AS (
      SELECT 'update_preimage' AS change_type, s_acctbal
      FROM supplier WHERE s_nationkey < 10
      UNION ALL
      SELECT 'update_postimage', s_acctbal + 5000
      FROM supplier WHERE s_nationkey < 10
      UNION ALL
      SELECT 'insert', s_acctbal FROM supplier WHERE s_nationkey >= 20
    )
    SELECT change_type, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM changes GROUP BY change_type
    """,
    survey_rows="S2,ST14,A1,change-data-feed",
)
def delta_merge_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (round-14) — the canonical lakehouse upsert as ONE
    atomic merge-on-read commit: supplier becomes a CDF-enabled Delta
    table partitioned by s_nationkey, and one
    merge_into_delta_table call upserts a source holding (a) every
    s_nationkey<10 row with s_acctbal+5000 (matched → DV over the old
    row + re-append) and (b) every s_nationkey>=20 row under a shifted
    key (unmatched → insert). The gate aggregates the merge commit's
    change feed per change_type: the preimage line must reproduce the
    ORIGINAL balances, the postimage line the bumped ones, and the
    insert line exactly the shifted-key half — a merge that loses a
    half, double-applies, flips pre/post, or resurrects DV-dead rows
    hash-fails. Partition moves, ambiguity refusal, no-op
    non-commits, and column-mapping composition are pinned in
    tests/test_delta.py."""
    from ..sources.delta_log import (
        merge_into_delta_table,
        read_delta_change_feed,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "delta_supplier_merge")
    s = load_table(spark, sf_dir, "supplier")
    cols = s.columns
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(
            s, base, partition_by=["s_nationkey"],
            enable_change_feed=True,
        )
        upd = s.filter(F.col("s_nationkey") < 10).withColumn(
            "s_acctbal", F.col("s_acctbal") + 5000
        )
        ins = s.filter(F.col("s_nationkey") >= 20).withColumn(
            "s_suppkey", F.col("s_suppkey") + 1_000_000
        )
        merge_into_delta_table(
            spark, base,
            upd.select(*cols).unionAll(ins.select(*cols)),
            on=["s_suppkey"],
        )
    feed = read_delta_change_feed(spark, base, 1, 1)
    return feed.groupBy(
        F.col("_change_type").alias("change_type")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_check_constraint_agg",
    """
    WITH t AS (
      SELECT s_nationkey, s_acctbal FROM supplier
      UNION ALL
      SELECT s_nationkey, s_acctbal + 100 FROM supplier
      WHERE s_nationkey < 10
    )
    SELECT s_nationkey % 3 AS nation_bucket, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM t GROUP BY s_nationkey % 3
    """,
    survey_rows="S2,A1,L9",
)
def delta_check_constraint_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHECK constraints (round-14) — the lakehouse data-quality gate
    a training pipeline runs at ingest: supplier commits, the
    constraint `s_nationkey BETWEEN 0 AND 24` records (after
    verifying the existing rows), a VIOLATING append (nationkey 99)
    is attempted and must refuse WITHOUT committing, then a
    conforming shifted-balance half appends. The gate aggregates the
    final table: enforcement that lets the bad batch through doubles
    the row count, enforcement that blocks valid rows loses the
    conforming half — either hash-fails. UPDATE/MERGE enforcement,
    NULL semantics, and drop-release pinned in tests/test_delta.py."""
    from ..sources.delta_log import (
        DeltaLogError,
        add_delta_constraint,
        read_delta_table,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "delta_supplier_chk")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s, base)
        add_delta_constraint(
            spark, base, "nation_range", "s_nationkey BETWEEN 0 AND 24"
        )
        bad = s.withColumn("s_nationkey", F.lit(99).cast(
            dict(s.dtypes)["s_nationkey"]
        ))
        try:
            write_delta_table(bad, base, mode="append")
            raise AssertionError("violating append was not refused")
        except DeltaLogError:
            pass
        ok = (
            s.filter(F.col("s_nationkey") < 10)
            .withColumn("s_suppkey", F.col("s_suppkey") + 1_000_000)
            .withColumn("s_acctbal", F.col("s_acctbal") + 100)
        )
        write_delta_table(ok.select(*s.columns), base, mode="append")
    t = read_delta_table(spark, base)
    return t.groupBy(
        (F.col("s_nationkey") % 3).alias("nation_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_txn_exactly_once_agg",
    """
    SELECT s_nationkey % 4 AS nation_bucket, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey % 4
    """,
    survey_rows="S2,ST5,A1",
)
def delta_txn_exactly_once_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """txn idempotent writes (round-14 — the protocol's exactly-once
    streaming-sink contract, the Delta twin of the ledger sink's
    (checkpoint, epoch) guard): the even-suppkey half commits as
    (appId='loader', v0) and the odd half as v1, and BOTH epochs are
    deliberately REPLAYED — the recorded txn versions make the
    replays skip without committing. The gate aggregates the final
    table against the plain-supplier oracle: a writer that re-commits
    a replayed epoch doubles the rows and hash-fails; one that skips
    a fresh epoch loses the odd half."""
    from ..sources.delta_log import read_delta_table, write_delta_table

    base = _delta_fixture_root(spark, sf_dir, "delta_supplier_txn")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        even = s.filter(F.col("s_suppkey") % 2 == 0)
        odd = s.filter(F.col("s_suppkey") % 2 == 1)
        write_delta_table(
            even, base, txn_app_id="loader", txn_version=0
        )
        write_delta_table(  # crash-replay of epoch 0: must skip
            even, base, mode="append",
            txn_app_id="loader", txn_version=0,
        )
        write_delta_table(
            odd, base, mode="append",
            txn_app_id="loader", txn_version=1,
        )
        write_delta_table(  # replay of epoch 1: must skip
            odd, base, mode="append",
            txn_app_id="loader", txn_version=1,
        )
    t = read_delta_table(spark, base)
    return t.groupBy(
        (F.col("s_nationkey") % 4).alias("nation_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "iceberg_ref_tag_agg",
    """
    WITH states AS (
      SELECT 'tagged' AS state, s_acctbal FROM supplier
      WHERE s_suppkey % 2 = 0
      UNION ALL
      SELECT 'head', s_acctbal FROM supplier
    )
    SELECT state, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM states GROUP BY state
    """,
    survey_rows="S2,A1",
)
def iceberg_ref_tag_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named refs (round-14): the even-suppkey half commits (s0) and
    is TAGGED 'v1.0', the odd half appends (s1), and EXPIRE with
    retain_last=1 runs — the tag must PROTECT s0 (the spec's ref
    retention) or the tagged read loses its files. The gate unions
    the ref read ('tagged' — exactly the even half, post-expire) with
    the head read ('head' — everything): an expire that reclaims a
    tagged snapshot, or a ref resolving to the wrong snapshot,
    hash-fails. Branch refs, drop-release, and refusals pinned in
    tests/test_iceberg.py."""
    from ..sources.iceberg import (
        create_iceberg_ref,
        expire_iceberg_snapshots,
        read_iceberg_table,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_refs")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(
            s.filter(F.col("s_suppkey") % 2 == 0), base
        )
        create_iceberg_ref(base, "v1.0")
        write_iceberg_table(
            s.filter(F.col("s_suppkey") % 2 == 1), base, mode="append"
        )
        expire_iceberg_snapshots(base, retain_last=1)
    tagged = read_iceberg_table(spark, base, ref="v1.0").select(
        F.lit("tagged").alias("state"), "s_acctbal"
    )
    head = read_iceberg_table(spark, base).select(
        F.lit("head").alias("state"), "s_acctbal"
    )
    return tagged.unionAll(head).groupBy("state").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "delta_add_drop_column_agg",
    """
    WITH t AS (
      SELECT s_nationkey, CAST(NULL AS DOUBLE) AS quality_score
      FROM supplier
      UNION ALL
      SELECT s_nationkey, 0.5 FROM supplier
    )
    SELECT coalesce(quality_score, -1.0) AS score,
           count(*) AS n_rows,
           count(DISTINCT s_nationkey) AS n_nations
    FROM t GROUP BY coalesce(quality_score, -1.0)
    """,
    survey_rows="S2,A1",
)
def delta_add_drop_column_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta ADD + DROP COLUMN (round-14 — the Iceberg twins, so BOTH
    formats carry the full rename/add/drop evolution verb set):
    supplier becomes a COLUMN-MAPPED table, gains a nullable
    quality_score (fresh columnMapping id + uuid physicalName — can
    never collide with dropped remnants), a shifted-key copy appends
    WITH scores, and s_name drops (metadata-only; the physical column
    stays in the files, readers stop projecting it). Pre-add files
    must null-fill the new field — the mapped reader's footer check
    now distinguishes legitimately-absent evolved columns from
    wholesale id-only naming. Same oracle shape as the Iceberg twin;
    drop-then-re-add no-leak and refusals pinned in
    tests/test_delta.py."""
    from ..sources.delta_log import (
        add_delta_column,
        drop_delta_column,
        read_delta_table,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "delta_supplier_adddrop")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s, base, column_mapping="name")
        add_delta_column(base, "quality_score", "double")
        write_delta_table(
            s.withColumn(
                "s_suppkey", F.col("s_suppkey") + 1_000_000
            ).withColumn("quality_score", F.lit(0.5)),
            base,
            mode="append",
        )
        drop_delta_column(base, "s_name")
    t = read_delta_table(spark, base)
    return t.groupBy(
        F.coalesce(F.col("quality_score"), F.lit(-1.0)).alias("score")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("s_nationkey").alias("n_nations"),
    )


@register(
    "iceberg_add_drop_column_agg",
    """
    WITH t AS (
      SELECT s_nationkey, CAST(NULL AS DOUBLE) AS quality_score
      FROM supplier
      UNION ALL
      SELECT s_nationkey, 0.5 FROM supplier
    )
    SELECT coalesce(quality_score, -1.0) AS score,
           count(*) AS n_rows,
           count(DISTINCT s_nationkey) AS n_nations
    FROM t GROUP BY coalesce(quality_score, -1.0)
    """,
    survey_rows="S2,A1",
)
def iceberg_add_drop_column_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ADD + DROP COLUMN (round-14, rename's siblings — all three
    metadata-only schema-id commits): supplier gains an optional
    quality_score double, a shifted-key copy appends WITH scores, and
    s_name drops. The read must project the added field as NULL for
    pre-add files (explicit null, never a by-name bind — a dropped-
    then-re-added name must not leak stale physical data, pinned in
    tests), carry real values for post-add files, and stop projecting
    the dropped field while historical snapshots keep it. The gate
    groups by the nullable score: a reader that nulls the wrong
    generation, drops rows, or leaks the dropped column's slot
    hash-fails."""
    from ..sources.iceberg import (
        add_iceberg_column,
        drop_iceberg_column,
        read_iceberg_table,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_adddrop")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s.repartition(2), base)
        add_iceberg_column(base, "quality_score", "double")
        write_iceberg_table(
            s.withColumn(
                "s_suppkey", F.col("s_suppkey") + 1_000_000
            ).withColumn("quality_score", F.lit(0.5)),
            base,
            mode="append",
        )
        drop_iceberg_column(base, "s_name")
    t = read_iceberg_table(spark, base)
    return t.groupBy(
        F.coalesce(F.col("quality_score"), F.lit(-1.0)).alias("score")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("s_nationkey").alias("n_nations"),
    )


@register(
    "iceberg_rename_agg",
    """
    WITH t AS (
      SELECT s_nationkey, s_acctbal AS account_balance
      FROM supplier WHERE NOT s_nationkey >= 20
      UNION ALL
      SELECT s_nationkey, s_acctbal FROM supplier
    )
    SELECT s_nationkey % 5 AS nation_bucket, count(*) AS n_rows,
           round(sum(account_balance), 2) AS total_bal
    FROM t GROUP BY s_nationkey % 5
    """,
    survey_rows="S2,A1",
)
def iceberg_rename_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME COLUMN with field-id resolution (round-14): supplier
    commits under the original schema, loses its s_nationkey>=20 rows
    to an EQUALITY delete keyed on the soon-to-be-renamed column, then
    s_acctbal renames to account_balance (metadata-only — new
    schema-id, same field ids, zero data movement) and a full shifted-
    key copy appends under the NEW schema. The read must resolve each
    file's physical names through its adding snapshot's schema-id: the
    pre-rename files scan their REAL values under the new name (a
    by-name scan would silently null them — sum collapses, hash
    fails), the pre-rename delete parquet still resolves its
    identifier column, and the two schema generations union under one
    logical schema. Historical-snapshot naming, position-delete
    composition, and refusals pinned in tests/test_iceberg.py."""
    from ..sources.iceberg import (
        delete_rows_from_iceberg_table,
        read_iceberg_table,
        rename_iceberg_column,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_rename")
    s = load_table(spark, sf_dir, "supplier")
    cols = s.columns
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s.repartition(2), base)
        delete_rows_from_iceberg_table(
            spark, base, "s_nationkey >= 20",
            mode="equality", equality_columns=["s_nationkey"],
        )
        rename_iceberg_column(base, "s_acctbal", "account_balance")
        new_cols = [
            "account_balance" if c == "s_acctbal" else c for c in cols
        ]
        write_iceberg_table(
            s.withColumn(
                "s_suppkey", F.col("s_suppkey") + 1_000_000
            ).toDF(*new_cols),
            base,
            mode="append",
        )
    t = read_iceberg_table(spark, base)
    return t.groupBy(
        (F.col("s_nationkey") % 5).alias("nation_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("account_balance"), 2).alias("total_bal"),
    )


@register(
    "delta_restore_agg",
    """
    WITH states AS (
      SELECT 'restored' AS state, s_acctbal FROM supplier
      UNION ALL
      SELECT 'deleted', s_acctbal FROM supplier
      WHERE NOT s_nationkey < 5
    )
    SELECT state, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM states GROUP BY state
    """,
    survey_rows="S2,A1",
)
def delta_restore_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE (round-14): supplier (v0) loses every
    s_nationkey<5 row to a deletion-vector DELETE (v1), then
    restore_delta_table returns the live state to v0 in one commit
    (v2) — the DV-bearing adds are replaced by the original DV-less
    ones, so the deleted rows resurrect WITHOUT rewriting any data
    file. The gate unions the post-restore current read ('restored' —
    must be the COMPLETE original table) with the time-travel read of
    the pre-restore v1 ('deleted' — history must stay intact through
    the restore) and aggregates both: a restore that loses rows,
    fails to drop the DVs, or clobbers history hash-fails. Roll
    forward, idempotent no-op, timestamp resolution, and the
    vacuumed-target refusal are pinned in tests/test_delta.py."""
    from ..sources.delta_log import (
        delete_rows_from_delta_table,
        read_delta_table,
        restore_delta_table,
        write_delta_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "delta_supplier_restore")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "_delta_log")):
        write_delta_table(s, base)
        delete_rows_from_delta_table(spark, base, "s_nationkey < 5")
        restore_delta_table(spark, base, version=0)
    cur = read_delta_table(spark, base).select(
        F.lit("restored").alias("state"), "s_acctbal"
    )
    pre = read_delta_table(spark, base, version=1).select(
        F.lit("deleted").alias("state"), "s_acctbal"
    )
    return cur.unionAll(pre).groupBy("state").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "iceberg_rollback_agg",
    """
    WITH states AS (
      SELECT 'rolledback' AS state, s_acctbal FROM supplier
      UNION ALL
      SELECT 'deleted', s_acctbal FROM supplier
      WHERE NOT s_nationkey < 5
    )
    SELECT state, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM states GROUP BY state
    """,
    survey_rows="S2,A1",
)
def iceberg_rollback_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ROLLBACK / setCurrentSnapshot (round-14 — the Delta
    restore's twin, metadata-only because Iceberg snapshots are
    self-contained pointers): supplier (s0) loses every s_nationkey<5
    row to a position-delete snapshot (s1), then rollback moves
    current-snapshot-id back to s0 in a new metadata version — no new
    snapshot, no data movement. The gate unions the post-rollback
    current read ('rolledback' — the complete original) with the
    still-addressable s1 read ('deleted') and aggregates both: a
    rollback that rewrites history, loses the delete snapshot, or
    fails to restore the rows hash-fails. Roll-forward and refusals
    pinned in tests/test_iceberg.py."""
    from ..sources.iceberg import (
        delete_rows_from_iceberg_table,
        iceberg_snapshots,
        read_iceberg_table,
        rollback_iceberg_table,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_rollback")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s, base)
        snap0 = iceberg_snapshots(base)[0]["snapshot_id"]
        delete_rows_from_iceberg_table(
            spark, base, "s_nationkey < 5", mode="position"
        )
        rollback_iceberg_table(base, snap0)
    snaps = iceberg_snapshots(base)
    cur = read_iceberg_table(spark, base).select(
        F.lit("rolledback").alias("state"), "s_acctbal"
    )
    pre = read_iceberg_table(
        spark, base, snapshot_id=snaps[1]["snapshot_id"]
    ).select(F.lit("deleted").alias("state"), "s_acctbal")
    return cur.unionAll(pre).groupBy("state").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "iceberg_merge_agg",
    """
    WITH changes AS (
      SELECT 'insert' AS change_type, s_acctbal + 5000 AS bal
      FROM supplier WHERE s_nationkey < 10
      UNION ALL
      SELECT 'insert', s_acctbal FROM supplier WHERE s_nationkey >= 20
      UNION ALL
      SELECT 'delete', s_acctbal FROM supplier WHERE s_nationkey < 10
    )
    SELECT change_type, count(*) AS n_rows,
           round(sum(bal), 2) AS total_bal
    FROM changes GROUP BY change_type
    """,
    survey_rows="S2,ST14,A1,change-data-feed",
)
def iceberg_merge_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg MERGE INTO (round-14 — the Delta merge's twin, so BOTH
    open formats now carry the canonical upsert): supplier becomes a
    bucket(8, s_suppkey) hidden-partitioned Iceberg table, and ONE
    merge_into_iceberg_table commit upserts (a) every s_nationkey<10
    row with s_acctbal+5000 and (b) every s_nationkey>=20 row under a
    shifted key — an equality-delete manifest over the source keys
    plus the merged rows' data manifest, both at the commit's
    sequence number, so the delete scopes to strictly-older files and
    never the same commit's appends. The gate aggregates
    read_iceberg_changes across the merge snapshot (the overwrite
    multiset-diff leg) per change_type: the insert line must hold the
    bumped + shifted rows, the delete line exactly the original
    matched rows — a merge that half-applies, resurrects, or
    mis-scopes the delete against its own appends hash-fails.
    Partitioned spec reuse, partition moves, atomic manifest shape,
    and refusals are pinned in tests/test_iceberg.py."""
    from ..sources.iceberg import (
        iceberg_snapshots,
        merge_into_iceberg_table,
        read_iceberg_changes,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_merge")
    s = load_table(spark, sf_dir, "supplier")
    cols = s.columns
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(
            s, base, partition_by=["bucket(8, s_suppkey)"]
        )
        upd = s.filter(F.col("s_nationkey") < 10).withColumn(
            "s_acctbal", F.col("s_acctbal") + 5000
        )
        ins = s.filter(F.col("s_nationkey") >= 20).withColumn(
            "s_suppkey", F.col("s_suppkey") + 1_000_000
        )
        merge_into_iceberg_table(
            spark, base,
            upd.select(*cols).unionAll(ins.select(*cols)),
            on=["s_suppkey"],
        )
    first = iceberg_snapshots(base)[0]["snapshot_id"]
    feed = read_iceberg_changes(spark, base, first)
    return feed.groupBy(
        F.col("_change_type").alias("change_type")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "iceberg_spec_evolution_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier WHERE s_nationkey = 13
    GROUP BY s_nationkey
    """,
    survey_rows="S2,S5,A1",
)
def iceberg_spec_evolution_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-SPEC EVOLUTION (round-14 — the round-13 verdict's #1
    defect, closed): the even-suppkey half of supplier is committed
    under spec-0 = bucket(4, s_suppkey), then the odd half is APPENDED
    under an evolved spec-1 = identity(s_nationkey) — two specs in
    `partition-specs`, default-spec-id moved, each manifest stamped
    with ITS `partition_spec_id`. The read filters on the EVOLVED
    field (partition_filter={'s_nationkey': 13}): the reader routes
    pruning per-manifest through the manifest's spec-id, resolves the
    source column by the spec field's source-id (not a name
    convention), and treats spec-0 files — which have no s_nationkey
    partition field — as UNPRUNABLE, conservatively including them.
    The old default-spec-only pruning silently SKIPPED those files
    (pv.get(name) → None ≠ v), so this gate hash-fails the exact
    silent-row-loss the verdict flagged: the even-suppkey nation-13
    suppliers would vanish from the aggregate. File-exact pruning and
    completeness are pinned in tests/test_iceberg.py."""
    from ..sources.iceberg import read_iceberg_table, write_iceberg_table

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_specevo")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(
            s.filter(F.col("s_suppkey") % 2 == 0),
            base,
            partition_by=["bucket(4, s_suppkey)"],
        )
        write_iceberg_table(
            s.filter(F.col("s_suppkey") % 2 == 1),
            base,
            mode="append",
            partition_by=["s_nationkey"],
        )
    d = read_iceberg_table(
        spark, base, partition_filter={"s_nationkey": 13}
    )
    return (
        d.filter(F.col("s_nationkey") == 13)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "iceberg_stats_pruned_agg",
    """
    SELECT count(*) AS n, round(sum(s_acctbal), 2) AS bal,
           min(s_name) AS nm, max(s_suppkey) AS mx
    FROM supplier WHERE s_suppkey BETWEEN 3 AND 13
    """,
    survey_rows="S2,S5,S7",
)
def iceberg_stats_pruned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-STATS file pruning (round-14 — the round-13 verdict's
    #5): supplier committed range-clustered on s_suppkey (8 files with
    disjoint key ranges), each manifest entry carrying the spec's
    lower_bounds/upper_bounds harvested from the parquet FOOTERS at
    write time (driver-side, field-id keyed, little-endian single-value
    binaries — no extra Spark job). The read's range_filter
    {'s_suppkey': (3, 13)} prunes every file whose recorded [min, max]
    provably misses the window BEFORE the scan is planned — at 100 TB
    the difference between scanning a partition and scanning a file —
    and the residual BETWEEN + aggregate hash-matches DuckDB on the raw
    parquet: bounds decoded with the wrong endianness/type, or pruning
    a file that actually held in-range rows, loses rows and fails the
    gate. File-exact pruning and the conservative no-bounds /
    unsupported-type paths are pinned in tests/test_iceberg.py."""
    from ..sources.iceberg import read_iceberg_table, write_iceberg_table

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_stats")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s.repartitionByRange(8, "s_suppkey"), base)
    d = read_iceberg_table(
        spark, base, range_filter={"s_suppkey": (3, 13)}
    )
    return d.filter(F.col("s_suppkey").between(3, 13)).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
        F.min("s_name").alias("nm"),
        F.max("s_suppkey").alias("mx"),
    )


@register(
    "iceberg_equality_delete_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    WHERE s_nationkey >= 5 OR s_suppkey % 2 = 0
    GROUP BY s_nationkey
    """,
    survey_rows="S2,S5,A1",
)
def iceberg_equality_delete_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """v2 EQUALITY deletes end-to-end WITH sequence-number scoping
    (round-13 — the round-12 verdict's #1 item, and the ADVICE high
    fix: content=2 files now route to their own anti-join instead of
    silently misfiling as position deletes): supplier committed as an
    Iceberg table (seq 1), every s_nationkey<5 row deleted MERGE-ON-
    READ via an equality-delete commit (seq 2 — a distinct-identifier
    parquet with equality_ids under a content=1 manifest), then the
    EVEN-suppkey half of the deleted rows RE-INSERTED (seq 3). The read
    applies the delete as a null-safe broadcast anti-join carrying
    `data_seq < delete_seq`, so the re-inserted rows survive — the
    oracle (nationkey>=5 OR even suppkey) hash-fails BOTH failure
    modes: deletes not applying (odd nationkey<5 rows reappear) and
    scoping broken (re-inserted rows vanish). Spec-shape and null-key
    matching pinned in tests/test_iceberg.py."""
    from ..sources.iceberg import (
        delete_rows_from_iceberg_table,
        read_iceberg_table,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_eqdel")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s, base)
        delete_rows_from_iceberg_table(
            spark, base, "s_nationkey < 5",
            mode="equality", equality_columns=["s_nationkey"],
        )
        write_iceberg_table(
            s.filter(
                (F.col("s_nationkey") < 5) & (F.col("s_suppkey") % 2 == 0)
            ),
            base,
            mode="append",
        )
    d = read_iceberg_table(spark, base)
    return d.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "iceberg_changes_agg",
    """
    WITH changes AS (
      SELECT 'insert' AS change_type, s_acctbal
      FROM supplier WHERE s_suppkey % 2 = 1
      UNION ALL
      SELECT 'delete', s_acctbal FROM supplier WHERE s_nationkey < 5
    )
    SELECT change_type, count(*) AS n_rows,
           round(sum(s_acctbal), 2) AS total_bal
    FROM changes GROUP BY change_type
    """,
    survey_rows="S2,ST14,A1,change-data-feed",
)
def iceberg_changes_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg INCREMENTAL READ (round-14 — the Iceberg twin of the
    Delta change feed, closing the CDC interop loop on BOTH open table
    formats): supplier becomes three snapshots — s0 inserts the
    even-suppkey half, s1 appends the odd half, s2 position-deletes
    every s_nationkey<5 row merge-on-read — and
    read_iceberg_changes(s0) replays what changed after s0: the append
    contributes ONLY its own added files (O(batch) — manifest entries
    stamped with the commit's snapshot-id, the incremental-scan
    contract), the delete resolves its (file, ordinal) parquet against
    the parent snapshot via the same broadcast ordinal join the MOR
    reader uses (O(deleted rows), never a table diff). The oracle
    reconstructs the same multiset declaratively; a feed that loses,
    duplicates, mis-tags, or re-floods unchanged rows hash-fails.
    Equality-delete and overwrite-diff legs pinned in
    tests/test_iceberg.py."""
    from ..sources.iceberg import (
        delete_rows_from_iceberg_table,
        iceberg_snapshots,
        read_iceberg_changes,
        write_iceberg_table,
    )

    base = _delta_fixture_root(spark, sf_dir, "ice_supplier_changes")
    s = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(base, "metadata")):
        write_iceberg_table(s.filter(F.col("s_suppkey") % 2 == 0), base)
        write_iceberg_table(
            s.filter(F.col("s_suppkey") % 2 == 1), base, mode="append"
        )
        delete_rows_from_iceberg_table(
            spark, base, "s_nationkey < 5", mode="position"
        )
    first = iceberg_snapshots(base)[0]["snapshot_id"]
    feed = read_iceberg_changes(spark, base, first)
    return feed.groupBy(
        F.col("_change_type").alias("change_type")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "weighted_sample_pps",
    f"""
    SELECT doc_id, lang, n_chars,
           round({_PPS_KEY}, 9) AS pps_key
    FROM documents
    ORDER BY {_PPS_KEY}, doc_id LIMIT 50
    """.replace("AS STRING", "AS VARCHAR"),
    survey_rows="L24,O2,F3,F7",
)
def weighted_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (PPS): 50 docs drawn with
    probability proportional to n_chars — the corpus-assembly primitive
    for 'sample by token budget, prefer substantive documents'
    (Efraimidis & Spirakis, IPL'06: order by -ln(u)/w and take the k
    smallest; u derived from md5(doc_id), so the draw is deterministic,
    engine-portable, partition-layout-independent, and re-run-stable —
    no RNG seed to version, same property as the hash-mod samplers).

    Scale: a scan-side key expression + TakeOrderedAndProject top-k; no
    shuffle beyond the k-row merge. The ln last-ulp engine difference
    cannot flip top-50 membership (key gaps at the boundary are ~1e-4 on
    continuous weights); the emitted key is rounded to 9dp."""
    d = load_table(spark, sf_dir, "documents")
    key = F.expr(_PPS_KEY)
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(key, 9).alias("pps_key"),
            key.alias("_k"),
        )
        .orderBy("_k", "doc_id")
        .limit(50)
        .drop("_k")
    )


@register(
    "sorted_neighborhood_pairs",
    """
    WITH ranked AS (
      SELECT doc_id, substr(text, 1, 40) AS prefix,
             row_number() OVER (ORDER BY substr(text, 1, 16), doc_id) AS rn
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
    FROM ranked a JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND 3
    WHERE levenshtein(a.prefix, b.prefix) <= 5
    """,
    survey_rows="L23,W1,F1",
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution (Hernández & Stolfo,
    SIGMOD'95): sort the corpus by a blocking key (here the 16-char text
    prefix), then compare each record only against its w=3 successors in
    sort order, verifying with edit distance on 40-char prefixes. The
    classic alternative to hash blocking when near-duplicates cluster
    under an order (typos, OCR noise, serial numbers): candidates are
    n·w instead of n²/blocks.

    Scale shape: the global rank comes from rank.with_global_rank —
    repartitionByRange + map-side sort + broadcast cumulative offsets,
    ONE range shuffle (the same shuffle a Z-order write pays) and never
    a single-partition WindowExec over raw rows (tools/audit_plans.py
    asserts this). The neighbor join is an EQUI join on rn after
    exploding the 3 offsets (never a range nested-loop); verification
    cost is |candidates|. Multi-pass production ER re-runs with a second
    key — sorted_neighborhood_multipass below — catching matches a
    single sort order misses."""
    return _sorted_neighborhood(spark, sf_dir)


def _sorted_neighborhood(
    spark: SparkSession, sf_dir: str, reverse_key: bool = False
) -> DataFrame:
    from .rank import with_global_rank

    d = load_table(spark, sf_dir, "documents")
    key = F.substring("text", 1, 16)
    if reverse_key:
        key = F.reverse(key)
    ranked = with_global_rank(
        d.select(
            "doc_id",
            F.substring("text", 1, 40).alias("prefix"),
            key.alias("_k"),
        ),
        ["_k", "doc_id"],
    ).drop("_k")
    a = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("prefix").alias("pa"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("off"),
        F.col("rn"),
    ).select("doc_a", "pa", (F.col("rn") + F.col("off")).alias("rn"))
    b = ranked.select(
        F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb"), "rn"
    )
    dist = F.levenshtein("pa", "pb")
    return (
        a.join(b, "rn")
        .filter(dist <= 5)
        .select("doc_a", "doc_b", dist.cast("long").alias("edit_dist"))
    )


@register(
    "sorted_neighborhood_multipass",
    """
    WITH fwd AS (
      SELECT doc_id, substr(text, 1, 40) AS prefix,
             row_number() OVER (ORDER BY substr(text, 1, 16), doc_id) AS rn
      FROM documents
    ), rev AS (
      SELECT doc_id, substr(text, 1, 40) AS prefix,
             row_number() OVER (ORDER BY reverse(substr(text, 1, 16)), doc_id) AS rn
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS raw_a, b.doc_id AS raw_b,
             CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
      FROM fwd a JOIN fwd b ON b.rn - a.rn BETWEEN 1 AND 3
      WHERE levenshtein(a.prefix, b.prefix) <= 5
      UNION ALL
      SELECT a.doc_id, b.doc_id,
             CAST(levenshtein(a.prefix, b.prefix) AS BIGINT)
      FROM rev a JOIN rev b ON b.rn - a.rn BETWEEN 1 AND 3
      WHERE levenshtein(a.prefix, b.prefix) <= 5
    )
    SELECT DISTINCT least(raw_a, raw_b) AS doc_a,
           greatest(raw_a, raw_b) AS doc_b, edit_dist
    FROM pairs
    """,
    survey_rows="L23,U1,U3,F1",
)
def sorted_neighborhood_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood ER (the production form of L23):
    pass 1 sorts by the text prefix, pass 2 by the REVERSED prefix —
    records that differ in their first characters (the classic failure
    mode of single-key SNM) still become neighbors under the reversed
    order. Pairs are canonicalized (doc_a <= doc_b) and UNION-distinct'd.

    Scale: two independent global ranks (each one range shuffle via
    rank.with_global_rank), two linear neighbor joins, one distinct on
    the (small) verified-pair set. Cost is 2× single-pass, recall is
    what multi-pass buys; candidates stay n·w per pass, never n²."""
    fwd = _sorted_neighborhood(spark, sf_dir, reverse_key=False)
    rev = _sorted_neighborhood(spark, sf_dir, reverse_key=True)

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
            "edit_dist",
        )

    return canon(fwd).unionByName(canon(rev)).distinct()


@register(
    "snapshot_diff_orders",
    """
    WITH ops AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
                    THEN 'insert'
                  WHEN o_orderkey % 7 <> 0 AND o_orderkey % 11 = 0
                    THEN 'delete'
                  WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
                       AND o_orderkey % 11 <> 0
                    THEN 'update'
             END AS op
      FROM orders
    )
    SELECT o_orderkey, op FROM ops WHERE op IS NOT NULL
    """,
    survey_rows="ST14,J2,F7",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (table diff) between two versions of the
    orders table: version A drops every 7th key, version B drops every
    11th and bumps the price of every 5th — diff_snapshots must classify
    exactly the injected inserts/deletes/updates and nothing else
    (unchanged rows never surface). This is the audit a versioned lake
    runs to validate a CDC backfill or cross-region replica.

    Shape (pipelines.diff_snapshots): each side reduces to (key,
    xxhash64 of all compared columns) BEFORE the full-outer join, so the
    shuffle carries 16 bytes/row regardless of table width; the op
    classification is a null-pattern CASE on the joined digests. At
    100 TB: one exchange per side on the key, no row payloads move, and
    schema-evolved versions diff on the column intersection (added
    columns don't mark every row changed).

    Oracle: the injected change-sets are closed-form in the key, so the
    expected diff is a direct CASE over the original table — the hash
    match proves the digest join finds exactly those keys."""
    from ..pipelines import diff_snapshots

    o = load_table(spark, sf_dir, "orders")
    v_a = o.filter(F.col("o_orderkey") % 7 != 0)
    v_b = o.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return diff_snapshots(v_a, v_b, ["o_orderkey"]).select(
        "o_orderkey", "op"
    )


@register(
    "lake_pruned_range_read",
    """
    SELECT count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND o_orderdate <= TIMESTAMP '1996-08-31 23:59:59'
    """,
    survey_rows="S5,S7,P2,A5",
)
def lake_pruned_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data skipping surfaced at the correctness gate: the orders table
    is published ONCE per (tmpdir, sf) as a range-clustered lake version
    with per-file min/max footer stats (publish_versioned(stats_cols)),
    and this query answers a 6-month revenue window through
    `read_version_pruned` — files whose [min, max] cannot intersect the
    window are dropped on the DRIVER, before any scan task exists. The
    oracle aggregates the ORIGINAL parquet with a plain WHERE: the hash
    match proves pruning changed nothing but the files touched
    (tests/test_skipping.py additionally asserts the touch count).

    At 100 TB this is the control-plane half of partition pruning: the
    layout (repartitionByRange here; Z-order in layout.py for
    multi-column windows) concentrates each query window into few
    files, and the manifest check is O(files) driver work — the scan
    cost tracks the ANSWER size, not the table size."""
    import tempfile

    from ..pipelines import publish_versioned, read_version_pruned

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders"
    )
    from ..sources import lakefs

    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(
            load_table(spark, sf_dir, "orders").repartitionByRange(
                8, "o_orderdate"
            ),
            base,
            stats_cols=["o_orderdate"],
        )
    df, n_total, n_read = read_version_pruned(
        spark,
        base,
        "o_orderdate",
        "1996-03-01 00:00:00",
        "1996-08-31 23:59:59",
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "lake_schema_evolution_chain",
    """
    WITH seg1 AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(NULL AS VARCHAR) AS o_band
      FROM orders WHERE o_orderkey % 2 = 0
    ), seg2 AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CASE WHEN o_totalprice >= 150000 THEN 'high'
                  ELSE 'low' END AS o_band
      FROM orders WHERE o_orderkey % 2 = 1
    ), chain AS (
      SELECT * FROM seg1 UNION ALL SELECT * FROM seg2
    )
    SELECT coalesce(o_band, '(pre-evolution)') AS band,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           count(DISTINCT o_custkey) AS n_customers
    FROM chain
    GROUP BY 1
    """,
    survey_rows="S3,S5,A1,P3",
)
def lake_schema_evolution_chain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive schema evolution at the correctness gate: a two-schema
    append chain is published ONCE per (tmpdir, sf) — segment v1 holds
    even-key orders with the base 3-column schema, segment v2 appends
    odd-key orders carrying a new `o_band` column
    (publish_append(evolve="additive")). The chain read derives the
    union schema from the MANIFESTS (pipelines._chain_merged_schema) —
    no footer-merge job — and NULL-backfills `o_band` for the
    pre-evolution segment; the aggregate groups on
    coalesce(o_band, '(pre-evolution)') so the oracle's UNION ALL twin
    hash-proves exactly which rows read NULL.

    At 100 TB: adding a column is the first lake mutation a real user
    makes, and it must cost O(batch) — only the new segment is written;
    old files are never rewritten, read planning stays O(chain)
    manifest I/O on the driver, and type changes fail loudly at publish
    time (tests/test_lake_evolution.py covers diff/compaction/point
    lookups across the same boundary)."""
    import tempfile

    from ..pipelines import (
        publish_append,
        publish_versioned,
        read_version_chain,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_evolved"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        publish_versioned(
            o.filter(F.col("o_orderkey") % 2 == 0), base
        )
        publish_append(
            o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
                "o_band",
                F.when(
                    F.col("o_totalprice") >= 150000, F.lit("high")
                ).otherwise(F.lit("low")),
            ),
            base,
            evolve="additive",
        )
    df, _ = read_version_chain(spark, base)
    return df.groupBy(
        F.coalesce(F.col("o_band"), F.lit("(pre-evolution)")).alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "lake_bucketed_mart_join",
    """
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    survey_rows="S5,J1,A1",
)
def lake_bucketed_mart_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located published-data join at the correctness gate: orders
    and lineitem marts are published ONCE per (tmpdir, sf) hash-bucketed
    on the orderkey (pipelines.publish_bucketed — 8 co-numbered sorted
    buckets each), and this query joins them back THROUGH the bucketed
    read path (read_bucketed): the fact-to-fact join plans a
    SortMergeJoin with ZERO `Exchange hashpartitioning`
    (tests/test_lake_bucketed.py pins the plan; tools/audit_plans.py
    audits this query's no-shuffle-join property).

    At 100 TB this is the amortization that matters most: the mart's
    dominant join key is shuffled exactly once — at publish — and every
    recurring downstream join/agg on that key (this query runs daily in
    any revenue pipeline) reads co-located buckets. The oracle joins the
    ORIGINAL unbucketed parquet: the hash match proves layout changed
    nothing but the shuffle count."""
    import tempfile

    from ..pipelines import publish_bucketed, read_bucketed
    from ..sources import lakefs

    # tag feeds SQL table identifiers — keep [a-z0-9_] only
    tag = fixture_tag(sf_dir).replace(".", "_").replace("-", "_")
    root = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag
    )
    ob, lb = f"{root}/mart_orders_b", f"{root}/mart_lineitem_b"
    if not lakefs.exists(spark, f"{ob}/LATEST"):
        publish_bucketed(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority"
            ),
            ob,
            f"mart_orders_{tag}",
            "o_orderkey",
            8,
        )
        publish_bucketed(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            lb,
            f"mart_lineitem_{tag}",
            "l_orderkey",
            8,
        )
    od, _ = read_bucketed(spark, ob)
    ld, _ = read_bucketed(spark, lb)
    return (
        ld.hint("merge")
        .join(
            od.hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "lake_partition_evolution_read",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1994 AND 1996
    GROUP BY 1
    """,
    survey_rows="S3,S5,A1,P2",
)
def lake_partition_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution at the correctness gate (the Iceberg
    rule: a spec change applies to NEW data only, old files are never
    rewritten): the chain is published ONCE per (tmpdir, sf) — v1 is a
    FLAT full snapshot of pre-1996 orders carrying footer min-max stats
    on o_year, v2 appends 1996+ orders HIVE-PARTITIONED by o_year
    (publish_append partition_by=["o_year"]). The range read
    (read_chain_pruned) then exercises BOTH skipping mechanisms in one
    plan: footer-stat file pruning on the flat segment, o_year=V
    directory pruning on the partitioned one, each branch planned under
    its own layout and unioned. The oracle hash-proves the pruned union
    against a direct scan of `orders`; tests/test_lake_partition_
    evolution.py pins the file-count accounting, the PartitionFilters
    in the partitioned branch, and point lookups across the boundary."""
    import tempfile

    from ..pipelines import (
        publish_append,
        publish_versioned,
        read_chain_pruned,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_pevolved"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.year("o_orderdate").alias("o_year"),
        )
        publish_versioned(
            o.filter(F.col("o_year") < 1996), base, stats_cols=["o_year"]
        )
        publish_append(
            o.filter(F.col("o_year") >= 1996),
            base,
            partition_by=["o_year"],
        )
    df, _total, _read = read_chain_pruned(spark, base, "o_year", 1994, 1996)
    return df.groupBy("o_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "mv_rewrite_pricing",
    """
    SELECT l_returnflag,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n_items,
           round(sum(l_quantity) / count(*), 6) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_rows="S5,A1,mv-rewrite",
)
def mv_rewrite_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view AUTO-REWRITE at the correctness gate
    (plans/mv.py): a pricing rollup MV is published ONCE per
    (tmpdir, sf) at grain (l_returnflag, l_linestatus); this query asks
    for the COARSER grain (l_returnflag) and the rewriter answers it
    from the k-row MV — sum-of-sums, sum-of-counts, derived average —
    WITHOUT touching lineitem (tests pin that the plan scans only the
    MV path). The oracle aggregates the raw fact directly, so the hash
    match proves the summary-table containment algebra end-to-end.

    At 100 TB this is the interactive-dashboard path: the fact scan is
    paid once at publish; every matching rollup query after that is a
    k-row read. Non-containment (unknown measure, non-group-key
    predicate) returns None and the caller falls back to the fact —
    tested in tests/test_mv_rewrite.py."""
    import tempfile

    from ..plans.mv import MvSpec, publish_mv, rewrite_agg
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "lineitem_pricing_mv"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        li = load_table(spark, sf_dir, "lineitem")
        publish_mv(
            li,
            base,
            MvSpec(
                ("l_returnflag", "l_linestatus"),
                {
                    "sum_qty": ("sum", "l_quantity"),
                    "sum_price": ("sum", "l_extendedprice"),
                    "n_items": ("count", None),
                },
            ),
        )
    out = rewrite_agg(
        spark,
        base,
        ["l_returnflag"],
        {
            "sum_qty": "sum_qty",
            "sum_price": "sum_price",
            "n_items": "n_items",
            "avg_qty": ("sum_qty", "n_items"),
        },
    )
    assert out is not None, "MV containment must hold for this query"
    return out.select(
        "l_returnflag",
        "sum_qty",
        F.round("sum_price", 2).alias("sum_price"),
        "n_items",
        F.round("avg_qty", 6).alias("avg_qty"),
    )


@register(
    "constraint_quarantine_publish",
    """
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE value <= 100 AND ts IS NOT NULL
    GROUP BY event_type
    """,
    survey_rows="S5,A1,dq-publish",
)
def constraint_quarantine_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-time constraint enforcement at the correctness gate
    (pipelines.publish_checked — the Delta CHECK/NOT NULL contract with
    quarantine): events are published ONCE per (tmpdir, sf) under
    constraints value<=100 (check), ts NOT NULL, event_id unique; rows
    breaking any constraint divert to a quarantine dataset carrying a
    `_violations` audit column, clean rows publish versioned with the
    per-constraint violation counts in the manifest. This query reads
    the PUBLISHED version back and aggregates it; the oracle applies the
    same predicate to raw `events`, so the hash match proves the
    split was exact — nothing leaked into the clean set, nothing
    legitimate was quarantined.

    At 100 TB: check/not_null fuse into the ingest scan (pure row
    exprs), unique pays its one unavoidable key shuffle, and the
    violation audit is a single aggregate — enforcement costs one pass,
    not one pass per constraint."""
    import tempfile

    from ..pipelines import publish_checked, read_version
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "events_checked"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        ev = load_table(spark, sf_dir, "events")
        publish_checked(
            ev,
            base,
            [
                ("value_capped", "check", F.col("value") <= 100),
                ("ts_present", "not_null", ["ts"]),
                ("event_id_unique", "unique", ["event_id"]),
            ],
            on_violation="quarantine",
        )
    df, _ = read_version(spark, base)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "mv_rewrite_star_segment",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_price,
           round(sum(o.o_totalprice) / count(*), 6) AS avg_price
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    survey_rows="S5,J1,A1,mv-rewrite",
)
def mv_rewrite_star_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV auto-rewrite THROUGH A JOIN, with cost-based MV choice: the
    published MV materializes the orders⋈customer star join pre-
    aggregated at grain (c_mktsegment, o_orderpriority); this query
    asks for segment-level totals and `choose_mv` picks that MV over a
    deliberately-finer decoy MV (grain + o_orderstatus, more rows) —
    the smallest containing rollup wins, by manifest row counts alone
    (O(candidates) driver JSON, no data I/O). The rewrite then answers
    from the k-row MV: neither orders nor customer is scanned (plan-
    audited), while the oracle recomputes the join + aggregate from raw
    tables — the hash match proves join-MV containment end-to-end."""
    import tempfile

    from ..plans.mv import MvSpec, choose_mv, publish_mv, rewrite_agg
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    root = os.path.join(tempfile.gettempdir(), "novelti_dingo_lake", tag)
    base = os.path.join(root, "star_segment_mv")
    decoy = os.path.join(root, "star_segment_mv_fine")
    if not lakefs.exists(spark, f"{base}/LATEST"):
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        joined = o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        publish_mv(
            joined,
            base,
            MvSpec(
                ("c_mktsegment", "o_orderpriority"),
                {
                    "total_price": ("sum", "o_totalprice"),
                    "n_orders": ("count", None),
                },
            ),
        )
        publish_mv(
            joined,
            decoy,
            MvSpec(
                ("c_mktsegment", "o_orderpriority", "o_orderstatus"),
                {
                    "total_price": ("sum", "o_totalprice"),
                    "n_orders": ("count", None),
                },
            ),
        )
    measures = {
        "n_orders": "n_orders",
        "total_price": "total_price",
        "avg_price": ("total_price", "n_orders"),
    }
    chosen = choose_mv(spark, [decoy, base], ["c_mktsegment"], measures)
    assert chosen == base, f"cost-based choice picked {chosen}"
    out = rewrite_agg(spark, chosen, ["c_mktsegment"], measures)
    assert out is not None
    return out.select(
        "c_mktsegment",
        "n_orders",
        F.round("total_price", 2).alias("total_price"),
        F.round("avg_price", 6).alias("avg_price"),
    )


@register(
    "lake_delete_rows_read",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderkey NOT IN (1, 2, 3)
    GROUP BY o_orderpriority
    """,
    survey_rows="S5,A1,gdpr-delete",
)
def lake_delete_rows_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write surgical delete at the correctness gate
    (pipelines.delete_rows_cow — the GDPR path): orders is published
    ONCE per (tmpdir, sf) range-clustered and file-indexed on
    o_orderkey, then keys {1,2,3} are deleted — the index targets the
    few files containing them for rewrite, every other file is
    byte-copied (no decode) into the new version, LATEST flips
    atomically. This query aggregates the POST-DELETE version; the
    oracle applies NOT IN to raw orders, so the hash match proves the
    deletion removed exactly the doomed keys and nothing else survived
    or leaked from either the rewritten or the copied files."""
    import tempfile

    from ..pipelines import (
        build_file_index,
        delete_rows_cow,
        publish_versioned,
        read_version,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_gdpr"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        o = load_table(spark, sf_dir, "orders").repartitionByRange(
            4, "o_orderkey"
        )
        publish_versioned(o, base)
        build_file_index(spark, base, "o_orderkey")
        delete_rows_cow(spark, base, "o_orderkey", [1, 2, 3])
    df, _ = read_version(spark, base)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "snapshot_consistent_mart_join",
    """
    SELECT n.n_name,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    survey_rows="S5,J1,A1,snapshot",
)
def snapshot_consistent_mart_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table CONSISTENT-snapshot join at the correctness gate
    (pipelines.publish_snapshot / read_snapshot): orders, customer, and
    nation are published in ONE atomic multi-table snapshot (a single
    LATEST flip covers all three), and this query joins them back from
    that snapshot — the guarantee being exercised is that a reader can
    never see fact@N joined with dim@N-1, the cross-table anomaly that
    per-table versioning cannot prevent. The oracle joins the raw
    tables, so the hash match proves the snapshot round-trip lossless
    across all three members."""
    import tempfile

    from ..pipelines import publish_snapshot, read_snapshot
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "mart_snapshot"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_snapshot(
            {
                "orders": load_table(spark, sf_dir, "orders").select(
                    "o_orderkey", "o_custkey", "o_totalprice"
                ),
                "customer": load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                ),
                "nation": load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name"
                ),
            },
            base,
        )
    t, _ = read_snapshot(spark, base)
    return (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "stats_cbo_star_join",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0) t
      ON t.c_custkey = o.o_custkey
    GROUP BY 1
    """,
    survey_rows="S5,J1,J4,A1",
)
def stats_cbo_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Published NDV statistics DRIVING the join plan at the correctness
    gate: fact (orders) and two dims are published ONCE per (tmpdir, sf)
    with ndv_cols stats (free with the write via Observation), and the
    star join runs through plans.stats_cbo.plan_star_join — the
    manifest stats reorder the declared-pessimal dim order so the
    ~10%-covering dim joins first (containment estimate
    ndv_dim/max(ndv_fact, ndv_dim)), and both dims broadcast because
    their rows x row-width estimate fits the budget. The oracle joins
    the ORIGINAL tables in declared order: the hash match proves the
    reorder is a pure cost decision.

    This closes the stats-are-write-only gap: at 100 TB the decision
    uses a few hundred bytes of manifest JSON on the driver (the
    Iceberg/Trino connector-stats pattern) where ANALYZE TABLE would
    re-scan the table and raw file sizes mis-estimate broadcastability
    in both directions (tests/test_stats_cbo.py pins the with/without
    plan difference under autoBroadcastJoinThreshold=-1)."""
    import tempfile

    from ..pipelines import publish_versioned, read_version
    from ..plans import DimSpec, plan_star_join
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    root = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "cbo"
    )
    if not lakefs.exists(spark, f"{root}/fact/LATEST"):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        publish_versioned(o, f"{root}/fact", ndv_cols=["o_custkey"])
        publish_versioned(c, f"{root}/dim_all", ndv_cols=["c_custkey"])
        publish_versioned(
            c.filter(F.col("c_custkey") % 10 == 0).select(
                F.col("c_custkey").alias("t_custkey")
            ),
            f"{root}/dim_tenth",
            ndv_cols=["t_custkey"],
        )
    fact, fm = read_version(spark, f"{root}/fact")
    d_all, am = read_version(spark, f"{root}/dim_all")
    d_tenth, tm = read_version(spark, f"{root}/dim_tenth")
    joined, _plan = plan_star_join(
        fact,
        fm,
        [  # declared order is pessimal on purpose — stats fix it
            DimSpec("dim_all", d_all, am, "o_custkey", "c_custkey"),
            DimSpec("dim_tenth", d_tenth, tm, "o_custkey", "t_custkey"),
        ],
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "dq_referential_integrity",
    """
    SELECT 'lineitem_fk_orders' AS check_name,
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
             AS n_violations,
           (SELECT count(*) FROM lineitem) AS n_checked
    UNION ALL
    SELECT 'orders_fk_customer',
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'events_fk_customer',
           (SELECT count(*) FROM events e
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = e.user_id)),
           (SELECT count(*) FROM events)
    UNION ALL
    SELECT 'customer_acctbal_nonneg',
           (SELECT count(*) FROM customer WHERE c_acctbal < 0),
           (SELECT count(*) FROM customer)
    UNION ALL
    SELECT 'documents_nchars_consistent',
           (SELECT count(*) FROM documents WHERE n_chars <> length(text)),
           (SELECT count(*) FROM documents)
    UNION ALL
    SELECT 'documents_docid_unique',
           (SELECT count(*) - count(DISTINCT doc_id) FROM documents),
           (SELECT count(*) FROM documents)
    """,
    survey_rows="J3,A5,P2,dq",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality CONSTRAINT audit (the Deequ/expectations shape): six
    checks spanning the three constraint classes a warehouse enforces —
    referential integrity (every lineitem→order, order→customer,
    event→customer FK resolves), domain constraints (non-negative
    account balances — the one check with real violations in this
    corpus, so the audit's output is discriminative, not all-zeros),
    and intra-row/uniqueness invariants (n_chars equals length(text),
    doc_id unique). One row per check: name, violations, population.

    Shape: each FK check is a broadcast ANTI join (dimension side small)
    counted with a partial agg; domain checks are scan-side predicates.
    All six checks are independent legs of a UNION — at 100 TB they
    share nothing but can be scheduled concurrently, and each leg's
    scan prunes to exactly the columns its predicate needs. The audit
    is the pre-publish gate for `publish_versioned` releases: a
    non-zero FK row blocks the version flip."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")

    def check(name: str, bad_count, total_count) -> DataFrame:
        return bad_count.crossJoin(total_count).select(
            F.lit(name).alias("check_name"),
            F.col("n_violations"),
            F.col("n_checked"),
        )

    def orphans(child, child_key, parent, parent_key):
        return (
            child.join(
                F.broadcast(parent.select(parent_key).distinct()),
                child[child_key] == parent[parent_key],
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("n_violations"))
        )

    legs = [
        check(
            "lineitem_fk_orders",
            orphans(li, "l_orderkey", o, "o_orderkey"),
            li.agg(F.count(F.lit(1)).alias("n_checked")),
        ),
        check(
            "orders_fk_customer",
            orphans(o, "o_custkey", c, "c_custkey"),
            o.agg(F.count(F.lit(1)).alias("n_checked")),
        ),
        check(
            "events_fk_customer",
            orphans(e, "user_id", c, "c_custkey"),
            e.agg(F.count(F.lit(1)).alias("n_checked")),
        ),
        check(
            "customer_acctbal_nonneg",
            c.agg(
                F.count(F.when(F.col("c_acctbal") < 0, 1)).alias(
                    "n_violations"
                )
            ),
            c.agg(F.count(F.lit(1)).alias("n_checked")),
        ),
        check(
            "documents_nchars_consistent",
            d.agg(
                F.count(
                    F.when(F.col("n_chars") != F.length("text"), 1)
                ).alias("n_violations")
            ),
            d.agg(F.count(F.lit(1)).alias("n_checked")),
        ),
        check(
            "documents_docid_unique",
            d.agg(
                (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias(
                    "n_violations"
                )
            ),
            d.agg(F.count(F.lit(1)).alias("n_checked")),
        ),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


@register(
    "wap_promoted_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    survey_rows="S3,lake-wap,A1",
)
def wap_promoted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish surfaced at the correctness gate: lineitem is
    STAGED as a lake candidate (invisible to LATEST), AUDITED against
    the written files (positive prices, non-null key columns, discount
    in [0, 1], a minimum order-cardinality expectation),
    then PROMOTED — a pointer flip, no rewrite — and the query
    aggregates revenue per (returnflag, linestatus) from the promoted
    LATEST. The
    oracle aggregates the raw parquet directly, so the hash match
    proves the staged bytes that passed the audit are exactly what
    serves after promotion (no row lost or duplicated anywhere in
    stage -> audit -> promote).

    At 100 TB this is the pattern for gated ingestion: the write
    happens once (non-replayable upstreams included), audits run
    against the immutable candidate out-of-band, and promotion cost is
    independent of data size."""
    import tempfile

    from ..pipelines import (
        audit_staged,
        promote_staged,
        publish_staged,
        read_version,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "lineitem_wap"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        li = load_table(spark, sf_dir, "lineitem")
        publish_staged(li, base)
        audit = audit_staged(
            spark,
            base,
            constraints=[
                ("price_pos", "check", F.col("l_extendedprice") > 0),
                ("keys_set", "not_null", ["l_orderkey", "l_linenumber"]),
                ("disc_range", "check", F.col("l_discount").between(0, 1)),
            ],
            expectations=[("orders_min", "ndv_min", ("l_orderkey", 100))],
        )
        assert audit["pass"], audit
        promote_staged(spark, base)
    df, _ = read_version(spark, base)
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "keyset_pagination_page3",
    """
    WITH boundary AS (
      SELECT o_totalprice AS bp, o_orderkey AS bk
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 1 OFFSET 39
    )
    SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price,
           o.o_orderpriority
    FROM orders o, boundary b
    WHERE o.o_totalprice < b.bp
       OR (o.o_totalprice = b.bp AND o.o_orderkey > b.bk)
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    survey_rows="O1,O2,P2,pagination",
)
def keyset_pagination_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET (seek-method) pagination: page 3 of the orders listing
    sorted by (price DESC, key ASC) fetched by SEEKING past page 2's
    last row — the tuple predicate (price, key) < boundary — instead of
    OFFSET 40. OFFSET is the anti-pattern this replaces: a deep OFFSET
    N scan must produce and DISCARD N rows on every page (at 100 TB,
    page 10000 re-pays the whole prefix), while the seek predicate
    makes every page the SAME top-k job, and with a client-supplied
    literal boundary it pushes into the parquet scan as a plain range
    filter (row-group min/max skipping applies — deep pages get
    CHEAPER, not costlier). Here the boundary is computed in-query (a
    40-row TakeOrdered reduced to 1 row, broadcast), so the gate also
    proves the boundary row itself is excluded and price TIES across
    the page edge split correctly (the key tiebreak leg)."""
    o = load_table(spark, sf_dir, "orders")
    boundary = (
        o.select("o_totalprice", "o_orderkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(40)
        .orderBy(F.col("o_totalprice"), F.col("o_orderkey").desc())
        .limit(1)
        .select(
            F.col("o_totalprice").alias("bp"), F.col("o_orderkey").alias("bk")
        )
    )
    return (
        o.join(F.broadcast(boundary))
        .filter(
            (F.col("o_totalprice") < F.col("bp"))
            | (
                (F.col("o_totalprice") == F.col("bp"))
                & (F.col("o_orderkey") > F.col("bk"))
            )
        )
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "o_orderpriority",
        )
        .orderBy(F.col("price").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "lake_rename_widen_chain_read",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price_usd,
           round(min(o_totalprice), 2) AS min_price_usd,
           round(max(o_totalprice), 2) AS max_price_usd
    FROM orders GROUP BY o_orderpriority
    """,
    survey_rows="S5,lake-evolution,A1",
)
def lake_rename_widen_chain_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME evolution surfaced at the correctness gate: the orders
    table is published as a two-segment append chain whose second
    segment RENAMES o_totalprice -> price_usd (declared via
    publish_append(renames=...) — undeclared renames are
    indistinguishable from drop+add and rejected); the chain read
    resolves names newest-wins, so v1's rows come back under
    `price_usd` WITH their values. The query aggregates price stats per
    priority from the unified chain, and the oracle aggregates the raw
    parquet — the hash match proves no row lost a value across the
    rename boundary (a drop+add would NULL half the sums and the min
    over the old segment).

    At 100 TB a rename costs O(1): one manifest entry, zero rewrites —
    readers translate per segment at plan time (the Iceberg field-id
    idea, carried as an explicit mapping on this manifest format)."""
    import tempfile

    from ..pipelines import publish_append, publish_versioned, read_version_chain
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_renamed"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)
        publish_append(
            o.filter(F.col("o_orderkey") % 2 == 1).withColumnRenamed(
                "o_totalprice", "price_usd"
            ),
            base,
            evolve="additive",
            renames={"price_usd": "o_totalprice"},
        )
    df, _ = read_version_chain(spark, base)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("price_usd"), 2).alias("total_price_usd"),
        F.round(F.min("price_usd"), 2).alias("min_price_usd"),
        F.round(F.max("price_usd"), 2).alias("max_price_usd"),
    )


@register(
    "lake_mor_delete_read",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderkey NOT IN (10, 11, 12, 13)
    GROUP BY o_orderpriority
    """,
    survey_rows="S5,A1,mor-delete",
)
def lake_mor_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ delete at the correctness gate
    (pipelines.delete_rows_mor — the deletion-vector path): orders is
    published once per (tmpdir, sf), then keys {10..13} are deleted by
    writing ONLY the key set — no data file is rewritten; the version
    directory holds nothing but the vector. This query aggregates the
    post-delete LATEST, whose read plan is the parent's scan minus a
    broadcast anti join; the oracle applies NOT IN to raw orders, so
    the hash match proves the vector subtracts exactly the doomed keys.
    The COW twin (`lake_delete_rows_read`) pays the rewrite at delete
    time and reads clean; this pays an anti join per read and deletes
    in O(keys) — the standard write- vs read-optimized trade, both
    sides of which this lake format now offers."""
    import tempfile

    from ..pipelines import delete_rows_mor, publish_versioned, read_version
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_mor"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(o, base)
        delete_rows_mor(spark, base, "o_orderkey", [10, 11, 12, 13])
    df, _ = read_version(spark, base)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "lake_fast_count",
    """
    SELECT count(*) AS n_rows
    FROM orders
    WHERE o_orderkey NOT IN (1, 2, 3)
    """,
    survey_rows="S5,A5,meta-only-agg",
)
def lake_fast_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only `count(*)` (pipelines.fast_count — the
    Delta/Iceberg unfiltered-count shortcut): orders is published as a
    two-segment append chain, then three keys are deleted with an
    equality vector; the count is answered from the MANIFESTS ALONE —
    no scan task runs, the chain sums its segment deltas and the
    vector head carries the resolved total. The oracle counts raw
    orders under the same NOT IN, so the hash match proves every
    commit kind's recorded row count is exact through append + MOR
    resolution. The single-row result is driver-built by design: the
    capability under test is that NO distributed read happens."""
    import tempfile

    from ..pipelines import (
        delete_rows_mor,
        fast_count,
        publish_append,
        publish_versioned,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_fastcount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)
        publish_append(o.filter(F.col("o_orderkey") % 2 == 1), base)
        delete_rows_mor(spark, base, "o_orderkey", [1, 2, 3])
    n = fast_count(spark, base)
    return spark.createDataFrame([(n,)], "n_rows bigint")


@register(
    "lake_change_feed",
    """
    WITH changes AS (
      SELECT 'insert' AS change_type, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 1
      UNION ALL
      SELECT 'delete', o_totalprice
      FROM orders WHERE o_orderkey IN (1, 2, 3)
    )
    SELECT change_type, count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS total_price
    FROM changes GROUP BY change_type
    """,
    survey_rows="S5,ST14,A1,change-data-feed",
)
def lake_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CHANGE DATA FEED at the correctness gate (the Delta
    table_changes / Iceberg incremental-read contract): orders becomes a
    full publish + an append + an equality-vector delete, and
    `pipelines.table_changes(v1, v3)` replays exactly what changed —
    the append's rows as 'insert' (read from the segment alone,
    O(batch)) and the vector's victims as 'delete' (parent semi-joined
    to the O(keys) vector). The oracle reconstructs the same multiset
    from the raw table declaratively; the hash match proves the feed
    neither loses, duplicates, nor mis-tags a row. Compactions emit
    nothing (pinned in tests/test_change_feed.py) — the same
    no-re-flood rule the lake streaming source enforces.

    At 100 TB the feed is the incremental-consumer contract: each sync
    reads O(changes), never O(table), and commit-kind metadata keeps
    the common paths (append, equality delete) row-addressed."""
    import tempfile

    from ..pipelines import (
        delete_rows_mor,
        publish_append,
        publish_versioned,
        table_changes,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_cdf"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(o.filter("o_orderkey % 2 = 0"), base)
        publish_append(o.filter("o_orderkey % 2 = 1"), base)
        delete_rows_mor(spark, base, "o_orderkey", [1, 2, 3])
    feed = table_changes(spark, base, 1, 3)
    return feed.groupBy(
        F.col("_change_type").alias("change_type")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "lake_hidden_partition_read",
    """
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 23:59:59'
    GROUP BY event_type
    """,
    survey_rows="S5,S3,P2,A1,hidden-partitioning",
)
def lake_hidden_partition_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN PARTITIONING at the correctness gate (the Iceberg
    partition-transform pattern): events are published as a two-segment
    append chain laid out by day(ts) — a DERIVED partition value the
    table schema never shows — and this 11-day revenue window runs
    through `read_chain_pruned` on the RAW ts column: the manifest's
    transform spec maps the range to day-directory bounds on the driver
    and 19 of 30 day directories are never touched (pytest pins the
    exact file accounting). The oracle aggregates the original parquet
    with a plain WHERE — the hash match proves the derived layout and
    the pruning are invisible to query semantics.

    At 100 TB this is what keeps time-windowed queries O(window): users
    write `WHERE ts BETWEEN ...` with no layout knowledge (the classic
    hive mistake — forgetting the `AND day = ...` predicate twin — is
    structurally impossible), and the scan schedules tasks only for
    in-window partitions."""
    import tempfile

    from ..pipelines import (
        publish_append,
        publish_versioned,
        read_chain_pruned,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "events_hidden"
    )
    spec = {"source": "ts", "kind": "day"}
    e = load_table(spark, sf_dir, "events")
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(
            e.filter(F.col("ts") < "2024-01-16"), base,
            partition_transform=spec,
        )
        publish_append(
            e.filter(F.col("ts") >= "2024-01-16"), base,
            partition_transform=spec,
        )
    df, _, _ = read_chain_pruned(
        spark, base, "ts",
        "2024-01-10 00:00:00", "2024-01-20 23:59:59",
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "lake_bucket_lookup",
    """
    SELECT count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           count(DISTINCT event_type) AS n_types
    FROM events
    WHERE user_id = 7
    """,
    survey_rows="S5,P2,A5,hidden-partitioning",
)
def lake_bucket_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden BUCKET partitioning point lookup: events are published
    bucketed on hash(user_id) % 8 (a derived layout the schema never
    shows) and the per-user lookup recomputes the bucket for the probe
    value on the driver, reading ONE of 8 directories — the layout IS
    the point index, no secondary index build needed (contrast
    `read_point_lookup`, which pays an index job per version). The
    oracle scans the raw parquet with a plain WHERE; the hash match
    proves bucket routing loses no rows. tests/test_hidden_partition.py
    pins the 1-of-8 file accounting and the xxhash64 type-cast rule
    that keeps routing stable across widening evolution."""
    import tempfile

    from ..pipelines import publish_versioned, read_bucket_lookup
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "events_bucket"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(
            load_table(spark, sf_dir, "events"), base,
            partition_transform={
                "source": "user_id", "kind": "bucket", "n": 8,
            },
        )
    df, _, _ = read_bucket_lookup(spark, base, "user_id", 7)
    return df.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "lake_pos_delete_read",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_totalprice <= 200000
    GROUP BY o_orderpriority
    """,
    survey_rows="S5,A1,pos-delete",
)
def lake_pos_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL deletion vectors at the correctness gate
    (pipelines.dedup_rows_pos + delete_rows_pos — the Iceberg
    position-delete shape beside the equality vectors): orders is
    published WITH seven deliberately duplicated rows, then (1) a
    keep-first positional dedup deletes exactly one copy of each
    duplicate — addressable only by physical (file, row-ordinal),
    since every equality predicate matches both copies — and (2) a
    predicate vector deletes `o_totalprice > 200000`. The oracle
    aggregates RAW orders under the same predicate: a hash match
    proves the dedup restored exactly the original multiset and the
    predicate vector subtracted exactly the matching rows, through
    two stacked vector layers and two broadcast anti joins, with no
    data file rewritten."""
    import tempfile

    from ..pipelines import (
        dedup_rows_pos,
        delete_rows_pos,
        publish_versioned,
        read_version,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_pos"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        dup = o.orderBy("o_orderkey").limit(7)
        publish_versioned(o.union(dup).repartition(4), base)
        dedup_rows_pos(spark, base, ["o_orderkey"])
        delete_rows_pos(spark, base, "o_totalprice > 200000")
    df, _ = read_version(spark, base)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "lake_branch_merge_read",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
    survey_rows="S5,lake-branch,A1",
)
def lake_branch_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-branch workflow at the correctness gate
    (pipelines.create_branch / publish_append(branch=...) /
    merge_branch): main is published with half of orders, a branch is
    cut, the other half lands as a BRANCH append (main's readers
    cannot see it — pinned by tests/test_branches.py), and the branch
    fast-forwards into main. This query aggregates the post-merge
    LATEST; the oracle aggregates all of raw orders — the hash match
    proves the branch append + pointer-move merge lost and duplicated
    nothing. At 100 TB the whole workflow costs one O(batch) append:
    branch creation and merge are pointer writes."""
    import tempfile

    from ..pipelines import (
        create_branch,
        merge_branch,
        publish_append,
        publish_versioned,
        read_version_chain,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_branched"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)
        create_branch(spark, base, "experiment")
        publish_append(
            o.filter(F.col("o_orderkey") % 2 == 1),
            base,
            branch="experiment",
        )
        merge_branch(spark, base, "experiment")
    df, _ = read_version_chain(spark, base)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "lake_merge_into_read",
    """
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    ), s AS (
      SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    ), merged AS (
      SELECT t.o_orderkey, t.o_custkey, t.o_orderpriority,
             CASE WHEN s.o_orderkey IS NOT NULL
                       AND NOT t.o_orderpriority = '5-LOW'
                       AND t.o_totalprice < 150000.0
                  THEN s.o_totalprice + 1000.0
                  ELSE t.o_totalprice END AS o_totalprice
      FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
      WHERE NOT (s.o_orderkey IS NOT NULL
                 AND t.o_orderpriority = '5-LOW')
      UNION ALL
      SELECT s.o_orderkey, s.o_custkey, s.o_orderpriority, s.o_totalprice
      FROM s LEFT JOIN t ON t.o_orderkey = s.o_orderkey
      WHERE t.o_orderkey IS NULL AND s.o_totalprice >= 50000.0
    )
    SELECT o_orderpriority AS priority, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM merged GROUP BY 1
    """,
    survey_rows="S5,J2,A1,merge-into",
)
def lake_merge_into_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional MERGE INTO at the correctness gate: the target lake
    table (non-multiple-of-3 order keys) absorbs a source batch (even
    keys) through all three clause kinds at once — matched '5-LOW'
    rows DELETE, other matched rows UPDATE (price + 1000, gated on
    t.o_totalprice < 150000), unmatched source rows INSERT only when
    s.o_totalprice >= 50000. The oracle replays the exact clause
    algebra as LEFT JOIN + CASE + UNION ALL over the raw parquet, so
    the hash match certifies the merge semantics row-for-row
    (pipelines.merge_into; clause matrix + ambiguity refusal in
    tests/test_merge_into.py).

    Cost class: merge_into resolves the current state and publishes a
    full-snapshot rewrite — the O(table) verb (SCALE.md); the O(keys)
    mutations stay with delete_rows_mor/update_rows_cow/CDC apply."""
    import tempfile

    from ..pipelines import merge_into, publish_versioned, read_version
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_merged"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(o.filter(F.col("o_orderkey") % 3 != 0), base)
        merge_into(
            spark,
            base,
            o.filter(F.col("o_orderkey") % 2 == 0),
            ["o_orderkey"],
            when_matched_update={
                "o_totalprice": "s.o_totalprice + 1000.0"
            },
            when_matched_update_cond="t.o_totalprice < 150000.0",
            when_matched_delete_cond="t.o_orderpriority = '5-LOW'",
            when_not_matched_cond="s.o_totalprice >= 50000.0",
        )
    df, _ = read_version(spark, base)
    return df.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "lake_fast_minmax",
    """
    SELECT min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           count(*) AS n_rows
    FROM orders
    """,
    survey_rows="S5,A5,meta-only-agg",
)
def lake_fast_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only `min/max/count` (pipelines.fast_minmax +
    fast_count): orders is published as a two-segment append chain
    with o_totalprice footer stats, and all three aggregates are
    answered from the MANIFESTS ALONE — no scan task runs. Parquet
    footer min/max are the exact file extremes and a chain's extremes
    are the extremes of its files' extremes, so the oracle's full-scan
    aggregates hash-match exactly. MOR heads are refused by
    fast_minmax (deletion may remove the extreme row; carried stats
    become bounds), which is why this lake has no vectors. The
    single-row result is driver-built by design: the capability under
    test is that NO distributed read happens."""
    import tempfile

    from ..pipelines import (
        fast_count,
        fast_minmax,
        publish_append,
        publish_versioned,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_lake", tag, "orders_fastmm"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{base}/LATEST"):
        publish_versioned(
            o.filter(F.col("o_orderkey") % 2 == 0), base,
            stats_cols=["o_totalprice"],
        )
        publish_append(
            o.filter(F.col("o_orderkey") % 2 == 1), base,
            stats_cols=["o_totalprice"],
        )
    lo, hi = fast_minmax(spark, base, "o_totalprice")
    n = fast_count(spark, base)
    return spark.createDataFrame(
        [(lo, hi, n)], "min_price double, max_price double, n_rows bigint"
    )


@register(
    "lake_clone_read",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderkey % 3 < 2
    GROUP BY o_orderpriority
    """,
    survey_rows="S5,A1,snapshot-clone",
)
def lake_clone_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot EXPORT/import at the correctness gate
    (pipelines.clone_snapshot — the Iceberg register_table / Delta
    CLONE shape): the source becomes a full publish (keys % 3 == 0), an
    append (% 3 == 1), and an equality-vector delete; the clone pins
    version 2 — a TIME-TRAVEL clone of the pre-delete state — and then
    the source compacts and vacuums v1/v2 away. This query reads the
    CLONE, so the hash match against the raw-table oracle proves both
    halves of the clone contract at once: the exported manifest chain
    resolves identically at the new base (append parents, pinned
    schema, basename-relative file stats), and the clone's bytes are
    vacuum-independent of the source that no longer holds them
    (tests/test_clone.py covers MOR layers, pos-delete vectors,
    refusals, and clone-side lineage continuation).

    At 100 TB a clone is how a training corpus snapshot leaves its
    producing pipeline: O(chain) manifest reads plus the snapshot's
    bytes via filesystem copies (fan out DistCp-style on a cluster —
    the function enumerates the exact file set), after which retention
    on the hot source can run freely without invalidating any frozen
    experiment."""
    import tempfile

    from ..pipelines import (
        clone_snapshot,
        compact_chain,
        delete_rows_mor,
        publish_append,
        publish_versioned,
        read_version_chain,
        vacuum_versions,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    root = os.path.join(tempfile.gettempdir(), "novelti_dingo_lake", tag)
    src = os.path.join(root, "orders_clone_src")
    dest = os.path.join(root, "orders_clone_dest")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{dest}/LATEST"):
        publish_versioned(o.filter(F.col("o_orderkey") % 3 == 0), src)
        publish_append(o.filter(F.col("o_orderkey") % 3 == 1), src)
        delete_rows_mor(spark, src, "o_orderkey", [3, 4, 6])
        clone_snapshot(spark, src, dest, version=2)
        # the source moves on: compaction folds the chain, vacuum
        # reclaims every version the clone was cut from
        compact_chain(spark, src)
        vacuum_versions(spark, src, keep_last=1)
    df, _ = read_version_chain(spark, dest)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "avro_ingest_agg",
    """
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
    survey_rows="S2,S6,A1,avro",
)
def avro_ingest_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 Avro leg, oracle-checked end-to-end: the supplier table is
    written to an Avro object container file by the BUNDLED JVM Avro
    reference implementation (org.apache.avro DataFileWriter, deflate
    codec) and read back through the clean-room pure-python container
    reader (sources/avro_py.py, a Python DataSource — the pip pyspark
    distribution lacks the spark-avro module, so the leg ships its own
    spec-implementation instead of staying documented-only). The
    aggregate over the Avro copy must hash-match the DuckDB oracle on
    the ORIGINAL parquet: format decode, union handling, and codec
    inflation are all under the hash.

    At 100 TB the reader splits on the container's sync-marker block
    framing (one O(blocks) metadata pass, then executors seek straight
    to their block runs) — the same split strategy the JVM reader uses
    on HDFS; see tests/test_avro_py.py for the multi-partition proof."""
    import tempfile

    from ..sources.avro_py import read_avro, write_avro_reference

    tag = fixture_tag(sf_dir)
    path = os.path.join(
        tempfile.gettempdir(), "novelti_dingo_avro", tag, "supplier.avro"
    )
    if not os.path.exists(path):
        write_avro_reference(
            spark, load_table(spark, sf_dir, "supplier"), path
        )
    s = read_avro(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "lake_shallow_clone_read",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderkey % 3 < 2
    GROUP BY o_orderpriority
    """,
    survey_rows="S5,A1,shallow-clone",
)
def lake_shallow_clone_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW clone at the correctness gate (the zero-copy sibling of
    lake_clone_read; pipelines.shallow_clone_snapshot): the source
    becomes a full publish (keys % 3 == 0), an append (% 3 == 1), and
    an equality-vector delete; the shallow clone pins version 2 — a
    ZERO-COPY time-travel view of the pre-delete state whose only
    destination byte is the `_shallow.json` redirection record. The
    source then moves on hard: the MOR head compacts away, a new append
    lands, and the MOST aggressive vacuum (keep_last=1) runs — which
    would reclaim v1/v2 if the clone's ledger ref (`_refs/shallow-*`)
    did not pin them. This query reads the CLONE base, so the hash
    match proves redirection resolves the pinned lineage exactly AND
    the refcount ledger actually held the bytes against retention
    (tests/test_clone.py proves the converse: release → reclaimed).

    At 100 TB: the clone costs O(chain) manifest reads and ONE control
    file — the dev/test-against-prod-snapshot shape — while the deep
    clone (lake_clone_read) pays the bytes for total independence;
    the ledger is what makes the cheap one safe to hand out."""
    import tempfile

    from ..pipelines import (
        compact_chain,
        delete_rows_mor,
        publish_append,
        publish_versioned,
        read_version_chain,
        shallow_clone_snapshot,
        vacuum_versions,
    )
    from ..sources import lakefs

    tag = fixture_tag(sf_dir)
    root = os.path.join(tempfile.gettempdir(), "novelti_dingo_lake", tag)
    src = os.path.join(root, "orders_sclone_src")
    dest = os.path.join(root, "orders_sclone_dest")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    if not lakefs.exists(spark, f"{dest}/_shallow.json"):
        publish_versioned(o.filter(F.col("o_orderkey") % 3 == 0), src)
        publish_append(o.filter(F.col("o_orderkey") % 3 == 1), src)
        delete_rows_mor(spark, src, "o_orderkey", [3, 4, 6])
        shallow_clone_snapshot(spark, src, dest, version=2)
        # the source moves on: compact, append, aggressive vacuum —
        # only the clone's ledger ref keeps v1/v2 alive
        compact_chain(spark, src)
        publish_append(o.filter(F.col("o_orderkey") % 3 == 2), src)
        vacuum_versions(spark, src, keep_last=1)
    df, _ = read_version_chain(spark, dest)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
