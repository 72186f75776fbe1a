"""Scalar function families (SURVEY.md §2.8 F1-F7) and the grouped UDF
surface (§2.11 X2-X3).

Every family gets at least one oracle-checked query over the testdata.
Cross-engine hazards handled here:
- day-of-week numbering differs (Spark: Sunday=1; DuckDB: Sunday=0) —
  the oracle compensates explicitly;
- transcendentals (ln/log10/pow) may differ by 1 ulp across libms —
  rounded to 6dp on both sides;
- raw row-level +-*/ arithmetic is IEEE-exact on both engines — left
  unrounded deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from ..registry import register
from ..sources.io import keyed_widen, load_table


@register(
    "str_funcs",
    """
    SELECT doc_id,
           upper(substr(text, 1, 12))                       AS head_upper,
           length(text)                                     AS text_len,
           len(string_split(text, ' '))                     AS n_tokens,
           concat(lang, ':', source)                        AS lang_source,
           regexp_extract(text, '^([a-z]+)', 1)             AS first_word,
           replace(substr(text, 1, 20), ' ', '_')           AS head_snake,
           regexp_replace(substr(text, 1, 15), '[aeiou]', '*', 'g') AS vowels_masked,
           trim(' ' || lang || ' ')                         AS lang_trim
    FROM documents WHERE doc_id < 100
    """,
    survey_rows="F1",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string family — case, substring, length, split, concat, regex,
    replace, trim. All JVM intrinsics inside codegen."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.length("text").cast("long").alias("text_len"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.replace(
            F.substring("text", 1, 20), F.lit(" "), F.lit("_")
        ).alias("head_snake"),
        F.regexp_replace(F.substring("text", 1, 15), "[aeiou]", "*").alias(
            "vowels_masked"
        ),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
    )


@register(
    "date_funcs",
    """
    SELECT o_orderkey,
           year(o_orderdate)                                   AS o_year,
           month(o_orderdate)                                  AS o_month,
           dayofmonth(o_orderdate)                             AS o_day,
           dayofweek(o_orderdate) + 1                          AS o_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           strftime(last_day(o_orderdate::DATE), '%Y-%m-%d')   AS month_end,
           quarter(o_orderdate)                                AS o_quarter
    FROM orders WHERE o_orderkey < 200
    """,
    survey_rows="F2",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time family. Spark dayofweek is Sunday=1 vs DuckDB
    Sunday=0 — the oracle adds 1. Timestamps leave as formatted strings."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") < 200).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.dayofweek("o_orderdate").cast("long").alias("o_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("plus_30d"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
    )


@register(
    "math_funcs",
    """
    SELECT o_orderkey,
           abs(o_totalprice - 150000)            AS abs_diff,
           CAST(ceil(o_totalprice / 1000) AS BIGINT)  AS price_k_ceil,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k_floor,
           round(sqrt(o_totalprice), 6)          AS sqrt_price,
           round(ln(o_totalprice), 6)            AS ln_price,
           round(log10(o_totalprice), 6)         AS log10_price,
           round(pow(o_totalprice / 100000, 2), 6) AS pow_price,
           o_orderkey % 7                        AS key_mod7,
           CAST(sign(o_totalprice - 150000) AS DOUBLE) AS above_mid
    FROM orders WHERE o_orderkey < 300
    """,
    survey_rows="F3",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math family — transcendentals rounded to 6dp (libm 1-ulp
    differences across engines); integer and IEEE-exact ops raw."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        F.abs(p - 150000).alias("abs_diff"),
        F.ceil(p / 1000).alias("price_k_ceil"),
        F.floor(p / 1000).alias("price_k_floor"),
        F.round(F.sqrt(p), 6).alias("sqrt_price"),
        F.round(F.log(p), 6).alias("ln_price"),
        F.round(F.log10(p), 6).alias("log10_price"),
        F.round(F.pow(p / 100000, 2), 6).alias("pow_price"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.signum(p - 150000).cast("double").alias("above_mid"),
    )


@register(
    "null_funcs",
    """
    SELECT s_suppkey,
           coalesce(nullif(s_name, 'SUPP_0'), 'anonymous') AS display_name,
           least(s_acctbal, 5000.0)                        AS capped_bal,
           greatest(s_acctbal, 0.0)                        AS floored_bal,
           CASE WHEN nullif(s_nationkey, 0) IS NULL THEN 'zero-nation'
                ELSE 'other' END                           AS nation_class
    FROM supplier
    """,
    survey_rows="F4",
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: null-handling family — coalesce/nullif/least/greatest."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(
            F.nullif(F.col("s_name"), F.lit("SUPP_0")), F.lit("anonymous")
        ).alias("display_name"),
        F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("capped_bal"),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("floored_bal"),
        F.when(F.nullif(F.col("s_nationkey"), F.lit(0)).isNull(), "zero-nation")
        .otherwise("other")
        .alias("nation_class"),
    )


@register(
    "array_funcs",
    """
    SELECT vec_id,
           len(embedding)                                          AS dim,
           round(embedding[1]::DOUBLE, 6)                          AS first_elem,
           round(list_sum(list_transform(embedding[1:8]::DOUBLE[],
                                         x -> x * x)), 6)          AS head8_sq_sum,
           round(list_max(embedding::DOUBLE[]), 6)                 AS max_elem,
           len(list_filter(embedding::DOUBLE[], x -> x > 0))       AS n_positive
    FROM embeddings WHERE vec_id < 100
    """,
    survey_rows="F5",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: array family — size, indexing, slice, transform/filter/
    aggregate lambdas. These HOFs are the vector-math workhorses."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    head8 = F.slice(emb_d, 1, 8)
    return e.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(emb_d, 1), 6).alias("first_elem"),
        F.round(
            F.aggregate(
                F.transform(head8, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("head8_sq_sum"),
        F.round(F.array_max(emb_d), 6).alias("max_elem"),
        F.size(F.filter(emb_d, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register(
    "hash_funcs",
    """
    SELECT doc_id,
           md5(text)                 AS text_md5,
           sha256(text)              AS text_sha256,
           md5(concat(lang, source)) AS meta_md5
    FROM documents WHERE doc_id < 100
    """,
    survey_rows="F7",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: content hashing (md5 / sha-256 hex — identical across engines;
    xxhash64 is Spark-only and used in the LSH internals instead)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat("lang", "source")).alias("meta_md5"),
    )


# --- Grouped UDF surface (X2, X3) ------------------------------------------


@register(
    "grouped_normalize",
    """
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS value_z
    FROM events
    """,
    survey_rows="X2",
)
def grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: per-group z-score via applyInPandas (grouped-map pandas UDF).

    Exercises the Arrow grouped-map path; the oracle expresses the same
    semantics with window functions — which is also the pure-JVM way to
    write this when the per-group logic is SQL-expressible. pandas std
    uses ddof=1 == stddev_samp."""
    import pandas as pd  # noqa: F401

    e = load_table(spark, sf_dir, "events")
    out_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value_z", DoubleType()),
        ]
    )

    import pandas as pd

    def normalize(pdf):
        std = pdf["value"].std()  # ddof=1
        z = ((pdf["value"] - pdf["value"].mean()) / std).round(6)
        # single-row groups: pandas yields NaN, SQL stddev_samp yields NULL
        # — emit as object column so Arrow maps missing to null, not NaN
        vz = [None if pd.isna(x) else float(x) for x in z]
        return pdf.assign(value_z=pd.Series(vz, index=pdf.index, dtype=object))[
            ["event_id", "user_id", "value_z"]
        ]

    # keyed_widen: AQE coalesces the groupBy shuffle to ~1 reduce
    # partition at this data size, serializing ~1.5k python group calls
    # on one worker (guide §2.5/§4.3); the AQE-exempt keyed repartition
    # replaces (not adds to) the groupBy exchange. 4994 -> 877 ms warm.
    src = keyed_widen(e.select("event_id", "user_id", "value"), "user_id")
    return src.groupBy("user_id").applyInPandas(normalize, out_schema)


@register(
    "grouped_agg_geomean",
    """
    SELECT event_type,
           round(exp(avg(ln(value + 1))), 6) AS geomean_value
    FROM events GROUP BY event_type
    """,
    survey_rows="X3",
)
def grouped_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: grouped-agg pandas UDF (UDAF surface) — geometric mean of
    (value+1) per event type. float64 mean over a few thousand rows agrees
    with the oracle at 6dp."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.util import PythonEvalType

    def _geomean(v):  # pd.Series -> float
        return round(float(np.exp(np.log(v.to_numpy() + 1.0).mean())), 6)

    geomean = pandas_udf(
        _geomean, DoubleType(), functionType=PythonEvalType.SQL_GROUPED_AGG_PANDAS_UDF
    )

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(geomean("value").alias("geomean_value"))


@register(
    "bit_hex_funcs",
    """
    SELECT event_id,
           event_id & 255                    AS low_byte,
           (user_id | 1)                     AS odd_user,
           xor(event_id, user_id)            AS xored,
           event_id << 2                     AS shl2,
           event_id >> 1                     AS shr1,
           hex(event_id)                     AS id_hex
    FROM events WHERE event_id < 300
    """,
    survey_rows="F3",
)
def bit_hex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: bitwise family (AND/OR/XOR/shifts) + hex formatting — the bit
    plumbing the SimHash/LSH internals rely on, surfaced as an
    oracle-checked query."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") < 300).select(
        "event_id",
        F.col("event_id").bitwiseAND(255).alias("low_byte"),
        F.col("user_id").bitwiseOR(1).alias("odd_user"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft(F.col("event_id"), 2).alias("shl2"),
        F.shiftright(F.col("event_id"), 1).alias("shr1"),
        F.hex(F.col("event_id")).alias("id_hex"),
    )


@register(
    "date_arith_funcs",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')   AS plus_3_months,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')  AS week_start,
           (2001 - year(o_orderdate)) * 12 + (8 - month(o_orderdate)) AS months_to_ref,
           datediff('day', o_orderdate, TIMESTAMP '2001-08-01') // 7   AS weeks_to_ref,
           strftime(make_date(year(o_orderdate), 12, 31), '%Y-%m-%d') AS year_end
    FROM orders WHERE o_orderkey < 200
    """,
    survey_rows="F2",
)
def date_arith_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: calendar arithmetic — add_months, week truncation (both engines
    start Monday), month/week spans via explicit integer arithmetic
    (cross-engine month-difference semantics differ, so the span is
    computed identically on both sides), make_date."""
    o = load_table(spark, sf_dir, "orders")
    ref_y, ref_m = 2001, 8
    return o.filter(F.col("o_orderkey") < 200).select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus_3_months"
        ),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias(
            "week_start"
        ),
        (
            (ref_y - F.year("o_orderdate")) * 12 + (ref_m - F.month("o_orderdate"))
        ).cast("long").alias("months_to_ref"),
        F.floor(
            F.datediff(F.lit("2001-08-01").cast("date"), F.to_date("o_orderdate")) / 7
        ).alias("weeks_to_ref"),
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.lit(12), F.lit(31)), "yyyy-MM-dd"
        ).alias("year_end"),
    )


@register(
    "error_safe_funcs",
    """
    SELECT o_orderkey,
           o_totalprice / nullif(o_custkey % 5, 0)              AS safe_div,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)    AS prio_num,
           TRY_CAST(o_orderstatus AS BIGINT)                    AS status_num,
           [o_orderkey, o_custkey][3]                           AS oob_elem
    FROM orders
    WHERE o_orderkey < 500
    """,
    survey_rows="F8,F4",
)
def error_safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: error-safe expression family — the ANSI-mode companions that
    turn runtime errors into NULLs instead of failing a 1000-executor
    job 6 hours in: try_divide (÷0), try_cast (malformed input),
    try_element_at (out-of-bounds). DuckDB spells them NULLIF-guarded
    division, TRY_CAST, and (naturally NULL-returning) list indexing.

    At scale this is a data-quality posture, not sugar: with ANSI SQL
    mode on (correctness default), one malformed row aborts the stage;
    try_* keeps the job alive and lets the quarantine path (S2,
    read_json_quarantine) collect offenders instead."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.try_divide("o_totalprice", F.col("o_custkey") % 5).alias("safe_div"),
        F.try_to_number(
            F.substring("o_orderpriority", 1, 1), F.lit("9")
        ).cast("long").alias("prio_num"),
        F.expr("try_cast(o_orderstatus AS bigint)").alias("status_num"),
        F.try_element_at(
            F.array(F.col("o_orderkey"), F.col("o_custkey")), F.lit(3)
        ).alias("oob_elem"),
    )


@register(
    "histogram_totalprice",
    """
    SELECT CAST(least(floor(o_totalprice / 50000.0), 11) AS BIGINT) AS bucket,
           50000.0 * least(floor(o_totalprice / 50000.0), 11)       AS bucket_lo,
           count(*)                                                 AS n,
           round(sum(o_totalprice), 2)                              AS total
    FROM orders
    GROUP BY 1, 2
    """,
    survey_rows="A9,A1,F3",
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: equal-width histogram (fixed 50k buckets, top-capped) — the
    single-pass distribution profile behind data validation dashboards
    and Z-order column choice. Bucket id from one double divide + floor
    (identical IEEE op in both engines); one partial-aggregable groupBy
    on a ≤12-value key, so the shuffle is 12 rows regardless of table
    size. (DuckDB lacks width_bucket; the arithmetic is spelled out for
    both engines to keep the expressions bit-identical.)"""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(11))
    return (
        o.groupBy(
            bucket.cast("long").alias("bucket"),
            (bucket * 50000.0).alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
