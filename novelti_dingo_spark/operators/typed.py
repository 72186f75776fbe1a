"""Type-breadth queries (SURVEY.md §1.2 gap noted in round 1): exact
DECIMAL arithmetic and nested-struct projection — the two type families a
financial / event-schema user hits first that the float/flat testdata
doesn't otherwise exercise.

Both queries derive the richer types from the parquet columns in-query
(cast / struct construction), so the same DuckDB oracle runs on the raw
tables. Decimal results cross the comparison boundary as canonical
strings: both engines render a DECIMAL with its full scale ("506627.00"),
which sidesteps engine-specific result-precision widening (Spark sums to
DECIMAL(22,s), DuckDB to DECIMAL(38,s)) while still proving digit-exact
agreement of the decimal arithmetic itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table, widen


@register(
    "decimal_exact_agg",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
             AS sum_qty_dec,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS VARCHAR) AS sum_disc_price_dec,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows="A1,T1",
)
def decimal_exact_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal pricing aggregate: quantities and discounted prices
    cast to DECIMAL before any arithmetic, so the sums are digit-exact
    (no float summation-order drift) — what a financial pipeline requires.
    Decimal aggregation is still a map-side-combinable partial agg (sums
    of unscaled longs under the hood), so the 100 TB shape is identical
    to the double version; only the cents are different."""
    # widen: decimal partial sums off the 3-split lineitem scan
    # (round-14; decimal arithmetic is exact — order-insensitive)
    li = widen(load_table(spark, sf_dir, "lineitem"))
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(qty).cast("string").alias("sum_qty_dec"),
        F.sum(price * (one - disc)).cast("string").alias("sum_disc_price_dec"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "struct_nested_project",
    """
    WITH t AS (
      SELECT struct_pack(
               cust := struct_pack(key := c_custkey, segment := c_mktsegment),
               geo  := struct_pack(nation := n_name, region := r_name)) AS s
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey)
    SELECT s.cust.key AS custkey, s.cust.segment AS segment,
           s.geo.nation AS nation
    FROM t WHERE s.geo.region = 'EUROPE'
    """,
    survey_rows="P1,T2,J4",
)
def struct_nested_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-of-struct construction, nested-field filter, and nested-field
    projection. Catalyst prunes through the struct: the filter on
    s.geo.region and the three projected leaves collapse back to plain
    column references (no struct is ever materialized in the scan), so
    nested schemas cost nothing until a leaf is actually read — the
    property that makes deeply-nested event schemas viable at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = F.struct(
        F.struct(
            F.col("c_custkey").alias("key"),
            F.col("c_mktsegment").alias("segment"),
        ).alias("cust"),
        F.struct(
            F.col("n_name").alias("nation"), F.col("r_name").alias("region")
        ).alias("geo"),
    ).alias("s")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(s)
        .filter(F.col("s.geo.region") == "EUROPE")
        .select(
            F.col("s.cust.key").alias("custkey"),
            F.col("s.cust.segment").alias("segment"),
            F.col("s.geo.nation").alias("nation"),
        )
    )


@register(
    "variant_props_agg",
    """
    SELECT event_type,
           CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k,
           count(*) FILTER (WHERE json_extract(props, '$.k')::INT > 5)
             AS n_high
    FROM events GROUP BY event_type
    """,
    survey_rows="T3,F6,A1,A6",
)
def variant_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns through Spark 4's VARIANT type:
    `parse_json` once into a variant, then typed `variant_get` paths —
    the open-schema ingestion shape (vs. the rigid from_json(schema)
    path in json_map_functions). Variant stores a binary-encoded tree, so
    repeated path extraction skips re-parsing the JSON text; at 100 TB
    ingest parses once and all downstream extractions are binary reads.
    Oracle: DuckDB json_extract over the same props strings."""
    from ..sources.io import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 5, F.lit(1))).alias("n_high"),
    )
