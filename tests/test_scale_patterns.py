"""Scale-pattern tests: salted joins/aggs produce identical results to
their plain forms, and bucketed tables co-locate joins (no Exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.operators.skew import salted_grouped_agg, salted_join
from novelti_dingo_spark.sources import load_table


def test_salted_join_equals_plain_join(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, sf_small, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, o, key="l_orderkey", row_id="l_linenumber")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_equals_plain_agg(spark, sf_small):
    e = load_table(spark, sf_small, "events")
    plain = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    salted = salted_grouped_agg(
        e,
        key="event_type",
        row_id="event_id",
        aggs=[F.count(F.lit(1)).alias("pn"), F.sum("value").alias("ps")],
        reaggs=[F.sum("pn").alias("n"), F.round(F.sum("ps"), 2).alias("s")],
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark, sf_small, tmp_path):
    """Bucketed-by-join-key tables join without any Exchange — the
    co-located join that saves the dominant shuffle at 100 TB."""
    import shutil

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/ndspark-warehouse/{t}", ignore_errors=True)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("b_lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("b_orders")
    # force SMJ (tiny test tables would otherwise broadcast — a
    # BroadcastExchange, which is not a shuffle); at real scale both
    # sides exceed the broadcast threshold and SMJ is what Spark picks
    joined = spark.table("b_lineitem").hint("merge").join(
        spark.table("b_orders").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    from novelti_dingo_spark.plans import explain_formatted

    plan = explain_formatted(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == li.count()
