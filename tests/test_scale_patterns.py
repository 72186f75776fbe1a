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

    from novelti_dingo_spark.sources.catalog import save_bucketed

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/ndspark-warehouse/{t}", ignore_errors=True)
    save_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    save_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
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


def test_external_tables_queryable_by_sql(spark, sf_small):
    """Catalog-registered external tables answer plain SQL identically to
    the schema'd path reads, and survive temp-view teardown."""
    from novelti_dingo_spark.sources.catalog import create_external_tables

    names = create_external_tables(spark, sf_small, ["region", "orders"])
    assert set(names) == {"ext_region", "ext_orders"}
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT o_custkey) AS c FROM ext_orders"
    ).first()
    want = load_table(spark, sf_small, "orders")
    assert got.n == want.count()
    assert got.c == want.select("o_custkey").distinct().count()
    # external: dropping the table must not delete the source parquet
    spark.sql("DROP TABLE ext_region")
    assert load_table(spark, sf_small, "region").count() == 5


def test_partitioned_table_prunes_partitions(spark, sf_small):
    """A predicate on the partition column becomes a PartitionFilter —
    whole directories are skipped before any I/O."""
    import shutil

    from novelti_dingo_spark.plans import explain_formatted
    from novelti_dingo_spark.sources.catalog import save_partitioned

    spark.sql("DROP TABLE IF EXISTS p_orders")
    shutil.rmtree("/tmp/ndspark-warehouse/p_orders", ignore_errors=True)
    o = load_table(spark, sf_small, "orders")
    save_partitioned(o, "p_orders", ["o_orderpriority"])
    q = spark.table("p_orders").filter(F.col("o_orderpriority") == "1-URGENT")
    plan = explain_formatted(q)
    assert "PartitionFilters: [" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    want = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert q.count() == want


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_small):
    """Runtime bloom-filter join pruning (the 100 TB fact-scan saver):
    when a selective filter sits on one side of a shuffle join, Spark
    seeds a bloom filter from that side and applies it to the other
    side's scan, skipping fact rows that cannot join BEFORE the shuffle.
    Off at defaults here only because local testdata is below the size
    thresholds — this test lowers them and pins (a) the filter is
    actually injected and (b) results are identical to the plain join."""
    o = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")

    def run():
        sel = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        j = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        return j

    baseline = run().collect()[0]

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        df = run()
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, (
            "runtime bloom filter was not injected:\n" + optimized
        )
        got = df.collect()[0]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert got == baseline


def test_dynamic_partition_pruning_on_join(spark, sf_small):
    """Dynamic partition pruning: joining a partitioned fact table on its
    partition column with a FILTERED dim makes Spark compute the
    surviving partition set at runtime (from the dim side's broadcast)
    and skip the other partitions' files entirely — the partition-level
    sibling of the bloom-filter row pruning above. The plan carries a
    `dynamicpruning` subquery in the fact scan's PartitionFilters."""
    import shutil

    from novelti_dingo_spark.plans import explain_formatted
    from novelti_dingo_spark.sources.catalog import save_partitioned

    spark.sql("DROP TABLE IF EXISTS dpp_orders")
    shutil.rmtree("/tmp/ndspark-warehouse/dpp_orders", ignore_errors=True)
    o = load_table(spark, sf_small, "orders")
    save_partitioned(o, "dpp_orders", ["o_orderpriority"])

    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("5-LOW", 5)], "prio string, rank int"
    ).filter(F.col("rank") == 1)
    fact = spark.table("dpp_orders")
    q = fact.join(dim, fact.o_orderpriority == dim.prio).groupBy().agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = explain_formatted(q)
    assert "dynamicpruning" in plan, plan
    want = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert q.collect()[0].n == want


def test_exchange_reuse_for_shared_subplan(spark, sf_small):
    """Self-union of two aggregates over the same shuffled base: Spark
    plans ONE exchange and a ReusedExchange for the second branch — at
    100 TB the dominant shuffle is paid once, not per branch."""
    from novelti_dingo_spark.plans import explain_formatted

    li = load_table(spark, sf_small, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("q")
    )
    hi = per_order.filter(F.col("q") > 150).withColumn("band", F.lit("hi"))
    lo = per_order.filter(F.col("q") <= 150).withColumn("band", F.lit("lo"))
    u = hi.unionAll(lo).groupBy("band").agg(F.count(F.lit(1)).alias("n"))
    got = {r.band: r.n for r in u.collect()}
    # under AQE the reuse is decided at runtime — assert on the final
    # executed plan, not the static one
    final = u._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final
    assert got["hi"] + got["lo"] == per_order.count()


def test_aqe_splits_skewed_join_partition(spark, sf_small):
    """AQE skew-join handling: a hot key whose partition dwarfs the
    others is split into multiple tasks at runtime (plan shows the skew
    marker), with results identical to the unsplit join. This is the
    no-code-change answer to real-world key skew; the manual salting in
    operators/skew.py remains for aggregations and pre-AQE engines.

    Load-bearing detail: a skewed reduce partition can only split at MAP
    TASK boundaries (each split consumes a subset of mapper outputs), so
    a shuffle fed by a single map task — e.g. one small parquet file —
    can never split, whatever the thresholds. The `repartition(16)`
    below provides the multi-mapper map side that a real 100 TB scan has
    naturally; this is also why coalescing tiny input files (compaction,
    pipelines.compact_parquet) matters for skew handling, not just for
    scan throughput."""
    e = load_table(spark, sf_small, "events").repartition(16, "event_id")
    # manufacture a hot key: collapse most user_ids onto one value
    left = e.select(
        F.when(F.col("user_id") % 10 != 0, F.lit(7))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "event_id",
    )
    right = e.select(F.col("user_id").alias("k"), "value")
    overrides = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        j = left.join(right, "k")
        n_aqe = len(j.collect())
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # ground truth without AQE interference
    n_plain = left.join(right, "k").count()
    assert n_aqe == n_plain
