"""Round-15 optimization pins: the per-invocation knn corpus rebuild
(no cross-invocation cache), the PPJoin empty-corpus / no-barriers
guards around the bitmap-verify bounds probe, and the NULL-safe
order-statistics percentile."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from novelti_dingo_spark.barrier import no_barriers
from novelti_dingo_spark import schemas


def test_knn_corpus_rebuilds_per_invocation(spark, sf_small):
    """The round-14 verdict retired similarity._CORPUS_CACHE (a
    module-level .cache() serving a headline query across invocations).
    Pin: no such cache attribute exists any more, two invocations agree,
    and the executed plan reads a checkpoint scan, not CacheManager."""
    from novelti_dingo_spark.operators import similarity

    assert not hasattr(similarity, "_CORPUS_CACHE")
    assert not hasattr(similarity, "_pinned_corpus")
    df1 = similarity.knn_bruteforce_top10(spark, sf_small)
    rows1 = [tuple(r) for r in df1.collect()]
    rows2 = [
        tuple(r)
        for r in similarity.knn_bruteforce_top10(spark, sf_small).collect()
    ]
    assert rows1 == rows2 and len(rows1) == 10
    plan = df1._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan, plan


def test_ppjoin_empty_corpus_returns_empty(spark, tmp_path):
    """An empty documents corpus used to raise TypeError in the bitmap
    bounds probe (int(None - None)); it must return an empty result
    through the array branch instead (round-15 ADVICE fix)."""
    from novelti_dingo_spark.operators import dedup

    empty_sf = str(tmp_path / "emptysf")
    os.makedirs(empty_sf)
    spark.createDataFrame([], schemas.TABLES["documents"]).write.parquet(
        os.path.join(empty_sf, "documents.parquet")
    )
    out = dedup.jaccard_pairs_prefix_filter(spark, empty_sf)
    assert out.count() == 0
    assert set(out.columns) == {"doc_a", "doc_b", "jaccard"}


def test_ppjoin_audit_plan_skips_bounds_probe(spark, sf_small):
    """Under no_barriers() (plan audits) the driver-side gid bounds
    probe would recompute the whole explode+rank subtree; the audit
    path must take the array branch without any eager action, and its
    plan must carry the array_intersect verify, not the bitmap."""
    from novelti_dingo_spark.operators import dedup

    with no_barriers():
        df = dedup.jaccard_pairs_prefix_filter(spark, sf_small)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" in plan, plan
    assert "bit_count" not in plan, plan


def _anti_join_strategy(df) -> str:
    """Name of the physical join node executing the MOR anti-join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in (
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
    ):
        if node in plan:
            return node
    return "none: " + plan[:400]


def test_iceberg_delete_size_guard_switches_join_strategy(
    spark, sf_small, tmp_path, monkeypatch
):
    """Round-14 verdict #8 plan evidence: the MOR delete-relation size
    guard must BROADCAST small delete relations (explicit hint — holds
    even with auto-broadcast off) and DROP the hint past the row
    threshold so the anti-join shuffles instead of OOMing executors."""
    from novelti_dingo_spark.sources import iceberg
    from novelti_dingo_spark.sources.iceberg import (
        delete_rows_from_iceberg_table,
        read_iceberg_table,
        write_iceberg_table,
    )
    from novelti_dingo_spark.sources.io import load_table

    base = str(tmp_path / "t")
    s = load_table(spark, sf_small, "supplier")
    write_iceberg_table(s, base)
    delete_rows_from_iceberg_table(spark, base, "s_suppkey % 3 = 0")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = read_iceberg_table(spark, base)
        n_hinted = hinted.count()
        assert _anti_join_strategy(hinted) == "BroadcastHashJoin"
        monkeypatch.setattr(iceberg, "MOR_BROADCAST_MAX_DELETE_ROWS", 0)
        unhinted = read_iceberg_table(spark, base)
        assert unhinted.count() == n_hinted  # same rows either way
        assert _anti_join_strategy(unhinted) in (
            "SortMergeJoin", "ShuffledHashJoin"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_delta_dv_size_guard_switches_join_strategy(
    spark, sf_small, tmp_path, monkeypatch
):
    """Delta half of the same guard: small DV ordinal sets broadcast
    (explicit hint); past DV_BROADCAST_MAX_DELETE_ROWS the ordinals
    spill to parquet and Catalyst plans from the spill's stats — with
    auto-broadcast off that is a shuffle join, never a forced
    broadcast."""
    from novelti_dingo_spark.sources import delta_log
    from novelti_dingo_spark.sources.delta_log import (
        delete_rows_from_delta_table,
        read_delta_table,
        write_delta_table,
    )
    from novelti_dingo_spark.sources.io import load_table

    base = str(tmp_path / "d")
    s = load_table(spark, sf_small, "supplier")
    write_delta_table(s, base)
    delete_rows_from_delta_table(spark, base, "s_suppkey % 3 = 0")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = read_delta_table(spark, base)
        n_hinted = hinted.count()
        assert _anti_join_strategy(hinted) == "BroadcastHashJoin"
        monkeypatch.setattr(delta_log, "DV_BROADCAST_MAX_DELETE_ROWS", 0)
        spilled = read_delta_table(spark, base)
        assert spilled.count() == n_hinted
        assert _anti_join_strategy(spilled) in (
            "SortMergeJoin", "ShuffledHashJoin"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_mode_tie_break_is_deterministic(spark, tmp_path):
    """sf0.001 has a mode tie (status P: two priorities at 111) and a
    tied mode() follows aggregation-map merge order — it flipped between
    gate runs (round-15 inherited-state fix). The query must now break
    ties to the LOWEST value, matching the oracle's ORDER BY count DESC,
    value ASC."""
    from novelti_dingo_spark.operators.extras import agg_argminmax_mode

    sf = str(tmp_path / "tiesf")
    os.makedirs(sf)
    import datetime as dt

    full = schemas.TABLES["orders"]
    d = dt.datetime(1996, 1, 1)
    rows = [
        # status X: 'b' and 'a' tied 2-2 -> must pick 'a' (lowest)
        (1, 10, "X", 100.0, d, "b"),
        (2, 11, "X", 200.0, d, "b"),
        (3, 12, "X", 300.0, d, "a"),
        (4, 13, "X", 400.0, d, "a"),
        # status Y: 'z' wins untied -> unchanged semantics
        (5, 14, "Y", 150.0, d, "z"),
        (6, 15, "Y", 250.0, d, "z"),
        (7, 16, "Y", 350.0, d, "a"),
    ]
    spark.createDataFrame(rows, full).write.parquet(
        os.path.join(sf, "orders.parquet")
    )
    got = {
        r["o_orderstatus"]: r["top_priority"]
        for r in agg_argminmax_mode(spark, sf).collect()
    }
    assert got == {"X": "a", "Y": "z"}


def test_iceberg_overwrite_diff_equals_exceptall(spark, sf_small, tmp_path):
    """Round-15: the overwrite leg of read_iceberg_changes computes the
    multiset diff as ONE signed-count aggregation (union ±1 → groupBy →
    replicate |Δ|) instead of two exceptAll pipelines that scanned both
    resolved snapshots twice. Pin exact multiset equality against the
    exceptAll form on a real merge commit (which snapshots as an
    overwrite)."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.sources.iceberg import (
        iceberg_snapshots,
        merge_into_iceberg_table,
        read_iceberg_changes,
        read_iceberg_table,
        write_iceberg_table,
    )
    from novelti_dingo_spark.sources.io import load_table

    base = str(tmp_path / "ice")
    s = load_table(spark, sf_small, "supplier")
    cols = s.columns
    write_iceberg_table(s, base)
    upd = s.filter(F.col("s_nationkey") < 10).withColumn(
        "s_acctbal", F.col("s_acctbal") + 5000
    )
    ins = s.filter(F.col("s_nationkey") >= 20).withColumn(
        "s_suppkey", F.col("s_suppkey") + 1_000_000
    )
    merge_into_iceberg_table(
        spark, base, upd.select(*cols).unionAll(ins.select(*cols)),
        on=["s_suppkey"],
    )
    snaps = iceberg_snapshots(base)
    got = sorted(
        tuple(r)
        for r in read_iceberg_changes(
            spark, base, snaps[0]["snapshot_id"]
        ).collect()
    )
    before = read_iceberg_table(
        spark, base, snapshot_id=snaps[0]["snapshot_id"]
    )
    after = read_iceberg_table(
        spark, base, snapshot_id=snaps[1]["snapshot_id"]
    )
    sid = snaps[1]["snapshot_id"]
    ref = (
        after.exceptAll(before)
        .select(*cols, F.lit("insert").alias("_change_type"))
        .unionAll(
            before.exceptAll(after)
            .select(*cols, F.lit("delete").alias("_change_type"))
        )
        .select("*", F.lit(int(sid)).cast("long").alias("_snapshot_id"))
    )
    want = sorted(tuple(r) for r in ref.collect())
    assert got == want and len(got) > 0


def test_percentile_order_stats_ignore_nulls(spark, tmp_path):
    """agg_stats_moments' order-statistics percentile must match
    F.percentile's NULL handling (ignore them) — round-15 ADVICE fix.
    Build a lineitem with NULL l_extendedprice rows and compare the
    percentile columns against the plain F.percentile aggregate."""
    from novelti_dingo_spark.operators.extras import agg_stats_moments

    sf = str(tmp_path / "nullsf")
    os.makedirs(sf)
    rows = [
        ("A", float(q), float(p))
        for q, p in [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)]
    ] + [("A", 5.0, None), ("B", 1.0, 7.0), ("B", 2.0, None)]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double"
    )
    full = schemas.TABLES["lineitem"]
    base = spark.createDataFrame([], full)
    cols = [
        F.col(c) if c in li.columns else F.lit(None).cast(f.dataType).alias(c)
        for c, f in zip(base.schema.names, base.schema.fields)
    ]
    li.select(*cols).write.parquet(os.path.join(sf, "lineitem.parquet"))
    got = {
        r["l_returnflag"]: (r["price_median"], r["price_p90"])
        for r in agg_stats_moments(spark, sf).collect()
    }
    want = {
        r["l_returnflag"]: (r["m"], r["p"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("m"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p"),
        )
        .collect()
    }
    assert got == want
