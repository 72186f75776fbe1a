"""Materialized-view auto-rewrite (plans/mv.py) and timestamp time
travel (pipelines.read_as_of): containment algebra answers coarser-grain
aggregates from the k-row MV without touching the fact; every
non-containment case falls back (returns None); as-of resolves the
newest version published at or before the asked timestamp."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    publish_append,
    publish_versioned,
    read_as_of,
)
from novelti_dingo_spark.plans import explain_formatted
from novelti_dingo_spark.plans.mv import MvSpec, publish_mv, rewrite_agg
from novelti_dingo_spark.sources import load_table

SPEC = MvSpec(
    ("l_returnflag", "l_linestatus"),
    {
        "sum_qty": ("sum", "l_quantity"),
        "sum_price": ("sum", "l_extendedprice"),
        "n_items": ("count", None),
    },
)


@pytest.fixture()
def mv(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "pricing_mv")
    li = load_table(spark, sf_small, "lineitem")
    publish_mv(li, base, SPEC)
    return base, li


def test_rewrite_matches_fact_aggregate(spark, mv):
    base, li = mv
    got = rewrite_agg(
        spark,
        base,
        ["l_returnflag"],
        {"sum_qty": "sum_qty", "n_items": "n_items",
         "avg_qty": ("sum_qty", "n_items")},
    )
    assert got is not None
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
    )
    g = {r.l_returnflag: r for r in got.collect()}
    w = {r.l_returnflag: r for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert abs(g[k].sum_qty - w[k].sum_qty) < 1e-6
        assert g[k].n_items == w[k].n_items
        assert abs(g[k].avg_qty - w[k].avg_qty) < 1e-9


def test_rewrite_plan_never_scans_the_fact(spark, mv):
    base, _ = mv
    got = rewrite_agg(spark, base, ["l_returnflag"], {"sum_qty": "sum_qty"})
    plan = explain_formatted(got)
    assert "pricing_mv" in plan
    assert "lineitem.parquet" not in plan


def test_group_key_predicate_prunes_mv_rows(spark, mv):
    base, li = mv
    got = rewrite_agg(
        spark,
        base,
        ["l_returnflag"],
        {"n_items": "n_items"},
        predicate=F.col("l_linestatus") == "F",
        predicate_cols=["l_linestatus"],
    )
    assert got is not None
    want = {
        r.l_returnflag: r.n
        for r in li.filter(F.col("l_linestatus") == "F")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.l_returnflag: r.n_items for r in got.collect()} == want


def test_non_containment_falls_back(spark, mv):
    base, _ = mv
    # finer grain than the MV
    assert rewrite_agg(
        spark, base, ["l_returnflag", "l_shipmode"], {"sum_qty": "sum_qty"}
    ) is None
    # unknown measure
    assert rewrite_agg(
        spark, base, ["l_returnflag"], {"x": "sum_discount"}
    ) is None
    # avg not derivable from (sum, count) published measures
    assert rewrite_agg(
        spark, base, ["l_returnflag"], {"a": ("sum_qty", "sum_price")}
    ) is None
    # predicate on a non-group-key column
    assert rewrite_agg(
        spark,
        base,
        ["l_returnflag"],
        {"n_items": "n_items"},
        predicate=F.col("l_quantity") > 10,
        predicate_cols=["l_quantity"],
    ) is None
    # a dataset that is not an MV at all
    assert MvSpec.from_manifest({"rows": 3}) is None


def test_holistic_measure_rejected_at_publish(spark, mv, tmp_path):
    _, li = mv
    with pytest.raises(ValueError, match="not algebraic"):
        publish_mv(
            li,
            os.path.join(str(tmp_path), "bad_mv"),
            MvSpec(("l_returnflag",), {"med": ("median", "l_quantity")}),
        )


def test_incremental_refresh_equals_full_recompute(spark, sf_small, tmp_path):
    from novelti_dingo_spark.plans.mv import refresh_mv

    li = load_table(spark, sf_small, "lineitem")
    old = li.filter(F.col("l_orderkey") % 3 != 0)
    delta = li.filter(F.col("l_orderkey") % 3 == 0)
    base = os.path.join(str(tmp_path), "mv_incr")
    publish_mv(old, base, SPEC)
    v = refresh_mv(spark, base, delta)
    assert v == 2
    # refreshed MV must answer queries identically to an MV built from
    # the FULL fact — per-key measures equal at float precision
    full_base = os.path.join(str(tmp_path), "mv_full")
    publish_mv(li, full_base, SPEC)
    got = rewrite_agg(
        spark, base, ["l_returnflag"],
        {"sum_qty": "sum_qty", "n_items": "n_items"},
    )
    want = rewrite_agg(
        spark, full_base, ["l_returnflag"],
        {"sum_qty": "sum_qty", "n_items": "n_items"},
    )
    g = {r.l_returnflag: r for r in got.collect()}
    w = {r.l_returnflag: r for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k].n_items == w[k].n_items
        assert abs(g[k].sum_qty - w[k].sum_qty) < 1e-6


def test_refresh_rejects_non_mv(spark, sf_small, tmp_path):
    from novelti_dingo_spark.plans.mv import refresh_mv

    li = load_table(spark, sf_small, "lineitem")
    base = os.path.join(str(tmp_path), "not_mv")
    publish_versioned(li.limit(5), base)
    with pytest.raises(ValueError, match="not a materialized view"):
        refresh_mv(spark, base, li.limit(5))


def test_choose_mv_picks_smallest_containing(spark, sf_small, tmp_path):
    from novelti_dingo_spark.plans.mv import choose_mv

    li = load_table(spark, sf_small, "lineitem")
    coarse = os.path.join(str(tmp_path), "mv_coarse")
    fine = os.path.join(str(tmp_path), "mv_fine")
    publish_mv(li, coarse, SPEC)
    publish_mv(
        li,
        fine,
        MvSpec(
            ("l_returnflag", "l_linestatus", "l_shipdate"),
            dict(SPEC.measures),
        ),
    )
    m = {"sum_qty": "sum_qty"}
    # both contain the returnflag grain -> the smaller (coarse) MV wins
    assert choose_mv(spark, [fine, coarse], ["l_returnflag"], m) == coarse
    # only the fine MV contains a shipdate grouping
    assert (
        choose_mv(spark, [fine, coarse], ["l_returnflag", "l_shipdate"], m)
        == fine
    )
    # nothing contains an unknown key or measure
    assert choose_mv(spark, [fine, coarse], ["l_partkey"], m) is None
    assert choose_mv(spark, [fine, coarse], ["l_returnflag"], {"x": "nope"}) is None
    # non-MV and missing candidates are skipped, not fatal
    assert (
        choose_mv(
            spark,
            [os.path.join(str(tmp_path), "missing"), coarse],
            ["l_returnflag"],
            m,
        )
        == coarse
    )


def test_read_as_of_is_chain_aware(spark, sf_small, tmp_path):
    """Time travel onto an APPEND CHAIN must return the full snapshot at
    the resolved version — the chain union, never the head segment's
    delta alone."""
    base = os.path.join(str(tmp_path), "orders_tt")
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    publish_versioned(
        o.limit(10), base, published_ts="2026-01-01T00:00:00.000000Z"
    )
    publish_append(
        o.filter(F.col("o_orderkey") >= 10).limit(5),
        base,
        published_ts="2026-02-01T00:00:00.000000Z",
    )
    df1, m1 = read_as_of(spark, base, "2026-01-15T00:00:00.000000Z")
    assert m1["version"] == 1
    assert df1.count() == 10
    df2, m2 = read_as_of(spark, base, "2026-03-01T00:00:00.000000Z")
    assert m2["version"] == 2
    assert df2.count() == 15  # chain snapshot, not the 5-row delta
    with pytest.raises(LookupError, match="no version"):
        read_as_of(spark, base, "2025-12-31T00:00:00.000000Z")


def test_join_mv_delta_refresh_equals_full_recompute(
    spark, sf_small, tmp_path
):
    """A JOIN MV (fact ⋈ dim pre-aggregated at dim-attribute grain)
    refreshes incrementally by joining ONLY the fact delta to the dim
    and merging — legal because the fact is append-only and the dim
    stable, the contract refresh_mv documents. Delta-refreshed MV must
    equal a from-scratch recompute over the full fact."""
    from novelti_dingo_spark.plans.mv import refresh_mv

    o = load_table(spark, sf_small, "orders")
    c = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spec = MvSpec(
        ("c_mktsegment",),
        {"total_price": ("sum", "o_totalprice"), "n_orders": ("count", None)},
    )
    old = o.filter(F.col("o_orderkey") % 3 != 0)
    delta = o.filter(F.col("o_orderkey") % 3 == 0)

    def joined(fact):
        return fact.join(
            F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
        )

    base = os.path.join(str(tmp_path), "join_mv")
    publish_mv(joined(old), base, spec)
    refresh_mv(spark, base, joined(delta))

    from novelti_dingo_spark.pipelines import read_version

    got, manifest = read_version(spark, base)
    full = os.path.join(str(tmp_path), "join_mv_full")
    publish_mv(joined(o), full, spec)
    want, _ = read_version(spark, full)
    g = {
        r.c_mktsegment: (round(r.total_price, 2), r.n_orders)
        for r in got.collect()
    }
    w = {
        r.c_mktsegment: (round(r.total_price, 2), r.n_orders)
        for r in want.collect()
    }
    assert g == w and manifest["version"] == 2
    # the refreshed MV still answers rewrites (algebra preserved)
    ans = rewrite_agg(
        spark, base, ["c_mktsegment"], {"n_orders": "n_orders"}
    )
    assert ans is not None
    assert {r.c_mktsegment: r.n_orders for r in ans.collect()} == {
        k: v[1] for k, v in w.items()
    }
