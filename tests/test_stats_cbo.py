"""Manifest-NDV statistics feeding join planning
(plans.stats_cbo.plan_star_join): the stats publish_versioned collects
for free (Observation ndv_cols) now DRIVE two planner decisions, each
pinned as a with-stats / without-stats plan difference:

- broadcast: a dim whose rows x row-width estimate fits the threshold
  is broadcast even when Spark's own file-size heuristic would not
  (autoBroadcastJoinThreshold=-1 simulates the 100 TB regime where raw
  file sizes exceed every threshold);
- star-join order: the most selective FK dim (containment estimate
  ndv_dim / max(ndv_fact, ndv_dim)) joins first; without stats the
  declared order is kept.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import publish_versioned, read_version
from novelti_dingo_spark.plans import (
    DimSpec,
    estimated_size_bytes,
    explain_formatted,
    manifest_ndv,
    plan_star_join,
)
from novelti_dingo_spark.sources.io import load_table


def _published_star(spark, sf_small, tmp_path):
    """Fact = orders (keyed by custkey); dim_all covers every custkey,
    dim_tenth covers ~10% of them — joining dim_tenth first shrinks the
    fact 10x before the wide join."""
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    fact_dir = str(tmp_path / "fact")
    all_dir = str(tmp_path / "dim_all")
    tenth_dir = str(tmp_path / "dim_tenth")
    publish_versioned(o, fact_dir, ndv_cols=["o_custkey"])
    publish_versioned(c, all_dir, ndv_cols=["c_custkey"])
    publish_versioned(
        c.filter(F.col("c_custkey") % 10 == 0).select(
            F.col("c_custkey").alias("t_custkey"),
            F.col("c_mktsegment").alias("t_segment"),
        ),
        tenth_dir,
        ndv_cols=["t_custkey"],
    )
    fact, fm = read_version(spark, fact_dir)
    d_all, am = read_version(spark, all_dir)
    d_tenth, tm = read_version(spark, tenth_dir)
    return fact, fm, d_all, am, d_tenth, tm


def test_manifest_stats_present_and_sized(spark, sf_small, tmp_path):
    fact, fm, d_all, am, d_tenth, tm = _published_star(
        spark, sf_small, tmp_path
    )
    assert manifest_ndv(fm, "o_custkey") > 0
    assert manifest_ndv(tm, "t_custkey") < manifest_ndv(am, "c_custkey")
    assert estimated_size_bytes(am) > 0


def test_stats_reorder_most_selective_first(spark, sf_small, tmp_path):
    fact, fm, d_all, am, d_tenth, tm = _published_star(
        spark, sf_small, tmp_path
    )
    dims = [  # declared order is pessimal: the covering dim first
        DimSpec("dim_all", d_all, am, "o_custkey", "c_custkey"),
        DimSpec("dim_tenth", d_tenth, tm, "o_custkey", "t_custkey"),
    ]
    with_stats, plan = plan_star_join(fact, fm, dims)
    without, noplan = plan_star_join(fact, fm, dims, use_stats=False)
    assert noplan.order == ["dim_all", "dim_tenth"]  # declared
    assert plan.order == ["dim_tenth", "dim_all"]  # reordered
    sel = {d.name: d.retention for d in plan.decisions}
    assert sel["dim_tenth"] < 0.2 and sel["dim_all"] > 0.9
    # same rows either way — ordering is a cost decision, not semantics
    a = sorted(r.o_orderkey for r in with_stats.collect())
    b = sorted(r.o_orderkey for r in without.collect())
    assert a == b and len(a) > 0


def test_stats_drive_broadcast_spark_would_miss(
    spark, sf_small, tmp_path
):
    fact, fm, d_all, am, d_tenth, tm = _published_star(
        spark, sf_small, tmp_path
    )
    dims = [DimSpec("dim_all", d_all, am, "o_custkey", "c_custkey")]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # 100 TB regime: file sizes exceed every threshold, Spark's own
    # size-based broadcast never fires — only the stats-driven hint can
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with_stats, plan = plan_star_join(fact, fm, dims)
        without, _ = plan_star_join(fact, fm, dims, use_stats=False)
        p_stats = explain_formatted(with_stats)
        p_none = explain_formatted(without)
        assert "BroadcastHashJoin" in p_stats, p_stats
        assert plan.decisions[0].broadcast
        assert "BroadcastHashJoin" not in p_none, p_none
        assert "SortMergeJoin" in p_none
        assert with_stats.count() == without.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_oversized_dim_not_broadcast(spark, sf_small, tmp_path):
    fact, fm, d_all, am, d_tenth, tm = _published_star(
        spark, sf_small, tmp_path
    )
    dims = [DimSpec("dim_all", d_all, am, "o_custkey", "c_custkey")]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # stats say the dim exceeds the (tiny) budget: no hint issued
        joined, plan = plan_star_join(
            fact, fm, dims, broadcast_threshold=16
        )
        assert not plan.decisions[0].broadcast
        assert "BroadcastHashJoin" not in explain_formatted(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
