"""Bucketed co-located publish on the lake path
(pipelines.publish_bucketed / read_bucketed): recurring joins over
published data run with ZERO `Exchange hashpartitioning` — the publish
pays the shuffle once, every downstream join on the bucket key reads
co-located sorted buckets. The bucket spec is durable lake metadata:
read_bucketed re-declares the table when the session catalog has no
entry (fresh JVM), restoring bucket-aware planning from the manifest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import publish_bucketed, read_bucketed
from novelti_dingo_spark.plans import explain_formatted
from novelti_dingo_spark.sources.io import load_table


def _publish_marts(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    ob = str(tmp_path / "orders")
    lb = str(tmp_path / "lineitem")
    publish_bucketed(o, ob, "t_mart_orders", "o_orderkey", 8)
    publish_bucketed(li, lb, "t_mart_lineitem", "l_orderkey", 8)
    return o, li, ob, lb


def test_bucketed_publish_join_has_no_shuffle(spark, sf_small, tmp_path):
    o, li, ob, lb = _publish_marts(spark, sf_small, tmp_path)
    od, mo = read_bucketed(spark, ob)
    ld, ml = read_bucketed(spark, lb)
    assert mo["bucket"] == {
        "key": "o_orderkey", "n_buckets": 8, "sort_cols": ["o_orderkey"],
    }
    assert mo["rows"] == o.count()
    # merge hint: tiny test tables would otherwise broadcast; at real
    # scale both sides exceed the threshold and SMJ is what Spark picks
    j = ld.hint("merge").join(
        od.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = explain_formatted(j)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert j.count() == li.count()


def test_bucketed_layout_survives_catalog_loss(spark, sf_small, tmp_path):
    o, li, ob, lb = _publish_marts(spark, sf_small, tmp_path)
    _, mo = read_bucketed(spark, ob)
    _, ml = read_bucketed(spark, lb)
    # simulate a fresh JVM: drop the catalog entries (external tables —
    # data stays), then re-read purely from lake manifests
    spark.sql(f"DROP TABLE {mo['table']}")
    spark.sql(f"DROP TABLE {ml['table']}")
    od, _ = read_bucketed(spark, ob)
    ld, _ = read_bucketed(spark, lb)
    j = ld.hint("merge").join(
        od.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = explain_formatted(j)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert j.count() == li.count()
    spark.sql(f"DROP TABLE {mo['table']}")
    spark.sql(f"DROP TABLE {ml['table']}")


def test_bucketed_agg_on_key_has_no_shuffle(spark, sf_small, tmp_path):
    """groupBy on the bucket key also skips the Exchange — bucketing
    pre-partitions for aggregation, not just joins."""
    o, li, ob, lb = _publish_marts(spark, sf_small, tmp_path)
    ld, _ = read_bucketed(spark, lb)
    agg = ld.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    plan = explain_formatted(agg)
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == li.select("l_orderkey").distinct().count()


def test_bucketed_versions_are_independent(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "orders")
    v1 = publish_bucketed(o, base, "t_ver_orders", "o_orderkey", 4)
    v2 = publish_bucketed(
        o.filter(F.col("o_orderkey") % 2 == 0), base,
        "t_ver_orders", "o_orderkey", 4,
    )
    latest, m2 = read_bucketed(spark, base)
    pinned, m1 = read_bucketed(spark, base, version=v1)
    assert m1["version"] == v1 and m2["version"] == v2
    assert pinned.count() == o.count()
    assert latest.count() == o.filter(F.col("o_orderkey") % 2 == 0).count()
