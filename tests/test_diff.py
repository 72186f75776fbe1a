"""Snapshot diff / reconciliation over the versioned lake
(pipelines.diff_snapshots / diff_versions): insert/delete/update
classification, no-op suppression, schema-evolution behavior (diff on
the column intersection), and null-transition sensitivity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    diff_snapshots,
    diff_versions,
    publish_versioned,
)
from novelti_dingo_spark.sources.io import load_table


def test_diff_versions_on_lake(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders")
    base = str(tmp_path / "lake")
    v1 = publish_versioned(o.filter(F.col("o_orderkey") % 7 != 0), base)
    v2 = publish_versioned(
        o.filter(F.col("o_orderkey") % 11 != 0).withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        ),
        base,
    )
    diff = diff_versions(spark, base, v1, v2, ["o_orderkey"]).collect()
    got = {(r.o_orderkey, r.op) for r in diff}
    keys = [r.o_orderkey for r in o.select("o_orderkey").collect()]
    want = set()
    for k in keys:
        if k % 7 == 0 and k % 11 != 0:
            want.add((k, "insert"))
        elif k % 7 != 0 and k % 11 == 0:
            want.add((k, "delete"))
        elif k % 5 == 0 and k % 7 != 0 and k % 11 != 0:
            want.add((k, "update"))
    assert got == want and len(want) > 0


def test_identical_snapshots_diff_empty(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    assert diff_snapshots(o, o, ["o_orderkey"]).count() == 0


def test_schema_evolution_diffs_on_intersection(spark, sf_small):
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    evolved = o.withColumn("margin", F.col("o_totalprice") * 0.1)
    # added column alone must NOT mark rows as updated
    assert diff_snapshots(o, evolved, ["o_orderkey"]).count() == 0
    # but a change in a shared column still surfaces
    changed = evolved.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == 1, F.col("o_totalprice") + 5
        ).otherwise(F.col("o_totalprice")),
    )
    diff = diff_snapshots(o, changed, ["o_orderkey"]).collect()
    assert {(r.o_orderkey, r.op) for r in diff} == {(1, "update")}


def test_null_transitions_are_updates(spark):
    a = spark.createDataFrame([(1, "x"), (2, None)], "k int, v string")
    b = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    diff = diff_snapshots(a, b, ["k"]).collect()
    assert {(r.k, r.op) for r in diff} == {(1, "update")}
