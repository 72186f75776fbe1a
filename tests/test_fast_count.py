"""fast_count: count(*) from manifests alone (no data I/O) must equal
the real resolved count across every commit kind — flat snapshots,
append chains, schema evolution, equality/positional vector stacks,
COW rewrites, and materializations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    delete_rows_cow,
    delete_rows_mor,
    delete_rows_pos,
    fast_count,
    materialize_mor,
    publish_append,
    publish_versioned,
    read_version,
    read_version_chain,
)
from novelti_dingo_spark.sources import load_table


def _check(spark, base):
    df, _ = read_version_chain(spark, base)
    assert fast_count(spark, base) == df.count()


def test_fast_count_across_commit_kinds(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    publish_versioned(o.filter("o_orderkey % 2 = 0"), base)
    _check(spark, base)
    publish_append(o.filter("o_orderkey % 2 = 1"), base)
    _check(spark, base)  # chain: sum of segment deltas
    publish_append(
        o.limit(0).withColumn("flag", F.lit(1)), base, evolve="additive"
    )
    _check(spark, base)  # evolution segment contributes its 0
    from novelti_dingo_spark.pipelines import compact_chain

    compact_chain(spark, base)
    _check(spark, base)
    keys = [r.o_orderkey for r in o.limit(4).collect()]
    delete_rows_mor(spark, base, "o_orderkey", keys)
    _check(spark, base)  # vector head answers with resolved total
    delete_rows_pos(spark, base, "o_totalprice > 250000")
    _check(spark, base)  # stacked positional layer
    materialize_mor(spark, base)
    _check(spark, base)
    doomed = [
        r.o_orderkey
        for r in o.orderBy(F.desc("o_orderkey")).limit(2).collect()
    ]
    delete_rows_cow(spark, base, "o_orderkey", doomed)
    _check(spark, base)
    # pinned older version still answers from its own manifest line
    df_v1, _ = read_version(spark, base, 1)
    assert fast_count(spark, base, version=1) == df_v1.count()
