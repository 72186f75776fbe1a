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


def test_fast_minmax_exact_and_refusals(spark, sf_small, tmp_path):
    """fast_minmax equals the scan answer on chains with stats, refuses
    MOR heads (carried stats are bounds after deletion) and chains
    missing stats for the column."""
    import pytest
    from pyspark.sql import functions as F

    from novelti_dingo_spark.pipelines import (
        delete_rows_mor,
        fast_minmax,
        publish_append,
        publish_versioned,
        read_version_chain,
    )
    from novelti_dingo_spark.sources.io import load_table as _lt

    base = str(tmp_path / "lake")
    o = _lt(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    publish_versioned(
        o.filter("o_orderkey % 2 = 0"), base, stats_cols=["o_totalprice"]
    )
    publish_append(
        o.filter("o_orderkey % 2 = 1"), base, stats_cols=["o_totalprice"]
    )
    lo, hi = fast_minmax(spark, base, "o_totalprice")
    row = read_version_chain(spark, base)[0].agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).head()
    assert (lo, hi) == (row.lo, row.hi)
    with pytest.raises(ValueError, match="no file stats"):
        fast_minmax(spark, base, "o_orderkey")
    delete_rows_mor(spark, base, "o_orderkey", [2, 4])
    with pytest.raises(ValueError, match="merge-on-read"):
        fast_minmax(spark, base, "o_totalprice")
