"""Secondary file index for point lookups (pipelines.build_file_index /
read_point_lookup): lookups on a NON-clustered column touch only the
files that contain the value; absent values read zero files; results
equal the full-scan filter exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    build_file_index,
    publish_versioned,
    read_point_lookup,
)
from novelti_dingo_spark.sources.io import load_table


def _published(spark, sf_med, tmp_path):
    # clustered by DATE — o_orderkey point lookups get no layout help
    orders = load_table(spark, sf_med, "orders").repartitionByRange(
        8, "o_orderdate"
    )
    base = str(tmp_path / "lake")
    publish_versioned(orders, base, stats_cols=["o_orderdate"])
    return orders, base


def test_point_lookup_touches_subset_and_matches(spark, sf_med, tmp_path):
    orders, base = _published(spark, sf_med, tmp_path)
    n_idx = build_file_index(spark, base, "o_orderkey")
    assert n_idx > 0
    key = orders.select("o_orderkey").head().o_orderkey
    df, total, read = read_point_lookup(spark, base, "o_orderkey", key)
    assert total == 8
    # a unique key lives in exactly the files that hold its row(s)
    assert 1 <= read < total
    got = sorted(
        tuple(r) for r in df.select("o_orderkey", "o_totalprice").collect()
    )
    want = sorted(
        tuple(r)
        for r in orders.filter(F.col("o_orderkey") == key)
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    assert got == want and len(want) >= 1


def test_absent_value_reads_zero_files(spark, sf_med, tmp_path):
    orders, base = _published(spark, sf_med, tmp_path)
    build_file_index(spark, base, "o_orderkey")
    df, total, read = read_point_lookup(
        spark, base, "o_orderkey", -12345
    )
    assert read == 0 and df.count() == 0


def test_unindexed_column_raises(spark, sf_med, tmp_path):
    import pytest

    orders, base = _published(spark, sf_med, tmp_path)
    with pytest.raises(ValueError):
        read_point_lookup(spark, base, "o_custkey", 1)


def test_index_invisible_to_normal_reads(spark, sf_med, tmp_path):
    from novelti_dingo_spark.pipelines import read_version

    orders, base = _published(spark, sf_med, tmp_path)
    n_before = read_version(spark, base)[0].count()
    build_file_index(spark, base, "o_orderkey")
    df, manifest = read_version(spark, base)
    assert df.count() == n_before  # _index_* dir ignored by the scan
    assert manifest["indexes"] == ["o_orderkey"]
