"""Partition-spec evolution on the append chain: a later segment may be
hive-partitioned while earlier segments are flat (Iceberg rule — a spec
change applies to new data only). Pins: mixed-layout chain reads are
lossless, directory pruning + footer-stat pruning compose in one ranged
read with honest file accounting, PartitionFilters appear in the
partitioned branch, point lookups prune to one directory, evolution
composes with additive schema evolution, and compaction flattens the
layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    build_file_index,
    compact_chain,
    publish_append,
    publish_versioned,
    read_chain_pruned,
    read_point_lookup_chain,
    read_version_chain,
)
from novelti_dingo_spark.plans import explain_formatted
from novelti_dingo_spark.sources import load_table


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").alias("o_year"),
    )


@pytest.fixture()
def chain(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "orders_pevolved")
    o = _orders(spark, sf_small)
    publish_versioned(o.filter(F.col("o_year") < 1996), base,
                      stats_cols=["o_year"])
    publish_append(o.filter(F.col("o_year") >= 1996), base,
                   partition_by=["o_year"])
    return base, o


def test_mixed_layout_chain_read_lossless(spark, chain):
    base, o = chain
    df, manifests = read_version_chain(spark, base)
    assert len(manifests) == 2
    assert manifests[0]["partition_by"] == ["o_year"]
    got = sorted(tuple(r) for r in df.select(*o.columns).collect())
    want = sorted(tuple(r) for r in o.collect())
    assert got == want
    assert dict(df.dtypes)["o_year"] == "int"


def test_ranged_read_prunes_both_layouts(spark, chain):
    base, o = chain
    # range strictly inside the partitioned segment: every flat file
    # whose footer says max o_year < lo is pruned, and only matching
    # o_year=V dirs of the partitioned segment are listed
    years = sorted(
        r.o_year for r in o.select("o_year").distinct().collect()
    )
    hi = years[-1]
    df, total, n_read = read_chain_pruned(spark, base, "o_year", hi, hi)
    assert n_read < total, (n_read, total)
    got = sorted(tuple(r) for r in df.select(*o.columns).collect())
    want = sorted(
        tuple(r) for r in o.filter(F.col("o_year") == hi).collect()
    )
    assert got == want


def test_ranged_read_spanning_boundary_exact(spark, chain):
    base, o = chain
    df, total, n_read = read_chain_pruned(spark, base, "o_year", 1994, 1996)
    assert 0 < n_read <= total
    got = sorted(tuple(r) for r in df.select(*o.columns).collect())
    want = sorted(
        tuple(r)
        for r in o.filter(F.col("o_year").between(1994, 1996)).collect()
    )
    assert got == want


def test_partition_filters_in_partitioned_branch(spark, chain):
    base, _ = chain
    df, _ = read_version_chain(spark, base)
    plan = explain_formatted(df.filter(F.col("o_year") == 1997))
    assert "PartitionFilters" in plan
    assert "o_year" in plan.split("PartitionFilters", 1)[1][:200]


def test_point_lookup_prunes_to_one_directory(spark, chain):
    base, o = chain
    years = sorted(
        r.o_year for r in o.select("o_year").distinct().collect()
    )
    hi = years[-1]
    df, total, n_read = read_point_lookup_chain(spark, base, "o_year", hi)
    assert n_read < total
    assert df.count() == o.filter(F.col("o_year") == hi).count()


def test_composes_with_additive_schema_evolution(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "orders_pe_se")
    o = _orders(spark, sf_small)
    publish_versioned(o.filter(F.col("o_year") < 1996), base)
    publish_append(
        o.filter(F.col("o_year") >= 1996).withColumn(
            "o_band",
            F.when(F.col("o_totalprice") >= 150000, "high").otherwise("low"),
        ),
        base,
        evolve="additive",
        partition_by=["o_year"],
    )
    df, _ = read_version_chain(spark, base)
    # pre-evolution flat rows NULL-backfill the new column; partitioned
    # rows carry it
    n_old = o.filter(F.col("o_year") < 1996).count()
    assert df.filter(F.col("o_band").isNull()).count() == n_old
    assert df.count() == o.count()


def test_file_index_rejected_on_partitioned_segment(spark, chain):
    base, _ = chain
    with pytest.raises(ValueError, match="hive-partitioned"):
        build_file_index(spark, base, "o_custkey")


def test_stats_cols_rejected_with_partition_by(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "orders_pe_bad")
    o = _orders(spark, sf_small)
    publish_versioned(o.filter(F.col("o_year") < 1996), base)
    with pytest.raises(ValueError, match="mutually exclusive"):
        publish_append(
            o.filter(F.col("o_year") >= 1996),
            base,
            partition_by=["o_year"],
            stats_cols=["o_year"],
        )


def test_null_partition_values_read_conservatively(spark, tmp_path):
    """A NULL partition value lands in __HIVE_DEFAULT_PARTITION__; a
    ranged read must INCLUDE that directory (its rows' o_year is null —
    the row filter drops them — but pruning may only skip what provably
    cannot match, and a null sentinel proves nothing)."""
    base = os.path.join(str(tmp_path), "nullpart")
    df = spark.createDataFrame(
        [(1, 1995, 10.0), (2, None, 20.0), (3, 1997, 30.0)],
        "k long, o_year int, v double",
    )
    publish_versioned(df, base)
    publish_append(
        spark.createDataFrame(
            [(4, 1996, 40.0), (5, None, 50.0)],
            "k long, o_year int, v double",
        ),
        base,
        partition_by=["o_year"],
    )
    got, total, n_read = read_chain_pruned(spark, base, "o_year", 1996, 1997)
    assert n_read <= total
    rows = sorted((r.k, r.o_year) for r in got.collect())
    assert rows == [(3, 1997), (4, 1996)]
    full, _ = read_version_chain(spark, base)
    assert full.count() == 5  # nothing lost, nulls included in full read


def test_multi_column_partition_by_rejected_on_append(
    spark, sf_small, tmp_path
):
    base = os.path.join(str(tmp_path), "orders_pe_multi")
    o = _orders(spark, sf_small).withColumn("half", F.col("o_orderkey") % 2)
    publish_versioned(o.limit(10), base)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="single partition column"):
        publish_append(o.limit(5), base, partition_by=["o_year", "half"])


def test_numeric_looking_string_partition_point_lookup(spark, tmp_path):
    """A string partition value like '007' decodes numerically from its
    directory name; equality pruning must still find it for the string
    probe '007' (conservative dual compare, never silent row loss)."""
    base = os.path.join(str(tmp_path), "codes")
    df = spark.createDataFrame(
        [(1, "007", 1.0), (2, "007", 2.0), (3, "abc", 3.0)],
        "k long, code string, v double",
    )
    publish_versioned(df.limit(0), base)  # empty flat base
    publish_append(df, base, partition_by=["code"])
    got, total, n_read = read_point_lookup_chain(spark, base, "code", "007")
    assert sorted(r.k for r in got.collect()) == [1, 2]
    assert 0 < n_read < total + 1


def test_compaction_flattens_partition_evolved_chain(spark, chain):
    base, o = chain
    v = compact_chain(spark, base, stats_cols=["o_year"])
    df, manifests = read_version_chain(spark, base)
    assert len(manifests) == 1 and manifests[0]["version"] == v
    assert "partition_by" not in manifests[0]
    got = sorted(tuple(r) for r in df.select(*o.columns).collect())
    want = sorted(tuple(r) for r in o.collect())
    assert got == want
