"""Data-skipping (min/max file pruning) on the versioned lake:
publish_versioned(stats_cols=...) records per-file footer statistics in
the manifest; read_version_pruned skips files whose range cannot
intersect the query window. Verified properties:

- pruning actually skips files on a range-clustered layout;
- the pruned result equals the full-scan filter EXACTLY (pruning is an
  optimization, never a semantics change);
- a window covering everything reads every file;
- an empty window reads zero files and returns zero rows;
- files without stats are conservatively kept.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    publish_versioned,
    read_version_pruned,
)
from novelti_dingo_spark.sources.io import load_table


def _publish_orders(spark, sf_med, tmp_path, n_files=8):
    orders = load_table(spark, sf_med, "orders").repartitionByRange(
        n_files, "o_orderdate"
    )
    base = str(tmp_path / "lake")
    v = publish_versioned(
        orders, base, stats_cols=["o_orderdate", "o_orderkey"]
    )
    return orders, base, v


def test_pruned_read_skips_files_and_matches_full_scan(
    spark, sf_med, tmp_path
):
    orders, base, v = _publish_orders(spark, sf_med, tmp_path)
    lo, hi = "1995-02-01 00:00:00", "1995-06-30 23:59:59"
    df, total, read = read_version_pruned(spark, base, "o_orderdate", lo, hi)
    assert total == 8
    # the 6-month window spans a small slice of ~7 years: range
    # clustering must confine it to a strict subset of files
    assert 0 < read < total
    expected = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi)
    )
    got = {tuple(r) for r in df.select("o_orderkey", "o_totalprice").collect()}
    want = {
        tuple(r)
        for r in expected.select("o_orderkey", "o_totalprice").collect()
    }
    assert got == want and len(want) > 0


def test_full_window_reads_all_files(spark, sf_med, tmp_path):
    orders, base, v = _publish_orders(spark, sf_med, tmp_path)
    df, total, read = read_version_pruned(
        spark, base, "o_orderdate", "1900-01-01 00:00:00", "2100-01-01 00:00:00"
    )
    assert read == total
    assert df.count() == orders.count()


def test_empty_window_reads_zero_files(spark, sf_med, tmp_path):
    orders, base, v = _publish_orders(spark, sf_med, tmp_path)
    df, total, read = read_version_pruned(
        spark, base, "o_orderdate", "2090-01-01 00:00:00", "2091-01-01 00:00:00"
    )
    assert read == 0
    assert df.count() == 0


def test_numeric_column_pruning(spark, sf_med, tmp_path):
    orders = load_table(spark, sf_med, "orders").repartitionByRange(
        6, "o_orderkey"
    )
    base = str(tmp_path / "lake_num")
    publish_versioned(orders, base, stats_cols=["o_orderkey"])
    df, total, read = read_version_pruned(
        spark, base, "o_orderkey", 0, 100
    )
    assert read < total
    n_expected = orders.filter(
        (F.col("o_orderkey") >= 0) & (F.col("o_orderkey") <= 100)
    ).count()
    assert df.count() == n_expected


def test_manifest_records_footer_stats(spark, sf_med, tmp_path):
    orders, base, v = _publish_orders(spark, sf_med, tmp_path)
    m = json.loads(
        (tmp_path / "lake" / f"v={v}" / "_manifest.json").read_text()
    )
    fs = m["file_stats"]
    assert fs["columns"] == ["o_orderdate", "o_orderkey"]
    assert len(fs["files"]) == 8
    for f in fs["files"]:
        assert f["min"]["o_orderdate"] <= f["max"]["o_orderdate"]
        assert isinstance(f["min"]["o_orderkey"], int)
        assert f["rows"] > 0
    # range clustering => file date ranges are disjoint up to duplicate
    # boundary keys: sorted by min, each file starts at or after the
    # previous file's max
    ordered = sorted(fs["files"], key=lambda f: f["min"]["o_orderdate"])
    for prev, cur in zip(ordered, ordered[1:]):
        assert prev["max"]["o_orderdate"] <= cur["min"]["o_orderdate"]


def test_missing_stats_files_are_kept(spark, sf_med, tmp_path):
    orders, base, v = _publish_orders(spark, sf_med, tmp_path)
    from novelti_dingo_spark.sources import lakefs

    mpath = f"{base}/v={v}/_manifest.json"
    m = json.loads(lakefs.read_text(spark, mpath))
    # simulate a writer that produced no stats for one file
    m["file_stats"]["files"][0]["min"]["o_orderdate"] = None
    lakefs.replace_text(spark, mpath, json.dumps(m))
    df, total, read = read_version_pruned(
        spark, base, "o_orderdate", "2090-01-01 00:00:00", "2091-01-01 00:00:00"
    )
    # the stats-less file must be read even though the window is empty
    assert read == 1
    assert df.count() == 0


def test_zorder_layout_prunes_on_both_columns(spark, sf_med, tmp_path):
    """Z-order clustering + footer stats => data skipping works for
    windows on EITHER clustered column (the multi-column generalization
    of range clustering; layout.py measures span narrowing, this proves
    the file-skipping payoff end to end)."""
    from novelti_dingo_spark.layout import morton_key

    orders = load_table(spark, sf_med, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    z = (
        orders.withColumn("zkey", morton_key(orders, ["o_orderkey", "o_custkey"]))
        .repartitionByRange(16, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )
    base = str(tmp_path / "lake_z")
    publish_versioned(z, base, stats_cols=["o_orderkey", "o_custkey"])

    df, total, read = read_version_pruned(
        spark, base, "o_orderkey", 0, 400
    )
    assert total == 16 and 0 < read < total
    want = orders.filter(
        (F.col("o_orderkey") >= 0) & (F.col("o_orderkey") <= 400)
    ).count()
    assert df.count() == want and want > 0

    df2, total2, read2 = read_version_pruned(
        spark, base, "o_custkey", 0, 40
    )
    assert 0 < read2 < total2
    want2 = orders.filter(
        (F.col("o_custkey") >= 0) & (F.col("o_custkey") <= 40)
    ).count()
    assert df2.count() == want2 and want2 > 0


def test_ndv_column_stats_ride_the_publish(spark, sf_med, tmp_path):
    """ndv_cols adds approx-NDV + null counts to the manifest via the
    SAME Observation as the row count — no second scan; values must be
    sane (NDV within approx error of truth, nulls exact)."""
    from novelti_dingo_spark.pipelines import read_version

    orders = load_table(spark, sf_med, "orders")
    base = str(tmp_path / "lake_ndv")
    publish_versioned(
        orders, base, ndv_cols=["o_custkey", "o_orderpriority"]
    )
    _, m = read_version(spark, base)
    cs = m["column_stats"]
    truth_cust = orders.select("o_custkey").distinct().count()
    truth_prio = orders.select("o_orderpriority").distinct().count()
    assert abs(cs["o_custkey"]["ndv"] - truth_cust) / truth_cust < 0.1
    assert abs(cs["o_orderpriority"]["ndv"] - truth_prio) <= 1
    assert cs["o_custkey"]["nulls"] == 0
