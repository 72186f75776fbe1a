"""Copy-on-write surgical delete (pipelines.delete_rows_cow): only
files that can contain the doomed keys are rewritten, the rest are
byte-copied; prior versions keep the rows (time travel = retention
ledger); chains and partitioned snapshots are rejected with guidance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    build_file_index,
    delete_rows_cow,
    publish_append,
    publish_versioned,
    read_version,
)
from novelti_dingo_spark.sources import lakefs, load_table


def _publish_orders(spark, sf_small, base, n_files=4, **kw):
    o = load_table(spark, sf_small, "orders").repartitionByRange(
        n_files, "o_orderkey"
    )
    publish_versioned(o, base, **kw)
    return load_table(spark, sf_small, "orders")


def test_indexed_delete_rewrites_only_matching_files(
    spark, sf_small, tmp_path
):
    base = str(tmp_path / "lake")
    o = _publish_orders(spark, sf_small, base)
    build_file_index(spark, base, "o_orderkey")
    keys = [r.o_orderkey for r in o.limit(3).collect()]
    v, n_rw, n_cp = delete_rows_cow(spark, base, "o_orderkey", keys)
    assert v == 2
    # range-clustered on the key: 3 nearby keys live in few files
    assert 1 <= n_rw < n_rw + n_cp == 4
    df, manifest = read_version(spark, base)
    assert df.filter(F.col("o_orderkey").isin(keys)).count() == 0
    assert df.count() == o.count() - len(keys)
    assert manifest["deleted"]["files_rewritten"] == n_rw
    assert manifest["rows"] == o.count() - len(keys)
    # the untouched files were byte-copied with identical names
    v1_files = set(lakefs.listdir(spark, f"{base}/v=1"))
    v2_files = set(lakefs.listdir(spark, f"{base}/v=2"))
    copied_names = {
        n for n in v1_files if n.endswith(".parquet")
    } & v2_files
    assert len(copied_names) >= n_cp


def test_stats_fallback_prunes_rewrites(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    o = _publish_orders(
        spark, sf_small, base, stats_cols=["o_orderkey"]
    )
    lo = o.agg(F.min("o_orderkey")).head()[0]
    v, n_rw, n_cp = delete_rows_cow(spark, base, "o_orderkey", [lo])
    assert n_rw == 1 and n_cp == 3  # min key lives in exactly one range file
    df, manifest = read_version(spark, base)
    assert df.filter(F.col("o_orderkey") == lo).count() == 0
    # file_stats were REGENERATED for the new version (pruning survives)
    assert manifest["file_stats"]["columns"] == ["o_orderkey"]


def test_old_version_keeps_rows_until_vacuum(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    o = _publish_orders(spark, sf_small, base)
    key = o.limit(1).head().o_orderkey
    delete_rows_cow(spark, base, "o_orderkey", [key])
    old, _ = read_version(spark, base, version=1)
    assert old.filter(F.col("o_orderkey") == key).count() == 1


def test_cow_version_gets_fresh_published_ts(spark, sf_small, tmp_path):
    """The rewrite must NOT inherit the source version's published_ts:
    a timestamp BEFORE the delete has to time-travel to the pre-delete
    snapshot, never the post-delete one (ties break to higher versions,
    so an inherited timestamp would shadow v1 forever)."""
    from novelti_dingo_spark.pipelines import read_as_of

    base = str(tmp_path / "lake")
    o = _publish_orders(spark, sf_small, base)
    import json

    from novelti_dingo_spark.sources import lakefs

    m1 = json.loads(lakefs.read_text(spark, f"{base}/v=1/_manifest.json"))
    key = o.limit(1).head().o_orderkey
    delete_rows_cow(spark, base, "o_orderkey", [key])
    m2 = json.loads(lakefs.read_text(spark, f"{base}/v=2/_manifest.json"))
    assert m2["published_ts"] > m1["published_ts"]
    assert "compacted_from" not in m2 and "column_stats" not in m2
    # as-of the ORIGINAL publish time resolves the pre-delete snapshot
    df, m = read_as_of(spark, base, m1["published_ts"])
    assert m["version"] == 1
    assert df.filter(F.col("o_orderkey") == key).count() == 1


def test_chain_and_partitioned_rejected(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders")
    chain_base = str(tmp_path / "chain")
    publish_versioned(o.limit(10), chain_base)
    publish_append(o.limit(5), chain_base)
    with pytest.raises(ValueError, match="compact_chain"):
        delete_rows_cow(spark, chain_base, "o_orderkey", [1])
    part_base = str(tmp_path / "part")
    publish_versioned(
        o.withColumn("y", F.year("o_orderdate")),
        part_base,
        partition_by=["y"],
    )
    with pytest.raises(ValueError, match="flat snapshots"):
        delete_rows_cow(spark, part_base, "o_orderkey", [1])


def test_update_cow_anonymizes_in_place(spark, sf_small, tmp_path):
    from novelti_dingo_spark.pipelines import update_rows_cow

    base = str(tmp_path / "lake")
    o = _publish_orders(spark, sf_small, base)
    build_file_index(spark, base, "o_orderkey")
    keys = [r.o_orderkey for r in o.limit(3).collect()]
    v, n_rw, n_cp = update_rows_cow(
        spark,
        base,
        "o_orderkey",
        keys,
        {"o_custkey": F.lit(-1), "o_totalprice": F.lit(0.0)},
    )
    assert v == 2 and 1 <= n_rw < 4
    df, manifest = read_version(spark, base)
    assert df.count() == o.count()  # update never drops rows
    hit = df.filter(F.col("o_orderkey").isin(keys))
    assert hit.count() == len(keys)
    assert hit.filter(
        (F.col("o_custkey") != -1) | (F.col("o_totalprice") != 0.0)
    ).count() == 0
    # untouched rows identical
    rest = df.filter(~F.col("o_orderkey").isin(keys))
    want = o.filter(~F.col("o_orderkey").isin(keys))
    assert sorted(map(tuple, rest.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert manifest["updated"]["columns"] == ["o_custkey", "o_totalprice"]
    assert df.schema == o.schema  # types preserved through the rewrite


def test_unindexed_unstatted_version_rewrites_everything(
    spark, sf_small, tmp_path
):
    base = str(tmp_path / "lake")
    o = _publish_orders(spark, sf_small, base)
    key = o.limit(1).head().o_orderkey
    v, n_rw, n_cp = delete_rows_cow(spark, base, "o_orderkey", [key])
    assert n_rw == 4 and n_cp == 0  # conservative: no targeting metadata
    df, _ = read_version(spark, base)
    assert df.count() == o.count() - 1
