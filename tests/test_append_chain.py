"""Append-chain versioning for the lake (pipelines.publish_append /
read_version_chain / read_chain_pruned) and its streaming producer
(streaming.cdc.stream_append_publish):

- append = O(batch): a new version dir holds only the batch's files,
  manifest links to the parent;
- chain read = full snapshot (parents + head), truncated by a full
  publish (compaction);
- data skipping prunes across EVERY segment's file_stats;
- vacuum never orphans a chain (ancestors of keepers survive);
- streaming: one version per micro-batch, exactly-once under replay.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    publish_append,
    publish_versioned,
    read_chain_pruned,
    read_version_chain,
    vacuum_versions,
)
from novelti_dingo_spark.sources.io import load_table


def _orders_slices(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0)
    b = o.filter(F.col("o_orderkey") % 3 == 1)
    c = o.filter(F.col("o_orderkey") % 3 == 2)
    return o, a, b, c


def test_append_chain_reads_union(spark, sf_small, tmp_path):
    o, a, b, c = _orders_slices(spark, sf_small)
    base = str(tmp_path / "lake")
    v1 = publish_append(a, base)
    v2 = publish_append(b, base)
    df, chain = read_version_chain(spark, base)
    assert [m["version"] for m in chain] == [v2, v1]
    assert df.count() == a.count() + b.count()
    # pinned read of the first segment alone
    df1, chain1 = read_version_chain(spark, base, v1)
    assert df1.count() == a.count() and len(chain1) == 1


def test_full_publish_truncates_chain(spark, sf_small, tmp_path):
    o, a, b, c = _orders_slices(spark, sf_small)
    base = str(tmp_path / "lake")
    publish_append(a, base)
    publish_append(b, base)
    v3 = publish_versioned(o, base)  # compaction: full snapshot
    df, chain = read_version_chain(spark, base)
    assert [m["version"] for m in chain] == [v3]
    assert df.count() == o.count()
    v4 = publish_append(c, base)
    df2, chain2 = read_version_chain(spark, base)
    assert [m["version"] for m in chain2] == [v4, v3]
    assert df2.count() == o.count() + c.count()


def test_chain_pruning_across_segments(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders")
    early = o.filter(F.year("o_orderdate") <= 1996).repartitionByRange(
        4, "o_orderdate"
    )
    late = o.filter(F.year("o_orderdate") >= 1997).repartitionByRange(
        4, "o_orderdate"
    )
    base = str(tmp_path / "lake")
    publish_append(early, base, stats_cols=["o_orderdate"])
    publish_append(late, base, stats_cols=["o_orderdate"])
    lo, hi = "1996-01-01 00:00:00", "1997-12-31 23:59:59"
    df, total, read = read_chain_pruned(spark, base, "o_orderdate", lo, hi)
    assert total == 8
    # the window straddles both segments but only their adjacent files
    assert 0 < read < total
    want = o.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi)
    ).count()
    assert df.count() == want and want > 0


def test_vacuum_keeps_chain_ancestors(spark, sf_small, tmp_path):
    o, a, b, c = _orders_slices(spark, sf_small)
    base = str(tmp_path / "lake")
    v1 = publish_append(a, base)
    v2 = publish_append(b, base)
    v3 = publish_append(c, base)
    # keep_last=1 keeps only v3 — but v3's chain needs v1 and v2
    deleted = vacuum_versions(spark, base, keep_last=1)
    assert deleted == []
    df, chain = read_version_chain(spark, base)
    assert df.count() == a.count() + b.count() + c.count()


def test_stream_append_publish_exactly_once(spark, sf_small, tmp_path):
    import shutil

    from novelti_dingo_spark import schemas
    from novelti_dingo_spark.streaming.cdc import stream_append_publish

    src = tmp_path / "src"
    src.mkdir()
    o = load_table(spark, sf_small, "orders").limit(300)
    staged = str(tmp_path / "staged")
    o.coalesce(1).write.parquet(staged)
    import glob

    part = glob.glob(staged + "/part-*.parquet")[0]
    shutil.copy(part, src / "batch1.parquet")

    base = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    stream_append_publish(
        spark, str(src), base, ckpt, schemas.ORDERS,
        stats_cols=["o_orderkey"],
    )
    df, chain = read_version_chain(spark, base)
    n1 = df.count()
    assert n1 == 300 and len(chain) == 1
    assert chain[0]["file_stats"]["columns"] == ["o_orderkey"]

    # re-run with NO new input: checkpoint replays nothing, no new version
    stream_append_publish(
        spark, str(src), base, ckpt, schemas.ORDERS,
        stats_cols=["o_orderkey"],
    )
    df, chain = read_version_chain(spark, base)
    assert df.count() == n1 and len(chain) == 1

    # second file arrives: exactly one more segment
    shutil.copy(part, src / "batch2.parquet")
    stream_append_publish(
        spark, str(src), base, ckpt, schemas.ORDERS,
        stats_cols=["o_orderkey"],
    )
    df, chain = read_version_chain(spark, base)
    assert df.count() == 2 * n1 and len(chain) == 2
