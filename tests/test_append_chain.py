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


def test_chain_point_lookup_with_per_segment_indexes(
    spark, sf_small, tmp_path
):
    from novelti_dingo_spark.pipelines import (
        build_file_index,
        read_point_lookup_chain,
    )

    o, a, b, c = _orders_slices(spark, sf_small)
    base = str(tmp_path / "lake")
    v1 = publish_append(a.repartition(3), base)
    build_file_index(spark, base, "o_orderkey", version=v1)
    v2 = publish_append(b.repartition(3), base)
    build_file_index(spark, base, "o_orderkey", version=v2)

    key = a.select("o_orderkey").head().o_orderkey
    df, total, read = read_point_lookup_chain(
        spark, base, "o_orderkey", key
    )
    assert total == 6
    assert 1 <= read < total  # only the files holding the key
    assert df.count() == 1

    # a segment WITHOUT an index is read in full (conservative fallback)
    v3 = publish_append(c.repartition(2), base)
    df2, total2, read2 = read_point_lookup_chain(
        spark, base, "o_orderkey", key
    )
    assert total2 == 8 and read2 >= 2 + 1  # v3's 2 files + indexed hits
    assert df2.count() == 1


def test_compact_chain_restores_one_snapshot_with_index(
    spark, sf_small, tmp_path
):
    from novelti_dingo_spark.pipelines import (
        compact_chain,
        read_point_lookup,
        read_version_pruned,
    )

    o, a, b, c = _orders_slices(spark, sf_small)
    base = str(tmp_path / "lake")
    publish_append(a, base)
    publish_append(b, base)
    publish_append(c, base)
    v = compact_chain(
        spark,
        base,
        stats_cols=["o_orderdate"],
        index_cols=["o_orderkey"],
        cluster_by="o_orderdate",
        n_files=6,
    )
    df, chain = read_version_chain(spark, base)
    assert [m["version"] for m in chain] == [v]
    assert df.count() == o.count()
    assert chain[0]["compacted_from"] == [3, 2, 1]
    # compaction restored range clustering => skipping works again
    dfp, total, read = read_version_pruned(
        spark, base, "o_orderdate",
        "1995-01-01 00:00:00", "1995-12-31 23:59:59",
    )
    assert total == 6 and 0 < read < total
    # and the consolidated index answers point lookups
    key = o.select("o_orderkey").head().o_orderkey
    dfi, t2, r2 = read_point_lookup(spark, base, "o_orderkey", key)
    assert r2 >= 1 and dfi.count() == 1


def test_footer_stats_record_null_counts(spark, sf_small, tmp_path):
    import json

    from novelti_dingo_spark.sources import lakefs

    o = load_table(spark, sf_small, "orders").limit(500)
    base = str(tmp_path / "lake_nulls")
    v = publish_versioned(o, base, stats_cols=["o_orderkey"])
    m = json.loads(
        lakefs.read_text(spark, f"{base}/v={v}/_manifest.json")
    )
    for f in m["file_stats"]["files"]:
        assert f["nulls"]["o_orderkey"] == 0


def test_maybe_compact_policy(spark, sf_small, tmp_path):
    """Auto-OPTIMIZE: no-op while the chain is short and files are
    healthy (given generous thresholds), compacts when the segment
    budget is exceeded, and the decision itself costs no data I/O."""
    from novelti_dingo_spark.pipelines import maybe_compact

    o, a, b, c = _orders_slices(spark, sf_small)
    base = str(tmp_path / "lake")
    publish_append(a, base)
    publish_append(b, base)
    # healthy: 2 segments <= budget, tiny-file rule disabled
    assert (
        maybe_compact(spark, base, max_segments=4, min_avg_file_mb=0.0)
        is None
    )
    df, chain = read_version_chain(spark, base)
    assert len(chain) == 2
    # over the segment budget -> compaction runs and truncates the chain
    publish_append(c, base)
    v = maybe_compact(spark, base, max_segments=2, min_avg_file_mb=0.0)
    assert v is not None
    df, chain = read_version_chain(spark, base)
    assert len(chain) == 1 and chain[0]["version"] == v
    assert df.count() == o.count()
    # small-files rule alone also triggers (threshold above any real file)
    publish_append(a.limit(1), base)
    v2 = maybe_compact(
        spark, base, max_segments=100, min_avg_file_mb=10_000.0
    )
    assert v2 == v + 2


def test_vacuum_time_based_retention(spark, sf_small, tmp_path):
    """keep_since composes with keep_last as a union: versions published
    at or after the cutoff survive even outside the keep_last window;
    older non-ancestral versions are reclaimed."""
    from novelti_dingo_spark.pipelines import (
        publish_versioned,
        vacuum_versions,
    )
    from novelti_dingo_spark.sources.io import load_table as _lt

    base = str(tmp_path / "lake")
    o = _lt(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    publish_versioned(o.limit(5), base, published_ts="2025-01-01T00:00:00.000000Z")
    publish_versioned(o.limit(6), base, published_ts="2025-06-01T00:00:00.000000Z")
    publish_versioned(o.limit(7), base, published_ts="2025-07-01T00:00:00.000000Z")
    # keep_last=1 alone would reclaim v1 AND v2; the cutoff saves v2
    removed = vacuum_versions(
        spark, base, keep_last=1, keep_since="2025-03-01T00:00:00.000000Z"
    )
    assert removed == [1]
    from novelti_dingo_spark.pipelines import read_version

    assert read_version(spark, base, 2)[0].count() == 6  # still readable
    assert read_version(spark, base)[0].count() == 7
