"""Z-order chain compaction (compact_chain zorder_by): after appends
interleave ranges, one Z-order rewrite restores MULTI-column data
skipping — read_chain_pruned must prune files on BOTH clustered
columns, where linear clustering can only serve one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    compact_chain,
    publish_append,
    publish_versioned,
    read_chain_pruned,
    read_version_chain,
)
from novelti_dingo_spark.sources import load_table


def _events(spark, sf_med):
    # two independent filter dimensions: user_id and event_id
    return load_table(spark, sf_med, "events").select(
        "event_id", "user_id", "value"
    )


@pytest.fixture()
def zordered(spark, sf_med, tmp_path):
    base = str(tmp_path / "lake")
    ev = _events(spark, sf_med)
    # appends interleave both ranges (worst case for skipping)
    publish_versioned(ev.filter(F.col("event_id") % 2 == 0), base)
    publish_append(ev.filter(F.col("event_id") % 2 == 1), base)
    v = compact_chain(
        spark,
        base,
        stats_cols=["event_id", "user_id"],
        zorder_by=["event_id", "user_id"],
        n_files=16,
    )
    return base, ev, v


def test_zorder_compact_preserves_rows(spark, zordered):
    base, ev, v = zordered
    df, chain = read_version_chain(spark, base)
    assert len(chain) == 1 and chain[0]["version"] == v
    assert df.count() == ev.count()
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in ev.collect())
    assert got == want


def test_zorder_prunes_on_both_dimensions(spark, zordered):
    base, ev, _ = zordered
    hi_e = ev.agg(F.max("event_id")).head()[0]
    hi_u = ev.agg(F.max("user_id")).head()[0]
    # narrow range on dimension 1
    df1, total1, read1 = read_chain_pruned(
        spark, base, "event_id", 0, hi_e // 10
    )
    assert read1 < total1, (read1, total1)
    assert df1.count() == ev.filter(
        F.col("event_id").between(0, hi_e // 10)
    ).count()
    # narrow range on dimension 2 — the one linear clustering would lose
    df2, total2, read2 = read_chain_pruned(
        spark, base, "user_id", 0, max(hi_u // 10, 1)
    )
    assert read2 < total2, (read2, total2)
    assert df2.count() == ev.filter(
        F.col("user_id").between(0, max(hi_u // 10, 1))
    ).count()


def test_linear_clustering_loses_second_dimension(spark, sf_med, tmp_path):
    """The comparison that justifies Z-order: linear event_id clustering
    prunes event_id ranges but reads ~everything for a user_id range,
    while the Z-order layout (fixture above) prunes both."""
    base = str(tmp_path / "lake_linear")
    ev = _events(spark, sf_med)
    publish_versioned(ev.filter(F.col("event_id") % 2 == 0), base)
    publish_append(ev.filter(F.col("event_id") % 2 == 1), base)
    compact_chain(
        spark,
        base,
        stats_cols=["event_id", "user_id"],
        cluster_by="event_id",
        n_files=16,
    )
    hi_u = ev.agg(F.max("user_id")).head()[0]
    _, total, read = read_chain_pruned(
        spark, base, "user_id", 0, max(hi_u // 10, 1)
    )
    # every file spans ~the full user_id domain -> no skipping
    assert read == total


def test_zorder_and_cluster_mutually_exclusive(spark, sf_med, tmp_path):
    base = str(tmp_path / "lake_bad")
    publish_versioned(_events(spark, sf_med).limit(10), base)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_chain(
            spark, base, cluster_by="event_id", zorder_by=["user_id"]
        )
