"""Version-keyed result cache (plans/result_cache.py): hits skip the
build, a new published version invalidates automatically, pinned
builds stay consistent with their key, interrupted writes read as
misses, and vacuum keeps only the newest committed entries."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    publish_append,
    publish_versioned,
    read_version_chain,
)
from novelti_dingo_spark.plans.result_cache import (
    cached_result,
    vacuum_result_cache,
)
from novelti_dingo_spark.sources import load_table


def _setup(spark, sf, tmp_path):
    base = str(tmp_path / "lake")
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)
    return base, o


def test_hit_miss_and_invalidation(spark, sf_small, tmp_path):
    base, o = _setup(spark, sf_small, tmp_path)
    cache = str(tmp_path / "cache")
    calls = {"n": 0}

    def build(s, pinned):
        calls["n"] += 1
        df, _ = read_version_chain(s, base, pinned["orders"])
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )

    df1, hit1 = cached_result(
        spark, cache, "prio_counts", {"orders": base}, build
    )
    assert not hit1 and calls["n"] == 1
    want1 = {(r.o_orderpriority, r.n) for r in df1.collect()}

    df2, hit2 = cached_result(
        spark, cache, "prio_counts", {"orders": base}, build
    )
    assert hit2 and calls["n"] == 1  # served from cache, no rebuild
    assert {(r.o_orderpriority, r.n) for r in df2.collect()} == want1

    # a publish bumps the version -> automatic invalidation
    publish_append(o.filter(F.col("o_orderkey") % 2 == 1), base)
    df3, hit3 = cached_result(
        spark, cache, "prio_counts", {"orders": base}, build
    )
    assert not hit3 and calls["n"] == 2
    want3 = {
        (r.o_orderpriority, r.n)
        for r in read_version_chain(spark, base)[0]
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r.o_orderpriority, r.n) for r in df3.collect()} == want3
    assert want3 != want1
    # the superseded entry still serves its own (older) key's bytes
    assert len(os.listdir(os.path.join(cache, "prio_counts"))) == 2


def test_interrupted_write_reads_as_miss(spark, sf_small, tmp_path):
    base, _ = _setup(spark, sf_small, tmp_path)
    cache = str(tmp_path / "cache")
    calls = {"n": 0}

    def build(s, pinned):
        calls["n"] += 1
        df, _ = read_version_chain(s, base, pinned["orders"])
        return df.agg(F.count(F.lit(1)).alias("n"))

    df1, _ = cached_result(spark, cache, "cnt", {"orders": base}, build)
    n = df1.head()["n"]
    # simulate a crash between data write and manifest commit
    entry = os.path.join(
        cache, "cnt", os.listdir(os.path.join(cache, "cnt"))[0]
    )
    os.remove(os.path.join(entry, "_manifest.json"))
    df2, hit = cached_result(spark, cache, "cnt", {"orders": base}, build)
    assert not hit and calls["n"] == 2 and df2.head()["n"] == n


def test_vacuum_keeps_newest_committed(spark, sf_small, tmp_path):
    base, o = _setup(spark, sf_small, tmp_path)
    cache = str(tmp_path / "cache")

    def build(s, pinned):
        df, _ = read_version_chain(s, base, pinned["orders"])
        return df.agg(F.count(F.lit(1)).alias("n"))

    cached_result(spark, cache, "cnt", {"orders": base}, build)
    publish_append(o.filter(F.col("o_orderkey") % 2 == 1), base)
    cached_result(spark, cache, "cnt", {"orders": base}, build)
    removed = vacuum_result_cache(cache, keep_latest_per_name=1)
    assert len(removed) == 1
    # the surviving entry is the current key: still a hit, no rebuild
    calls = {"n": 0}

    def build2(s, pinned):
        calls["n"] += 1
        return build(s, pinned)

    _, hit = cached_result(spark, cache, "cnt", {"orders": base}, build2)
    assert hit and calls["n"] == 0
