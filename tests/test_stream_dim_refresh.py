"""Streaming joins against the versioned lake dimension
(streaming.events.run_enrich_with_lake_dim) and partitioned streaming
ingestion (stream_append_publish partition_by): a dim publish landing
between micro-batches is picked up by the next batch WITHOUT restarting
the query; a pinned version never moves; streamed hive-partitioned
segments compose with the chain readers."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from novelti_dingo_spark import schemas
from novelti_dingo_spark.pipelines import (
    publish_versioned,
    read_chain_pruned,
    read_version_chain,
)
from novelti_dingo_spark.sources.io import load_table
from novelti_dingo_spark.streaming.events import run_enrich_with_lake_dim


def _stage_event_files(spark, sf_small, tmp_path, n_files=2):
    """Split the events table into n single-file parquets the file
    source will deliver as separate micro-batches."""
    ev = load_table(spark, sf_small, "events")
    src = tmp_path / "src"
    src.mkdir()
    files = []
    for i in range(n_files):
        staged = str(tmp_path / f"staged{i}")
        ev.filter(F.col("event_id") % n_files == i).coalesce(1).write.parquet(
            staged
        )
        part = glob.glob(staged + "/part-*.parquet")[0]
        dst = src / f"batch{i}.parquet"
        shutil.copy(part, dst)
        files.append(dst)
    return str(src), ev


def _dim_v1_v2(spark, sf_small):
    c = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    v2 = c.withColumn("c_mktsegment", F.concat("c_mktsegment", F.lit("_V2")))
    return c, v2


def test_dim_refresh_between_micro_batches(spark, sf_small, tmp_path):
    src, ev = _stage_event_files(spark, sf_small, tmp_path, n_files=2)
    c1, c2 = _dim_v1_v2(spark, sf_small)
    dim_base = str(tmp_path / "dim")
    publish_versioned(c1, dim_base)

    published = {"done": False}

    def after_batch(epoch_id):
        # simulate an upstream dim publish landing mid-query
        if not published["done"]:
            publish_versioned(c2, dim_base)
            published["done"] = True

    out = str(tmp_path / "out")
    run_enrich_with_lake_dim(
        spark,
        src,
        dim_base,
        out,
        str(tmp_path / "ckpt"),
        schemas.EVENTS_TS_NS,
        dim_cols=["c_mktsegment"],
        after_batch=after_batch,
    )
    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    versions = {
        r._dim_version for r in got.select("_dim_version").distinct().collect()
    }
    assert versions == {1, 2}, versions
    # rows enriched by v2 carry the suffixed segment, v1 rows the raw one
    v2rows = got.filter(F.col("_dim_version") == 2).filter(
        F.col("c_mktsegment").isNotNull()
    )
    assert v2rows.count() > 0
    assert v2rows.filter(~F.col("c_mktsegment").endswith("_V2")).count() == 0
    v1rows = got.filter(F.col("_dim_version") == 1).filter(
        F.col("c_mktsegment").isNotNull()
    )
    assert v1rows.count() > 0
    assert v1rows.filter(F.col("c_mktsegment").endswith("_V2")).count() == 0


def test_pinned_version_never_moves(spark, sf_small, tmp_path):
    src, ev = _stage_event_files(spark, sf_small, tmp_path, n_files=2)
    c1, c2 = _dim_v1_v2(spark, sf_small)
    dim_base = str(tmp_path / "dim")
    publish_versioned(c1, dim_base)
    publish_versioned(c2, dim_base)  # LATEST is v2

    out = str(tmp_path / "out")
    run_enrich_with_lake_dim(
        spark,
        src,
        dim_base,
        out,
        str(tmp_path / "ckpt"),
        schemas.EVENTS_TS_NS,
        dim_cols=["c_mktsegment"],
        pin_version=1,
    )
    got = spark.read.parquet(out)
    assert {r._dim_version for r in got.select("_dim_version").distinct().collect()} == {1}


def test_stream_partitioned_segments_compose_with_chain(
    spark, sf_small, tmp_path
):
    from novelti_dingo_spark.streaming.cdc import stream_append_publish

    ev = load_table(spark, sf_small, "events").withColumn(
        "day", F.dayofmonth("ts")
    )
    src = tmp_path / "src"
    src.mkdir()
    staged = str(tmp_path / "staged")
    ev.coalesce(1).write.parquet(staged)
    shutil.copy(glob.glob(staged + "/part-*.parquet")[0], src / "b1.parquet")

    base = str(tmp_path / "lake")
    schema = spark.read.parquet(staged).schema
    stream_append_publish(
        spark,
        str(src),
        base,
        str(tmp_path / "ckpt"),
        schema,
        partition_by=["day"],
    )
    df, chain = read_version_chain(spark, base)
    assert chain[0]["partition_by"] == ["day"]
    assert df.count() == ev.count()
    # directory pruning through the chain read
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    lo = hi = days[0]
    pruned, total, n_read = read_chain_pruned(spark, base, "day", lo, hi)
    assert n_read < total
    assert pruned.count() == ev.filter(F.col("day") == lo).count()


def test_late_arrival_inner_retry_eventual_parity(spark, sf_small, tmp_path):
    """Events whose dim key is missing park in the pending queue and
    emit the moment a refreshed dim carries the key; once the dim is
    complete, the union of all epochs equals the batch inner join,
    each event exactly once."""
    from novelti_dingo_spark.streaming.events import (
        run_enrich_inner_with_retry,
    )

    src, ev = _stage_event_files(spark, sf_small, tmp_path, n_files=3)
    c = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    dim_base = str(tmp_path / "dim")
    publish_versioned(c.filter(F.col("c_custkey") < 8), dim_base)

    published = {"done": False}

    def after_batch(epoch_id):
        if not published["done"]:
            publish_versioned(c, dim_base)  # the late keys arrive
            published["done"] = True

    out = str(tmp_path / "out")
    run_enrich_inner_with_retry(
        spark,
        src,
        dim_base,
        out,
        str(tmp_path / "ckpt"),
        schemas.EVENTS_TS_NS,
        dim_cols=["c_mktsegment"],
        after_batch=after_batch,
    )
    got = spark.read.parquet(out + "/epoch=*")
    # exactly-once: every event appears exactly once
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
    # late rows resolved against the refreshed dim version, with wait
    late = got.filter(F.col("_waited") > 0)
    assert late.count() > 0
    assert {r._dim_version for r in late.select("_dim_version").distinct().collect()} == {2}
    # batch-parity of the enrichment itself
    want = ev.join(
        c.withColumnRenamed("c_custkey", "user_id"), "user_id"
    ).count()
    assert got.count() == want
    # pending queue drained
    from novelti_dingo_spark.pipelines import read_version

    pend, _ = read_version(spark, str(tmp_path / "ckpt") + "_pending")
    assert pend.count() == 0


def test_never_arriving_keys_expire_to_deadletter(spark, sf_small, tmp_path):
    """A key the dim never learns cannot grow the queue forever: after
    max_wait_batches retries the row diverts to the dead-letter dir and
    is never emitted as matched."""
    from novelti_dingo_spark.streaming.events import (
        run_enrich_inner_with_retry,
    )

    src, ev = _stage_event_files(spark, sf_small, tmp_path, n_files=3)
    c = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    dim_base = str(tmp_path / "dim")
    publish_versioned(c.filter(F.col("c_custkey") < 8), dim_base)
    out = str(tmp_path / "out")
    run_enrich_inner_with_retry(
        spark,
        src,
        dim_base,
        out,
        str(tmp_path / "ckpt"),
        schemas.EVENTS_TS_NS,
        dim_cols=["c_mktsegment"],
        max_wait_batches=1,
    )
    matched = spark.read.parquet(out + "/epoch=*")
    n_match_want = ev.filter(F.col("user_id") < 8).count()
    assert matched.count() == n_match_want
    assert matched.filter(F.col("user_id") >= 8).count() == 0
    dead = spark.read.parquet(out + "/_deadletter/epoch=*")
    # batch-0 and batch-1 unmatched rows expired (waited 1 batch each);
    # batch-2 unmatched are still pending when the stream drains
    assert dead.filter(F.col("user_id") < 8).count() == 0
    assert dead.count() > 0
    from novelti_dingo_spark.pipelines import read_version

    pend, _ = read_version(spark, str(tmp_path / "ckpt") + "_pending")
    assert (
        dead.count() + pend.count()
        == ev.filter(F.col("user_id") >= 8).count()
    )


def test_event_time_ttl_expiry_is_replay_stable(spark, sf_small, tmp_path):
    """With max_wait_event_time, expiry follows the stream's event-time
    frontier: after the final batch, every unmatched row older than
    (frontier - TTL) is dead-lettered and exactly the younger ones are
    still pending — a split determined by the DATA, not by batch
    pacing."""
    from novelti_dingo_spark.pipelines import read_version
    from novelti_dingo_spark.streaming.events import (
        run_enrich_inner_with_retry,
    )

    src, ev = _stage_event_files(spark, sf_small, tmp_path, n_files=3)
    c = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    dim_base = str(tmp_path / "dim")
    publish_versioned(c.filter(F.col("c_custkey") < 8), dim_base)
    out = str(tmp_path / "out")
    run_enrich_inner_with_retry(
        spark,
        src,
        dim_base,
        out,
        str(tmp_path / "ckpt"),
        schemas.EVENTS_TS_NS,
        dim_cols=["c_mktsegment"],
        max_wait_event_time="2 hours",
    )
    unmatched = ev.filter(F.col("user_id") >= 8)
    frontier = ev.agg(F.max("ts")).head()[0]
    cutoff = frontier - __import__("datetime").timedelta(hours=2)
    dead = spark.read.parquet(out + "/_deadletter/epoch=*")
    pend, _ = read_version(spark, str(tmp_path / "ckpt") + "_pending")
    want_dead = unmatched.filter(F.col("ts") < F.lit(cutoff)).count()
    want_pend = unmatched.filter(F.col("ts") >= F.lit(cutoff)).count()
    assert dead.count() == want_dead > 0
    assert pend.count() == want_pend > 0
    # matched side unaffected by the TTL
    got = spark.read.parquet(out + "/epoch=*")
    assert got.count() == ev.filter(F.col("user_id") < 8).count()
