"""ETL pipeline tests: mart correctness + partition layout, and the
exactly-once idempotent-rerun contract of incremental ingestion."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import build_order_mart, incremental_events_ingest
from novelti_dingo_spark.sources import load_table


def test_order_mart_build(spark, sf_small, tmp_path):
    out = build_order_mart(spark, sf_small, str(tmp_path))
    mart = spark.read.parquet(out["order_mart"])
    li = load_table(spark, sf_small, "lineitem")
    assert mart.count() == li.count()  # denormalization preserves the grain
    assert any(
        d.startswith("order_year=") for d in os.listdir(out["order_mart"])
    ), "mart must be partitioned by order year"
    daily = spark.read.parquet(out["daily_revenue"])
    # rollup total == mart total
    a = daily.agg(F.round(F.sum("revenue"), 0).alias("t")).collect()[0].t
    b = mart.agg(F.round(F.sum("net_price"), 0).alias("t")).collect()[0].t
    assert abs(a - b) <= 1  # 2dp-rounded daily partials vs raw sum


def test_incremental_ingest_exactly_once(spark, sf_small, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    shutil.copy(f"{sf_small}/events.parquet", f"{src}/batch1.parquet")

    incremental_events_ingest(spark, src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 1000

    # rerun with no new files: nothing is reprocessed
    incremental_events_ingest(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # new file arrives: only it is processed
    shutil.copy(f"{sf_small}/events.parquet", f"{src}/batch2.parquet")
    incremental_events_ingest(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 2 * n1

    # schema of the sink is the normalized one
    cols = set(spark.read.parquet(out).columns)
    assert {"event_id", "ts", "user_id", "event_type", "value", "k", "event_hour"} <= cols
    assert "props" not in cols


def test_compaction_reduces_file_count(spark, sf_small, tmp_path):
    from novelti_dingo_spark.pipelines import compact_parquet

    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    li = load_table(spark, sf_small, "lineitem")
    li.repartition(64).write.parquet(frag)  # simulate small-files problem
    n_before = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_before >= 32
    compact_parquet(spark, frag, out, target_mb=256)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after <= 2
    assert spark.read.parquet(out).count() == li.count()


def test_schema_evolution_merge(spark, sf_small, tmp_path):
    """mergeSchema read across files written with evolving schemas — new
    columns appear as nulls for old files (additive evolution contract)."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "evolving")
    v1 = load_table(spark, sf_small, "region")
    v1.write.parquet(d + "/batch=1")
    v2 = v1.withColumn("r_comment", F.concat(F.lit("about "), "r_name"))
    v2.write.parquet(d + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"r_regionkey", "r_name", "r_comment", "batch"}
    assert merged.count() == 2 * v1.count()
    old = merged.filter(F.col("batch") == 1)
    assert old.filter(F.col("r_comment").isNull()).count() == old.count()


def test_curate_corpus_funnel(spark, tmp_path):
    """End-to-end curation at sf0.1 (the sf with real exact+near dups):
    monotone funnel, published parquet partitioned by lang, and the
    near-dup losers provably absent."""
    from novelti_dingo_spark.operators.dedup import minhash_lsh_pairs
    from novelti_dingo_spark.pipelines import curate_corpus

    sf = "/root/testdata/sf0.1"
    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, sf, out, min_quality=0.5,
                          lang_fractions={"en": 0.5})
    assert (
        stats["raw"]
        >= stats["after_exact_dedup"]
        >= stats["after_neardup"]
        >= stats["after_quality"]
        >= stats["published"]
    )
    assert stats["raw"] == 5000
    assert stats["after_exact_dedup"] == 4992  # measured: 8 exact dups
    assert stats["after_neardup"] < stats["after_exact_dedup"]  # 216 near-dup groups
    published = spark.read.parquet(out)
    assert published.count() == stats["published"]
    assert any(d.startswith("lang=") for d in os.listdir(out))
    # no published doc is the dropped side of a high-jaccard pair
    losers = {r.doc_b for r in minhash_lsh_pairs(spark, sf).collect()}
    kept = {r.doc_id for r in published.select("doc_id").collect()}
    assert not (losers & kept)


def test_upsert_by_partition(spark, sf_small, tmp_path):
    from pyspark.sql import functions as F

    from novelti_dingo_spark.pipelines import upsert_by_partition

    target = str(tmp_path / "mart")
    orders = load_table(spark, sf_small, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("order_year").parquet(target)
    years = [r[0] for r in spark.read.parquet(target).select("order_year").distinct().collect()]

    updates = (
        orders.filter(F.col("order_year") == 1996)
        .limit(10)
        .withColumn("o_totalprice", F.lit(0.0))
    )
    n_parts = upsert_by_partition(
        spark, target, updates, key="o_orderkey", partition_col="order_year"
    )
    assert n_parts == 1
    back = spark.read.parquet(target)
    assert back.count() == orders.count()  # upsert, not append
    zeroed = back.filter(F.col("o_totalprice") == 0.0)
    assert zeroed.count() == 10
    assert set(
        r[0] for r in back.select("order_year").distinct().collect()
    ) == set(years)  # untouched partitions intact


def test_scd2_intervals(spark):
    from novelti_dingo_spark.pipelines import scd2_build

    snaps = spark.createDataFrame(
        [
            (1, "gold", 10),
            (1, "gold", 20),    # no change -> merged
            (1, "platinum", 30),
            (2, "silver", 10),
        ],
        "cust long, tier string, snap_ts long",
    )
    out = {
        (r.cust, r.valid_from): (r.tier, r.valid_to)
        for r in scd2_build(spark, snaps, "cust", ["tier"], "snap_ts").collect()
    }
    assert out == {
        (1, 10): ("gold", 30),
        (1, 30): ("platinum", None),
        (2, 10): ("silver", None),
    }


def test_versioned_publish_and_pinning(spark, sf_small, tmp_path):
    from pyspark.sql import functions as F

    from novelti_dingo_spark.pipelines import publish_versioned, read_version

    base = str(tmp_path / "dataset")
    d1 = load_table(spark, sf_small, "documents")
    v1 = publish_versioned(d1, base, meta={"stage": "raw"})
    d2 = d1.filter(F.col("lang") != "zh")
    v2 = publish_versioned(d2, base, meta={"stage": "filtered"})
    assert (v1, v2) == (1, 2)

    latest, m_latest = read_version(spark, base)
    assert m_latest["version"] == 2 and m_latest["stage"] == "filtered"
    assert latest.count() == d2.count() == m_latest["rows"]

    pinned, m1 = read_version(spark, base, version=1)
    assert pinned.count() == d1.count() == m1["rows"]  # v1 untouched by v2
    assert "doc_id" in m1["schema"]


def test_read_as_of_time_travel(spark, sf_small, tmp_path):
    """AS-OF-timestamp resolution: newest published_ts <= ts wins;
    pre-history timestamps raise instead of serving newer data; vacuumed
    versions stop resolving (time travel reaches retained history only)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from novelti_dingo_spark.pipelines import (
        publish_versioned,
        read_as_of,
        vacuum_versions,
    )

    base = str(tmp_path / "dataset")
    d1 = load_table(spark, sf_small, "documents")
    publish_versioned(d1, base, published_ts="2026-01-01T00:00:00.000000Z")
    d2 = d1.filter(F.col("lang") != "zh")
    publish_versioned(d2, base, published_ts="2026-02-01T00:00:00.000000Z")
    d3 = d2.filter(F.col("lang") != "de")
    publish_versioned(d3, base, published_ts="2026-03-01T00:00:00.000000Z")

    df, m = read_as_of(spark, base, "2026-02-15T00:00:00.000000Z")
    assert m["version"] == 2 and df.count() == d2.count()
    # boundary: exactly-at publish time resolves to that version
    df, m = read_as_of(spark, base, "2026-02-01T00:00:00.000000Z")
    assert m["version"] == 2
    # far future -> newest retained
    df, m = read_as_of(spark, base, "2027-01-01T00:00:00.000000Z")
    assert m["version"] == 3
    with _pytest.raises(LookupError):
        read_as_of(spark, base, "2025-12-31T23:59:59.000000Z")

    # vacuum to the last 2: v1's timestamp range no longer resolves
    assert vacuum_versions(spark, base, keep_last=2) == [1]
    with _pytest.raises(LookupError):
        read_as_of(spark, base, "2026-01-15T00:00:00.000000Z")


def test_upsert_empty_updates_is_noop(spark, sf_small, tmp_path):
    """Empty updates (a replayed/empty micro-batch) must be a clean no-op
    — not an UNABLE_TO_INFER_SCHEMA crash from a schema-less staging dir."""
    import duckdb

    from novelti_dingo_spark.pipelines import upsert_by_partition
    from novelti_dingo_spark.sources.io import load_table

    target = str(tmp_path / "t")
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    o.write.partitionBy("o_orderpriority").parquet(target)
    before = duckdb.sql(f"SELECT count(*) FROM '{target}/*/*.parquet'").fetchone()
    n = upsert_by_partition(
        spark,
        target,
        o.filter("o_orderkey < 0"),  # empty
        key="o_orderkey",
        partition_col="o_orderpriority",
    )
    assert n == 0
    after = duckdb.sql(f"SELECT count(*) FROM '{target}/*/*.parquet'").fetchone()
    assert after == before


def test_merge_hourly_empty_first_batch_defers_creation(spark, sf_small, tmp_path):
    """An empty FIRST micro-batch must not create a schema-less mart dir
    that poisons every later merge."""
    from novelti_dingo_spark.sources import lakefs
    from novelti_dingo_spark.sources.io import load_table
    from novelti_dingo_spark.streaming.events import merge_hourly_batch

    target = str(tmp_path / "mart")
    ev = load_table(spark, sf_small, "events")
    merge_hourly_batch(ev.filter("event_id < 0"), 0, target)
    assert not lakefs.exists(spark, target)
    merge_hourly_batch(ev.filter("event_id < 500"), 1, target)
    got = spark.read.parquet(target)
    assert got.count() > 0 and "last_batch_id" in got.columns


def test_replace_text_atomic_pointer(spark, tmp_path):
    """replace_text overwrites in place with no missing-pointer window
    artifacts (no stale .tmp, correct content after repeated flips)."""
    from novelti_dingo_spark.sources import lakefs

    ptr = str(tmp_path / "LATEST")
    for v in ("1", "2", "3"):
        lakefs.replace_text(spark, ptr, v)
        assert lakefs.read_text(spark, ptr) == v
    assert not lakefs.exists(spark, ptr + ".tmp")


def test_vacuum_versions_respects_retention_and_pin(spark, sf_small, tmp_path):
    """vacuum keeps the newest N versions plus whatever LATEST pins,
    deletes the rest, and surviving versions stay fully readable."""
    from novelti_dingo_spark.pipelines import (
        publish_versioned,
        read_version,
        vacuum_versions,
    )
    from novelti_dingo_spark.sources import lakefs

    base = str(tmp_path / "vds")
    r = load_table(spark, sf_small, "region")
    for i in range(4):
        publish_versioned(r.limit(i + 1), base)

    # roll LATEST back to v2, then vacuum keeping only the newest 1
    lakefs.replace_text(spark, f"{base}/LATEST", "2")
    deleted = vacuum_versions(spark, base, keep_last=1)
    assert deleted == [1, 3]  # v4 kept by retention, v2 kept by the pin
    df, manifest = read_version(spark, base)  # follows LATEST -> v2
    assert manifest["version"] == 2 and df.count() == 2
    df4, _ = read_version(spark, base, version=4)
    assert df4.count() == 4
    assert not lakefs.exists(spark, f"{base}/v=1")


def test_snapshot_publish_atomic_multi_table(spark, sf_small, tmp_path):
    """Multi-table snapshots: LATEST always names a mutually-consistent
    table set; a failed publish (crash before the pointer flip) is
    invisible; vacuum reclaims it."""
    from novelti_dingo_spark.pipelines import (
        publish_snapshot,
        read_snapshot,
        vacuum_snapshots,
    )
    from novelti_dingo_spark.sources import lakefs

    base = str(tmp_path / "snaps")
    r = load_table(spark, sf_small, "region")
    n = load_table(spark, sf_small, "nation")

    v1 = publish_snapshot({"region": r, "nation": n}, base)
    v2 = publish_snapshot({"region": r.limit(3), "nation": n.limit(10)}, base)
    assert (v1, v2) == (1, 2)

    tables, manifest = read_snapshot(spark, base)
    assert manifest["snapshot"] == 2
    assert tables["region"].count() == 3 and tables["nation"].count() == 10
    assert manifest["tables"]["nation"]["rows"] == 10
    old, m1 = read_snapshot(spark, base, version=1)
    assert old["region"].count() == 5 and m1["snapshot"] == 1

    # simulate a crash mid-publish: tables written, manifest+flip missing
    lakefs.mkdirs(spark, f"{base}/snap=3")
    r.limit(1).write.parquet(f"{base}/snap=3/region")
    tables, manifest = read_snapshot(spark, base)
    assert manifest["snapshot"] == 2  # readers never see the torn snapshot

    deleted = vacuum_snapshots(spark, base, keep_last=1)
    # snap=3 is newest by number → kept by retention; snap=2 kept by pin;
    # snap=1 reclaimed
    assert deleted == [1]
    assert not lakefs.exists(spark, f"{base}/snap=1")
    tables, manifest = read_snapshot(spark, base)
    assert manifest["snapshot"] == 2


def test_merge_rows_semantics(spark):
    from novelti_dingo_spark.pipelines import merge_rows

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "B", 21.0), (5, "e", 50.0)], "id long, name string, v double"
    )
    deletes = spark.createDataFrame([(3,), (5,)], "id long")
    got = {
        r.id: (r.name, r.v)
        for r in merge_rows(target, updates, ["id"], deletes).collect()
    }
    # 1,4 untouched; 2 updated; 3 deleted; 5 inserted-then-deleted
    assert got == {1: ("a", 10.0), 2: ("B", 21.0), 4: ("d", 40.0)}

    # without deletes: plain upsert
    got2 = {
        r.id: (r.name, r.v) for r in merge_rows(target, updates, ["id"]).collect()
    }
    assert got2 == {
        1: ("a", 10.0),
        2: ("B", 21.0),
        3: ("c", 30.0),
        4: ("d", 40.0),
        5: ("e", 50.0),
    }


def test_release_training_corpus_end_to_end(spark, sf_small, tmp_path):
    """Capstone: curate -> pack -> versioned release. The manifest must
    carry a monotone curation funnel, a model card that beats baseline,
    token totals, and per-file doc_id stats; the published version must
    read back with pack assignments consistent with the budget."""
    from novelti_dingo_spark.pipelines import (
        read_version,
        release_training_corpus,
    )

    base = str(tmp_path / "release")
    m = release_training_corpus(spark, sf_small, base, pack_budget=256)

    f = m["funnel"]
    assert (
        f["raw"]
        >= f["after_exact_dedup"]
        >= f["after_neardup"]
        >= f["after_quality"]
        >= f["published"]
        > 0
    )
    assert m["model_card"]["accuracy"] >= m["model_card"]["baseline"] - 1e-9
    assert m["total_tokens"] > 0 and m["n_bins"] > 0
    assert m["file_stats"]["columns"] == ["doc_id"]

    df, m2 = read_version(spark, base + "/corpus")
    assert m2["version"] == m["version"]
    assert df.count() == f["published"]
    # no bin exceeds budget by more than one max-length document
    from pyspark.sql import functions as F2

    over = (
        df.groupBy("source", "bin_id")
        .agg(F2.sum("n_tokens").alias("t"))
        .join(df.agg(F2.max("n_tokens").alias("mx")))
        .filter(F2.col("t") >= 256 + F2.col("mx"))
        .count()
    )
    assert over == 0


def test_release_pipeline_is_deterministic(spark, sf_small, tmp_path):
    """Two releases from the same corpus must contain IDENTICAL rows
    (funnel, packing, token totals) — reproducibility is the point of
    versioning; only the publish timestamp may differ."""
    from novelti_dingo_spark.pipelines import (
        read_version,
        release_training_corpus,
    )

    m1 = release_training_corpus(spark, sf_small, str(tmp_path / "r1"))
    m2 = release_training_corpus(spark, sf_small, str(tmp_path / "r2"))
    assert m1["funnel"] == m2["funnel"]
    assert m1["total_tokens"] == m2["total_tokens"]
    assert m1["n_bins"] == m2["n_bins"]
    assert m1["model_card"] == m2["model_card"]
    df1, _ = read_version(spark, str(tmp_path / "r1") + "/corpus")
    df2, _ = read_version(spark, str(tmp_path / "r2") + "/corpus")
    rows1 = {tuple(r) for r in df1.select("doc_id", "bin_id", "n_tokens").collect()}
    rows2 = {tuple(r) for r in df2.select("doc_id", "bin_id", "n_tokens").collect()}
    assert rows1 == rows2


def test_table_history_kinds_and_pointers(spark, sf_small, tmp_path):
    """table_history classifies every commit kind from manifests alone
    and flags the LATEST / STAGED pointers."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.pipelines import (
        delete_rows_mor,
        publish_append,
        publish_staged,
        publish_versioned,
        table_history,
    )
    from novelti_dingo_spark.sources.io import load_table

    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "ds")
    publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)  # v1
    publish_append(  # v2, adds a column
        o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
            "band", F.lit("x")
        ),
        base,
        evolve="additive",
    )
    delete_rows_mor(spark, base, "o_orderkey", [2, 4])  # v3
    publish_staged(o.limit(5), base)  # v4 candidate
    h = {r.version: r for r in table_history(spark, base).collect()}
    assert [h[v].kind for v in (1, 2, 3, 4)] == [
        "full", "append", "mor_delete", "staged",
    ]
    assert h[2].parent == 1 and h[3].parent == 2
    assert "add:['band']" in h[2].evolution
    assert h[3].is_latest == "true" and h[4].is_staged == "true"
    assert h[3].rows == h[1].rows + h[2].rows - 2
