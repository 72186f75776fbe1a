"""Property tests where the oracle is weak (SURVEY.md §5.4): HLL bounds,
plus hand-built-DataFrame unit checks of tricky semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.operators.relational import agg_approx_distinct
from novelti_dingo_spark.sources import load_table


def test_approx_distinct_within_rsd(spark, sf_med):
    """The query now carries its own accuracy witness (approx_ok) plus the
    exact count; verify both against an independent exact computation."""
    exact = {
        r.o_orderstatus: r.n
        for r in load_table(spark, sf_med, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    rows = agg_approx_distinct(spark, sf_med).collect()
    assert {r.o_orderstatus: r.exact_custs for r in rows} == exact
    assert all(r.approx_ok for r in rows), rows


def test_asof_semantics_on_tiny_frame(spark):
    """As-of join on a hand-built frame: latest click ≤ purchase ts."""
    from novelti_dingo_spark.operators import asof as _asof  # registry import
    import novelti_dingo_spark.sources.io as io_mod

    rows = [
        (1, 1_000_000, 7, "click", 0.0, "{}"),
        (2, 2_000_000, 7, "purchase", 5.0, "{}"),
        (3, 3_000_000, 7, "click", 0.0, "{}"),
        (4, 4_000_000, 7, "purchase", 6.0, "{}"),
        (5, 500_000, 8, "purchase", 1.0, "{}"),  # no prior click
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v, p) for i, ts, u, t, v, p in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.timestamp_micros("ts"))

    orig = io_mod.load_table
    try:
        io_mod.load_table = lambda spark, sf_dir, name: df
        _asof.load_table = io_mod.load_table
        out = {
            r.purchase_id: r.last_click_id
            for r in _asof.asof_join_latest_click(spark, "ignored").collect()
        }
    finally:
        io_mod.load_table = orig
        _asof.load_table = orig
    assert out == {2: 1, 4: 3, 5: None}


def test_stratified_sample_proportions(spark, sf_med):
    """Hash-mod stratified sampling keeps rare strata whole and downsamples
    the dominant one to ~25% (within binomial tolerance); deterministic by
    construction (md5 of the key, no RNG)."""
    from novelti_dingo_spark.operators.extras import stratified_sample
    from novelti_dingo_spark.sources import load_table

    d = load_table(spark, sf_med, "documents")
    full = {r.lang: r.n for r in d.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    s1 = stratified_sample(spark, sf_med)
    got = {r.lang: r.n for r in s1.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang in ("de", "es", "fr", "zh"):
        assert got.get(lang) == full[lang], lang  # fraction 1.0 = keep all
    en_frac = got.get("en", 0) / full["en"]
    assert 0.1 < en_frac < 0.45  # 0.25 +- binomial noise on ~200 docs
    # seeded determinism
    got2 = {r.lang: r.n for r in stratified_sample(spark, sf_med).groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert got == got2


def test_hll_sketch_rollup_accuracy(spark, sf_med):
    """Sketch estimates (per-type and merged) within HLL error of exact —
    now carried as the approx_ok witness column; the merged row must
    reflect the union cardinality, not the sum of parts."""
    from novelti_dingo_spark.operators.extras import hll_sketch_rollup
    from novelti_dingo_spark.sources import load_table

    rows = hll_sketch_rollup(spark, sf_med).collect()
    got = {r.event_type: r.exact_users for r in rows}
    assert all(r.approx_ok for r in rows), rows
    e = load_table(spark, sf_med, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL_MERGED"] = e.select("user_id").distinct().count()
    assert got == exact
    # merged != sum of parts (every user does every type in this corpus,
    # so the union must be ~150, not ~750)
    assert got["ALL_MERGED"] < sum(v for k, v in got.items() if k != "ALL_MERGED")
