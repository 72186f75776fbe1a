"""Round-3 additions: heavy hitters (exact vs sample-then-verify) and
time-series operators (rolling z-score, frame-bounded EWMA, hour→day
rollup reuse) — semantics pinned against independent Python recomputation
on collected samples, and the two heavy-hitter paths against each other.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from novelti_dingo_spark.operators.heavy_hitters import (
    heavy_hitter_bigrams,
    heavy_hitters_sampled_verify,
)
from novelti_dingo_spark.operators.timeseries import (
    EWMA_ALPHA,
    ewma_user_value,
    rolling_zscore_anomaly,
    rollup_hour_to_day,
)
from novelti_dingo_spark.sources import load_table


def test_sampled_verify_equals_exact_heavy_hitters(spark, sf_med):
    """On this corpus no true heavy hitter may be lost to the candidate
    sampling pass (threshold margin is 2x the sampling noise)."""
    exact = {
        (r.bg, r.cnt, r.ppm) for r in heavy_hitter_bigrams(spark, sf_med).collect()
    }
    sampled = {
        (r.bg, r.cnt, r.ppm)
        for r in heavy_hitters_sampled_verify(spark, sf_med).collect()
    }
    assert exact, "threshold must select a non-empty heavy tail"
    assert sampled == exact


def test_heavy_hitters_respect_threshold(spark, sf_med):
    from novelti_dingo_spark.operators.heavy_hitters import PPM_THRESHOLD

    d = load_table(spark, sf_med, "documents")
    from novelti_dingo_spark.functions.text_funcs import token_bigrams

    total = d.select(F.explode(token_bigrams("text"))).count()
    for r in heavy_hitter_bigrams(spark, sf_med).collect():
        assert r.cnt * 1_000_000 > PPM_THRESHOLD * total
        assert r.ppm == r.cnt * 1_000_000 // total


def test_ewma_matches_python_recurrence(spark, sf_med):
    """The fold must equal s=(1-a)s+ax over each row's 10-value frame."""
    e = load_table(spark, sf_med, "events")
    vals = [
        r.value
        for r in e.filter(F.col("user_id") == 7)
        .orderBy("ts", "event_id")
        .select("value")
        .collect()
    ]
    got = [
        r.ewma
        for r in ewma_user_value(spark, sf_med)
        .filter(F.col("user_id") == 7)
        .orderBy("event_id")
        .collect()
    ]
    # recompute per row over the trailing-10 frame
    e7 = (
        e.filter(F.col("user_id") == 7)
        .orderBy("ts", "event_id")
        .select("event_id")
        .collect()
    )
    assert len(got) == len(vals) == len(e7)
    for i, g in enumerate(got):
        frame = vals[max(0, i - 9) : i + 1]
        s = frame[0]
        for x in frame[1:]:
            s = s * (1 - EWMA_ALPHA) + x * EWMA_ALPHA
        assert g == s, f"row {i}: {g} != {s}"


def test_rolling_zscore_flags_are_true_outliers(spark, sf_med):
    """Every flagged event must actually be 3 sigma out vs its trailing
    frame, recomputed independently in Python."""
    e = load_table(spark, sf_med, "events")
    flagged = rolling_zscore_anomaly(spark, sf_med).collect()
    assert flagged, "sf0.01 events must produce some anomalies"
    by_user = {}
    for r in (
        e.orderBy("ts", "event_id")
        .select("user_id", "event_id", "value")
        .collect()
    ):
        by_user.setdefault(r.user_id, []).append((r.event_id, r.value))
    index = {
        (u, eid): i
        for u, rows in by_user.items()
        for i, (eid, _) in enumerate(rows)
    }
    for r in flagged:
        i = index[(r.user_id, r.event_id)]
        frame = [v for _, v in by_user[r.user_id][max(0, i - 24) : i]]
        assert len(frame) >= 12
        mu = sum(frame) / len(frame)
        var = sum((x - mu) ** 2 for x in frame) / (len(frame) - 1)
        sigma = math.sqrt(var)
        assert abs(r.value - mu) > 3 * sigma * (1 - 1e-9)
        assert r.n_window == len(frame)


def test_rollup_hour_to_day_consistent_with_raw(spark, sf_med):
    """Re-aggregating the hourly rollup must reproduce the daily numbers
    computed straight from raw events (counts exactly; sums to 4dp)."""
    e = load_table(spark, sf_med, "events")
    daily = {
        (r.day, r.event_type): r
        for r in rollup_hour_to_day(spark, sf_med).collect()
    }
    raw = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    for r in raw.collect():
        got = daily[(r.day, r.event_type)]
        assert got.n_events == r.n
        assert abs(got.total_value - r.sv) < 1e-3
        assert 1 <= got.n_hours <= 24


def test_weighted_sample_is_biased_to_heavy_docs_and_deterministic(spark, sf_med):
    from novelti_dingo_spark.operators.extras import weighted_sample_pps

    a = weighted_sample_pps(spark, sf_med).collect()
    b = weighted_sample_pps(spark, sf_med).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 50
    d = load_table(spark, sf_med, "documents")
    corpus_mean = d.agg(F.avg("n_chars")).head()[0]
    sample_mean = sum(r.n_chars for r in a) / len(a)
    # PPS by n_chars must overrepresent long documents
    assert sample_mean > corpus_mean * 1.05


def test_prefix_filter_join_equals_gemm_jaccard(spark, sf_med):
    """Two exact set-similarity implementations (blocked GEMM vs prefix
    filtering) must produce identical pairs — completeness of the prefix
    pruning theorem on real data."""
    from novelti_dingo_spark.operators.dedup import (
        jaccard_pairs_prefix_filter,
        ngram_jaccard_pairs,
    )

    a = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(spark, sf_med).collect()
    }
    b = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_prefix_filter(spark, sf_med).collect()
    }
    assert a, "corpus must contain near-dup pairs"
    assert a == b


def test_apply_rollup_increment_equals_recompute(spark, sf_med):
    """Continuous-aggregate maintenance: rollup(history) folded with a
    new batch must equal rollup(history ∪ batch) — counts exactly, float
    sums to 1e-9 (merge order differs, IEEE addition isn't associative)."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.operators.timeseries import (
        apply_rollup_increment,
        hourly_rollup,
    )
    from novelti_dingo_spark.sources.io import load_table

    e = load_table(spark, sf_med, "events")
    cut = e.agg(F.expr("percentile(unix_micros(ts), 0.8)").alias("c")).collect()[0]["c"]
    hist = e.filter(F.unix_micros("ts") <= cut)
    batch = e.filter(F.unix_micros("ts") > cut)
    assert batch.count() > 0 and hist.count() > 0

    maintained = apply_rollup_increment(hourly_rollup(hist), batch)
    full = hourly_rollup(e)
    j = maintained.alias("m").join(
        full.alias("f"), ["h", "event_type"], "full_outer"
    )
    assert j.filter(F.col("m.n").isNull() | F.col("f.n").isNull()).count() == 0
    assert j.filter(F.col("m.n") != F.col("f.n")).count() == 0
    assert j.filter(F.abs(F.col("m.sv") - F.col("f.sv")) > 1e-9).count() == 0


def test_segtree_random_ranges_match_direct_filter(spark, sf_small):
    """Property: the dyadic decomposition partitions ANY hour range —
    40 seeded-random ranges over the corpus span must reproduce the
    direct filtered aggregate exactly (decimal sums: bit-exact)."""
    import random

    from pyspark.sql import functions as F

    from novelti_dingo_spark.operators.timeseries import segtree_rollup
    from novelti_dingo_spark.sources.io import load_table

    H0 = 473352  # 2024-01-01T00Z in epoch hours; corpus spans 720 h
    rng = random.Random(20240814)
    ranges = []
    for rid in range(1, 41):
        a = rng.randrange(0, 720)
        b = rng.randrange(0, 720)
        lo, hi = (min(a, b), max(a, b) + 1)
        ranges.append((rid, H0 + lo, H0 + hi))

    got = {
        r["range_id"]: (r["n_events"], r["sum_value"])
        for r in segtree_rollup(spark, sf_small, ranges).collect()
    }

    e = load_table(spark, sf_small, "events").select(
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    for rid, rs, re_ in ranges:
        row = (
            e.filter((F.col("h") >= rs) & (F.col("h") < re_))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("v").cast("double"), 2).alias("s"),
            )
            .head()
        )
        if row.n == 0:
            assert rid not in got
        else:
            assert got[rid] == (row.n, row.s), rid


def test_segtree_overlong_range_raises(spark, sf_small):
    import pytest

    from novelti_dingo_spark.operators.timeseries import (
        SEGTREE_LEVELS,
        segtree_rollup,
    )

    too_long = 1 << (SEGTREE_LEVELS + 1)
    with pytest.raises(ValueError):
        segtree_rollup(spark, sf_small, [(1, 0, too_long)])
