"""hash_sample: the threshold-filter sampler must be BIT-IDENTICAL to
the orderBy(xxhash64, key).limit() form it replaces (the trainer twins'
init contract rides on the sample being that ordering's exact prefix),
while planning a distributed filter instead of a corpus-wide
TakeOrdered driver merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.operators import hash_sample as hs
from novelti_dingo_spark.sources import load_table


def _prefix(df, s):
    return (
        df.orderBy(F.xxhash64("vec_id"), "vec_id").limit(s).collect()
    )


def test_hash_sample_df_matches_takeordered_prefix(spark, sf_big):
    e = load_table(spark, sf_big, "embeddings").select("vec_id", "embedding")
    for s in (1, 64, 500):
        got = hs.hash_sample_df(e, s).collect()
        want = _prefix(e, s)
        assert [r.vec_id for r in got] == [r.vec_id for r in want]
        assert [list(r.embedding) for r in got] == [
            list(r.embedding) for r in want
        ]


def test_hash_sample_df_plans_a_threshold_filter(spark, sf_big):
    """The TakeOrdered must run over the filter's survivors, not the
    corpus: the executed plan's scan feeds a xxhash64 <= threshold
    Filter (pushable to the source in principle) below the sort."""
    e = load_table(spark, sf_big, "embeddings").select("vec_id", "embedding")
    df = hs.hash_sample_df(e, 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "Filter" in plan
    # and the survivor set the TakeOrdered sees is ~margin*s, not n
    n = e.count()
    thr = hs._threshold(n, 64, hs._MARGIN)
    survivors = e.filter(F.xxhash64("vec_id") <= F.lit(thr)).count()
    assert 64 <= survivors < n / 4


def test_collect_hash_sample_matches_prefix_and_order(spark, sf_big):
    e = load_table(spark, sf_big, "embeddings").select("vec_id", "embedding")
    rows = hs.collect_hash_sample(e, 100)
    want = _prefix(e, 100)
    assert [r.vec_id for r in rows] == [r.vec_id for r in want]
    # rows carry the hash used for the order, ascending
    hsv = [r["_h"] for r in rows]
    assert hsv == sorted(hsv)


def test_shortfall_escalation_still_exact(spark, sf_big, monkeypatch):
    """Force the first threshold to pass too few rows: the margin
    escalates (x4 per retry) and the final sample is still the exact
    prefix — the loop is a correctness backstop, not best-effort."""
    monkeypatch.setattr(hs, "_MARGIN", 0.05)
    e = load_table(spark, sf_big, "embeddings").select("vec_id", "embedding")
    got = [r.vec_id for r in hs.collect_hash_sample(e, 200)]
    want = [r.vec_id for r in _prefix(e, 200)]
    assert got == want
    got_df = [r.vec_id for r in hs.hash_sample_df(e, 200).collect()]
    assert got_df == want


def test_sample_at_least_corpus_returns_everything(spark, sf_small):
    e = load_table(spark, sf_small, "embeddings").select("vec_id")
    n = e.count()
    rows = hs.collect_hash_sample(e, n + 10)
    assert len(rows) == n
    df = hs.hash_sample_df(e, n + 10)
    assert df.count() == n
