"""Property tests for the bloom-filter semi-join reduction and the
count-min sketch: the guarantees the exactness arguments rest on
(no false negatives / never-underestimate / mergeability), plus a
measured-reduction check so the operators demonstrably do their job."""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.operators.bloom import (
    M_BITS,
    bloom_build,
    bloom_probe,
)
from novelti_dingo_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)
from novelti_dingo_spark.functions.text_funcs import token_bigrams
from novelti_dingo_spark.sources.io import load_table


def test_bloom_no_false_negatives(spark, sf_med):
    """Every build-side key must pass its own filter — the property the
    exact-sandwich argument depends on."""
    keys = (
        load_table(spark, sf_med, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bloom = bloom_build(keys, "o_orderkey")
    passed = bloom_probe(keys, "o_orderkey", bloom)
    assert passed.count() == keys.count()


def test_bloom_compact_and_reduces(spark, sf_med):
    """The bitset stays <= M/64 rows, and probing the full lineitem
    table drops most non-matching rows: survivors ⊇ true matches with a
    false-positive overhang far below the non-matching population."""
    orders = load_table(spark, sf_med, "orders")
    keys = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    li = load_table(spark, sf_med, "lineitem").select("l_orderkey")
    bloom = bloom_build(keys, "o_orderkey")
    assert bloom.count() <= M_BITS // 64

    total = li.count()
    survivors = bloom_probe(li, "l_orderkey", bloom).count()
    true_matches = li.join(
        keys, li["l_orderkey"] == keys["o_orderkey"], "left_semi"
    ).count()
    assert survivors >= true_matches  # no false negatives row-wise
    # URGENT is ~1/5 of orders; fp rate ~6e-4 means the overhang above
    # the true matches is a sliver of the ~4/5 non-matching rows
    assert survivors - true_matches < 0.01 * (total - true_matches)
    assert survivors < 0.35 * total


def test_cms_never_underestimates_and_bounded(spark, sf_small):
    """For EVERY bigram: min-over-rows cell count >= true count (the
    soundness of the CMS prune), and the overestimate stays within a few
    expected-collision-widths of truth (N/W per cell in expectation)."""
    d = load_table(spark, sf_small, "documents")
    big = d.select(F.explode(token_bigrams("text")).alias("bg"))
    n = big.count()
    cms = cms_build(big, "bg")
    # grid never exceeds its fixed size, and each row sums to N exactly
    assert cms.count() <= CMS_DEPTH * CMS_WIDTH
    row_sums = cms.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
    assert len(row_sums) == CMS_DEPTH and all(r["s"] == n for r in row_sums)

    truth = big.groupBy("bg").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(truth.select("bg"), "bg", cms)
    joined = truth.join(est, "bg").select("bg", "true_cnt", "est")
    bad = joined.filter(F.col("est") < F.col("true_cnt")).count()
    assert bad == 0
    max_over = joined.agg(
        F.max(F.col("est") - F.col("true_cnt")).alias("m")
    ).collect()[0]["m"]
    # expectation per cell collision mass is N/W; min over D rows makes
    # 8x that a very generous deterministic ceiling on this corpus
    assert max_over <= max(8 * n // CMS_WIDTH, 8)


def test_cms_merges_cellwise(spark, sf_small):
    """Sketch(big1 ∪ big2) == cellwise-sum of the two sketches — the
    property that makes per-micro-batch / per-partition sketches
    combinable without re-reading data."""
    d = load_table(spark, sf_small, "documents")
    big = d.select("doc_id", F.explode(token_bigrams("text")).alias("bg"))
    left = big.filter(F.col("doc_id") % 2 == 0)
    right = big.filter(F.col("doc_id") % 2 == 1)
    merged = (
        cms_build(left, "bg")
        .unionAll(cms_build(right, "bg"))
        .groupBy("d", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(big, "bg")
    diff = merged.join(whole, ["d", "col"], "full_outer").filter(
        ~merged["cnt"].eqNullSafe(whole["cnt"])
    )
    assert diff.count() == 0
