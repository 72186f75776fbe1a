"""Data-quality layer tests against the measured testdata invariants
(FIXTURES.md: FK integrity, key uniqueness, n_chars == length(text))."""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark import quality
from novelti_dingo_spark.sources import load_table


def test_key_uniqueness(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    assert quality.duplicate_keys(o, ["o_orderkey"]).count() == 0
    d = load_table(spark, sf_small, "documents")
    assert quality.duplicate_keys(d, ["doc_id"]).count() == 0
    # and the check does fire: unlike real TPC-H, this synthetic lineitem
    # has NO unique (orderkey, linenumber) key — measured 1161 duplicate
    # pairs at sf0.001; the generator assigns linenumbers randomly
    li = load_table(spark, sf_small, "lineitem")
    assert quality.duplicate_keys(li, ["l_orderkey", "l_linenumber"]).count() > 0


def test_fk_integrity(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    o = load_table(spark, sf_small, "orders")
    c = load_table(spark, sf_small, "customer")
    e = load_table(spark, sf_small, "events")
    assert quality.fk_orphans(li, "l_orderkey", o, "o_orderkey").count() == 0
    assert quality.fk_orphans(o, "o_custkey", c, "c_custkey").count() == 0
    assert quality.fk_orphans(e, "user_id", c, "c_custkey").count() == 0


def test_null_rate_and_domains(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    row = quality.null_rate(o, ["o_custkey", "o_totalprice"]).collect()[0]
    assert row.o_custkey_null_rate == 0.0
    assert row.o_totalprice_null_rate == 0.0
    assert (
        quality.domain_violations(o, "o_orderstatus", ["F", "O", "P"]).count() == 0
    )
    assert quality.domain_violations(o, "o_orderstatus", ["F", "O"]).count() > 0


def test_row_invariants(spark, sf_small):
    d = load_table(spark, sf_small, "documents")
    ok = quality.range_violations(d, F.col("n_chars") == F.length("text"))
    assert ok.count() == 0
    bad = quality.range_violations(d, F.col("n_chars") < 0)
    assert bad.count() == d.count()
