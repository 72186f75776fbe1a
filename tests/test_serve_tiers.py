"""Tiered serving (plans/serve.py): cache → fresh MV → fact, every
tier computing identical answers from pinned versions; a stale MV
(freshness token behind the fact's LATEST) is never served; a refresh
with the new token restores the MV tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    publish_append,
    publish_versioned,
    read_version_chain,
)
from novelti_dingo_spark.plans.mv import MvSpec, publish_mv, refresh_mv
from novelti_dingo_spark.plans.serve import serve_agg
from novelti_dingo_spark.sources import load_table

GK = ["o_orderpriority"]
MEASURES = {"n_orders": "n_orders", "total_price": "total_price"}


def _fact_builder(base):
    def build(spark, version):
        df, _ = read_version_chain(spark, base, version)
        return df.groupBy(*GK).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )

    return build


def _rows(df):
    return {
        (r.o_orderpriority, r.n_orders, round(r.total_price, 2))
        for r in df.collect()
    }


def test_tier_ladder_and_staleness(spark, sf_small, tmp_path):
    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    cache = str(tmp_path / "cache")
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    a, b = o.filter("o_orderkey % 2 = 0"), o.filter("o_orderkey % 2 = 1")
    fv = publish_versioned(a, fact)
    spec = MvSpec(
        tuple(GK),
        {"n_orders": ("count", None), "total_price": ("sum", "o_totalprice")},
    )
    publish_mv(a, mv, spec, fact_version=fv)

    kw = dict(
        cache_dir=cache, name="prio", fact_base=fact, mv_candidates=[mv],
        group_keys=GK, measures=MEASURES, fact_builder=_fact_builder(fact),
    )
    df1, tier1 = serve_agg(spark, **kw)
    assert tier1 == "mv"  # fresh MV answers the first request
    want = _rows(_fact_builder(fact)(spark, fv))
    assert _rows(df1) == want

    df2, tier2 = serve_agg(spark, **kw)
    assert tier2 == "cache" and _rows(df2) == want

    # fact moves: the MV's token lags -> fact tier, never stale MV
    fv2 = publish_append(b, fact)
    df3, tier3 = serve_agg(spark, **kw)
    assert tier3 == "fact"
    want2 = _rows(_fact_builder(fact)(spark, fv2))
    assert _rows(df3) == want2 and want2 != want

    # incremental refresh with the new token restores the MV tier
    refresh_mv(spark, mv, b, fact_version=fv2)
    df4, tier4 = serve_agg(spark, **kw)
    assert tier4 in ("mv", "cache")  # cache key includes the new mv input
    assert _rows(df4) == want2
    # and once cached, it stays a hit
    df5, tier5 = serve_agg(spark, **kw)
    assert tier5 == "cache" and _rows(df5) == want2


def test_predicate_served_from_mv(spark, sf_small, tmp_path):
    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    cache = str(tmp_path / "cache")
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    fv = publish_versioned(o, fact)
    spec = MvSpec(
        tuple(GK),
        {"n_orders": ("count", None), "total_price": ("sum", "o_totalprice")},
    )
    publish_mv(o, mv, spec, fact_version=fv)

    def fact_filtered(spark_, version):
        df, _ = read_version_chain(spark_, fact, version)
        return (
            df.filter(F.col("o_orderpriority") != "5-LOW")
            .groupBy(*GK)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_totalprice").alias("total_price"),
            )
        )

    df, tier = serve_agg(
        spark,
        cache_dir=cache,
        name="prio_no_low",
        fact_base=fact,
        mv_candidates=[mv],
        group_keys=GK,
        measures=MEASURES,
        predicate=F.col("o_orderpriority") != "5-LOW",
        predicate_cols=["o_orderpriority"],
        fact_builder=fact_filtered,
    )
    assert tier == "mv"
    assert _rows(df) == _rows(fact_filtered(spark, fv))
