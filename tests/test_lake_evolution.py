"""Additive schema evolution on the versioned append chain
(pipelines.publish_append evolve="additive" + manifest-pinned chain
reads):

- an append that adds a column is rejected under the default pinned
  schema and accepted under evolve="additive";
- chain reads NULL-backfill the added column for pre-evolution
  segments, with the schema derived from MANIFESTS (no footer merge);
- type changes and dropped columns are always rejected — appends never
  rewrite;
- snapshot diff, compaction, data-skipping reads, and indexed point
  lookups all survive the evolution boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    build_file_index,
    compact_chain,
    diff_snapshots,
    publish_append,
    publish_versioned,
    read_chain_pruned,
    read_point_lookup_chain,
    read_version_chain,
)
from novelti_dingo_spark.sources.io import load_table


def _evolved_chain(spark, sf_small, tmp_path):
    """Two-schema chain: v1 = even orderkeys (base columns), v2 appends
    odd orderkeys carrying an extra `o_band` column."""
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    old = o.filter(F.col("o_orderkey") % 2 == 0)
    new = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_band",
        F.when(F.col("o_totalprice") >= 150000, F.lit("high")).otherwise(
            F.lit("low")
        ),
    )
    v1 = publish_versioned(
        old.repartitionByRange(4, "o_orderkey"), base,
        stats_cols=["o_orderkey"],
    )
    v2 = publish_append(
        new.repartitionByRange(4, "o_orderkey"), base,
        stats_cols=["o_orderkey"], evolve="additive",
    )
    return base, old, new, v1, v2


def test_append_schema_pinned_by_default(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    publish_versioned(o, base)
    widened = o.withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="evolve='additive'"):
        publish_append(widened, base)


def test_type_change_and_drop_always_rejected(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    publish_versioned(o, base)
    retyped = o.withColumn(
        "o_totalprice", F.col("o_totalprice").cast("float")
    )
    with pytest.raises(ValueError, match="type changed"):
        publish_append(retyped, base, evolve="additive")
    with pytest.raises(ValueError, match="dropped"):
        publish_append(o.drop("o_totalprice"), base, evolve="additive")


def test_chain_read_null_backfills_added_column(
    spark, sf_small, tmp_path
):
    base, old, new, v1, v2 = _evolved_chain(spark, sf_small, tmp_path)
    df, chain = read_version_chain(spark, base)
    assert df.columns == [
        "o_orderkey", "o_custkey", "o_totalprice", "o_band",
    ]
    assert chain[0].get("added_columns") == ["o_band"]
    n_old, n_new = old.count(), new.count()
    assert df.count() == n_old + n_new
    # every pre-evolution row reads NULL, every new row reads a value
    assert df.filter(F.col("o_band").isNull()).count() == n_old
    nulls_even = df.filter(
        (F.col("o_orderkey") % 2 == 0) & F.col("o_band").isNotNull()
    ).count()
    assert nulls_even == 0
    # pinned v1 read keeps the original 3-column schema
    df1, _ = read_version_chain(spark, base, v1)
    assert df1.columns == ["o_orderkey", "o_custkey", "o_totalprice"]


def test_diff_across_evolution_boundary(spark, sf_small, tmp_path):
    base, old, new, v1, v2 = _evolved_chain(spark, sf_small, tmp_path)
    pre, _ = read_version_chain(spark, base, v1)
    post, _ = read_version_chain(spark, base, v2)
    diff = diff_snapshots(pre, post, ["o_orderkey"])
    ops = {r.op for r in diff.collect()}
    # only the appended keys surface, all as inserts — the added column
    # does not mark pre-existing rows updated
    assert ops == {"insert"}
    assert diff.count() == new.count()


def test_pruned_read_and_compact_across_boundary(
    spark, sf_small, tmp_path
):
    base, old, new, v1, v2 = _evolved_chain(spark, sf_small, tmp_path)
    lo, hi = 100, 900
    df, total, read = read_chain_pruned(spark, base, "o_orderkey", lo, hi)
    assert read < total  # skipping engaged across both segments
    expect = (
        old.filter(F.col("o_orderkey").between(lo, hi)).count()
        + new.filter(F.col("o_orderkey").between(lo, hi)).count()
    )
    assert df.count() == expect
    assert "o_band" in df.columns
    # compaction republishes ONE full snapshot with the merged schema
    v3 = compact_chain(
        spark, base, stats_cols=["o_orderkey"], cluster_by="o_orderkey"
    )
    df3, chain3 = read_version_chain(spark, base)
    assert [m["version"] for m in chain3] == [v3]
    assert df3.columns == [
        "o_orderkey", "o_custkey", "o_totalprice", "o_band",
    ]
    assert df3.count() == old.count() + new.count()
    assert df3.filter(F.col("o_band").isNull()).count() == old.count()


def test_point_lookup_across_boundary(spark, sf_small, tmp_path):
    base, old, new, v1, v2 = _evolved_chain(spark, sf_small, tmp_path)
    build_file_index(spark, base, "o_custkey", version=v1)
    build_file_index(spark, base, "o_custkey", version=v2)
    key = old.select("o_custkey").head()[0]
    df, total, read = read_point_lookup_chain(
        spark, base, "o_custkey", key
    )
    expect = (
        old.filter(F.col("o_custkey") == key).count()
        + new.filter(F.col("o_custkey") == key).count()
    )
    assert df.count() == expect
    assert read <= total
    assert "o_band" in df.columns
    # lookup ON the evolved column: pre-evolution segments read NULL and
    # can never match — no index there, conservative scan still correct
    dfe, _, _ = read_point_lookup_chain(spark, base, "o_band", "high")
    assert dfe.count() == new.filter(F.col("o_band") == "high").count()


# --- rename + type-widening evolution --------------------------------------


def _renamed_chain(spark, sf_small, tmp_path, stats=False):
    """v1 = even orderkeys under the old name `o_totalprice`; v2 appends
    odd orderkeys with the column RENAMED to `price_usd`."""
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = str(tmp_path / "rlake")
    old = o.filter(F.col("o_orderkey") % 2 == 0)
    new = o.filter(F.col("o_orderkey") % 2 == 1).withColumnRenamed(
        "o_totalprice", "price_usd"
    )
    kw = {"stats_cols": ["o_orderkey"]} if stats else {}
    publish_versioned(old, base, **kw)
    publish_append(
        new,
        base,
        evolve="additive",
        renames={"price_usd": "o_totalprice"},
        **kw,
    )
    return base, o


def test_undeclared_rename_rejected(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    publish_versioned(o.limit(10), base)
    with pytest.raises(ValueError, match="dropped"):
        publish_append(
            o.limit(5).withColumnRenamed("o_totalprice", "price_usd"),
            base,
            evolve="additive",
        )
    # declared but without evolve="additive": still rejected
    with pytest.raises(ValueError, match="evolve='additive'"):
        publish_append(
            o.limit(5).withColumnRenamed("o_totalprice", "price_usd"),
            base,
            renames={"price_usd": "o_totalprice"},
        )


def test_renamed_chain_reads_old_values_under_new_name(
    spark, sf_small, tmp_path
):
    base, o = _renamed_chain(spark, sf_small, tmp_path)
    got, chain = read_version_chain(spark, base)
    assert set(got.columns) == {"o_orderkey", "o_custkey", "price_usd"}
    # old rows carry their VALUES (a rename is not a drop+add)
    assert got.filter(F.col("price_usd").isNull()).count() == 0
    want = {
        (r.o_orderkey, r.o_totalprice) for r in o.collect()
    }
    assert {
        (r.o_orderkey, r.price_usd) for r in got.collect()
    } == want


def test_chained_renames_compose(spark, sf_small, tmp_path):
    """a -> b at v2, b -> c at v3: v1's column resolves to c."""
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    thirds = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    publish_versioned(thirds[0], base)
    publish_append(
        thirds[1].withColumnRenamed("o_totalprice", "price_b"),
        base,
        evolve="additive",
        renames={"price_b": "o_totalprice"},
    )
    publish_append(
        thirds[2].withColumnRenamed("o_totalprice", "price_c"),
        base,
        evolve="additive",
        renames={"price_c": "price_b"},
    )
    got, _ = read_version_chain(spark, base)
    assert set(got.columns) == {"o_orderkey", "price_c"}
    assert got.filter(F.col("price_c").isNull()).count() == 0
    assert got.count() == o.count()
    want = {(r.o_orderkey, r.o_totalprice) for r in o.collect()}
    assert {(r.o_orderkey, r.price_c) for r in got.collect()} == want


def test_widening_accepted_and_cast_up(spark, tmp_path):
    base = str(tmp_path / "lake")
    a = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.col("id").cast("int").alias("n"),
        F.col("id").cast("float").alias("x"),
    )
    b = spark.range(100, 200).select(
        F.col("id").alias("k"),
        F.col("id").cast("bigint").alias("n"),
        F.col("id").cast("double").alias("x"),
    )
    publish_versioned(a, base)
    publish_append(b, base, evolve="additive")
    got, chain = read_version_chain(spark, base)
    assert chain[0].get("widened_columns") == {
        "n": ["int", "bigint"], "x": ["float", "double"],
    }
    assert dict(got.dtypes)["n"] == "bigint"
    assert dict(got.dtypes)["x"] == "double"
    assert got.count() == 200
    assert got.agg(F.sum("n")).head()[0] == sum(range(200))
    # narrowing stays rejected
    with pytest.raises(ValueError, match="widening"):
        publish_append(
            spark.range(200, 210).select(
                F.col("id").alias("k"),
                F.col("id").cast("int").alias("n"),
                F.col("id").cast("double").alias("x"),
            ),
            base,
            evolve="additive",
        )


def test_pruned_read_uses_old_name_stats_across_rename(
    spark, sf_small, tmp_path
):
    """Data skipping survives the rename: v1's file stats were written
    under o_totalprice's companion key, and the chain read translates
    the pruning column per segment."""
    base, o = _renamed_chain(spark, sf_small, tmp_path, stats=True)
    lo, hi = 10, 200
    got, total, n_read = read_chain_pruned(spark, base, "o_orderkey", lo, hi)
    want = o.filter(F.col("o_orderkey").between(lo, hi))
    assert got.count() == want.count() > 0
    assert set(got.columns) == {"o_orderkey", "o_custkey", "price_usd"}
    assert got.filter(F.col("price_usd").isNull()).count() == 0


def test_renamed_pruning_column_translates(spark, sf_small, tmp_path):
    """Prune ON the renamed column itself: stats for v1 exist under the
    OLD name — the seg-local translation must find them (and the v2
    stats under the new name)."""
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    old = o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(
        4, "o_totalprice"
    )
    new = (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .withColumnRenamed("o_totalprice", "price_usd")
        .repartitionByRange(4, "price_usd")
    )
    publish_versioned(old, base, stats_cols=["o_totalprice"])
    publish_append(
        new,
        base,
        evolve="additive",
        renames={"price_usd": "o_totalprice"},
        stats_cols=["price_usd"],
    )
    got, total, n_read = read_chain_pruned(
        spark, base, "price_usd", 1000.0, 50000.0
    )
    want = o.filter(F.col("o_totalprice").between(1000.0, 50000.0))
    assert got.count() == want.count() > 0
    assert n_read < total, "expected old-name stats to keep pruning"


def test_compact_across_rename_carries_head_names(
    spark, sf_small, tmp_path
):
    base, o = _renamed_chain(spark, sf_small, tmp_path)
    v3 = compact_chain(spark, base)
    got, chain = read_version_chain(spark, base)
    assert [m["version"] for m in chain] == [v3]
    assert set(got.columns) == {"o_orderkey", "o_custkey", "price_usd"}
    assert got.count() == o.count()
    assert got.filter(F.col("price_usd").isNull()).count() == 0


def test_drop_column_evolution(spark, sf_small, tmp_path):
    """Logical drop: declared, manifest-recorded, projected away from
    EVERY segment on read; undeclared stays rejected; re-adding a
    retired name is refused until compaction truncates history."""
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)
    slim = o.filter(F.col("o_orderkey") % 2 == 1).drop("o_custkey")
    with pytest.raises(ValueError, match="drops"):
        publish_append(slim, base, evolve="additive")
    publish_append(slim, base, evolve="additive", drops=["o_custkey"])
    got, chain = read_version_chain(spark, base)
    assert set(got.columns) == {"o_orderkey", "o_totalprice"}
    assert got.count() == o.count()
    assert chain[0]["dropped_columns"] == ["o_custkey"]
    # re-adding the retired name is refused (old data would resurface)
    with pytest.raises(ValueError, match="re-add retired"):
        publish_append(
            o.filter(F.col("o_orderkey") % 7 == 0),
            base,
            evolve="additive",
        )
    # compaction makes the drop physical and frees the name
    compact_chain(spark, base)
    publish_append(
        o.filter(F.col("o_orderkey") % 7 == 3), base, evolve="additive"
    )
    got2, _ = read_version_chain(spark, base)
    assert set(got2.columns) == {"o_orderkey", "o_totalprice", "o_custkey"}
    # pre-re-add rows NULL-backfill the fresh column
    assert got2.filter(F.col("o_custkey").isNull()).count() > 0


def test_drop_after_rename_resolves(spark, sf_small, tmp_path):
    """Rename a->b at v2, drop b at v3: v1's `a` is projected away."""
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = str(tmp_path / "lake")
    thirds = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    publish_versioned(thirds[0], base)
    publish_append(
        thirds[1].withColumnRenamed("o_totalprice", "price_b"),
        base,
        evolve="additive",
        renames={"price_b": "o_totalprice"},
    )
    publish_append(
        thirds[2].drop("o_totalprice"),
        base,
        evolve="additive",
        drops=["price_b"],
    )
    got, _ = read_version_chain(spark, base)
    assert set(got.columns) == {"o_orderkey"}
    assert got.count() == o.count()
