"""table_changes: row-level change data feed between two lake versions
(Delta CDF / Iceberg incremental-read shape). Inserts and deletes are
tagged per commit; compactions emit nothing; commits without lineage
refuse to be walked."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    compact_chain,
    delete_rows_cow,
    delete_rows_mor,
    delete_rows_pos,
    materialize_mor,
    publish_append,
    publish_versioned,
    table_changes,
    update_rows_cow,
)
from novelti_dingo_spark.sources import load_table


def _orders(spark, sf_small):
    return load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )


def test_append_and_mor_delete_feed(spark, sf_small, tmp_path):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "lake")
    v1 = publish_versioned(o.filter("o_orderkey % 2 = 0"), base)
    v2 = publish_append(o.filter("o_orderkey % 2 = 1"), base)
    v3, _ = delete_rows_mor(spark, base, "o_orderkey", [1, 2, 3])
    feed = table_changes(spark, base, v1, v3)
    assert feed.columns == [
        "o_orderkey", "o_totalprice", "_change_type", "_commit_version",
    ]
    by = {
        (r._change_type, r._commit_version): r.n
        for r in feed.groupBy("_change_type", "_commit_version")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by == {
        ("insert", v2): o.filter("o_orderkey % 2 = 1").count(),
        ("delete", v3): 3,
    }
    # the delete rows are the REAL pre-image rows, values included
    dels = feed.filter("_change_type = 'delete'")
    want = {
        (r.o_orderkey, r.o_totalprice)
        for r in o.filter("o_orderkey IN (1, 2, 3)").collect()
    }
    assert {(r.o_orderkey, r.o_totalprice) for r in dels.collect()} == want


def test_compaction_and_materialization_emit_nothing(
    spark, sf_small, tmp_path
):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "lake")
    publish_versioned(o.filter("o_orderkey % 2 = 0"), base)
    publish_append(o.filter("o_orderkey % 2 = 1"), base)
    v_before = compact_chain(spark, base)
    assert table_changes(spark, base, 2, v_before).count() == 0
    v3, _ = delete_rows_mor(spark, base, "o_orderkey", [2])
    v4 = materialize_mor(spark, base)
    # the window (v_before, v4] crosses the delete AND its
    # materialization: exactly the one deleted row, once
    feed = table_changes(spark, base, v_before, v4)
    rows = feed.collect()
    assert len(rows) == 1
    assert rows[0]._change_type == "delete"
    assert rows[0].o_orderkey == 2
    assert rows[0]._commit_version == v3


def test_pos_delete_and_cow_fall_back_to_diff(spark, sf_small, tmp_path):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "lake")
    v1 = publish_versioned(o, base)
    v2, n_pos = delete_rows_pos(spark, base, "o_totalprice > 250000")
    feed = table_changes(spark, base, v1, v2)
    assert feed.filter("_change_type = 'delete'").count() == n_pos > 0
    assert feed.filter("_change_type = 'insert'").count() == 0
    v3, _, _ = delete_rows_cow(spark, base, "o_orderkey", [8])
    feed2 = table_changes(spark, base, v2, v3)
    rows = feed2.collect()
    assert [(r.o_orderkey, r._change_type) for r in rows] == [
        (8, "delete")
    ]


def test_update_surfaces_as_delete_insert_pair(spark, sf_small, tmp_path):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "lake")
    v1 = publish_versioned(o, base)
    v2, _, _ = update_rows_cow(
        spark, base, "o_orderkey", [8], {"o_totalprice": F.lit(1.5)}
    )
    feed = table_changes(spark, base, v1, v2)
    got = {
        (r._change_type, r.o_orderkey, r.o_totalprice)
        for r in feed.collect()
    }
    old_price = o.filter("o_orderkey = 8").first()["o_totalprice"]
    assert got == {
        ("delete", 8, old_price),
        ("insert", 8, 1.5),
    }


def test_full_publish_wall_refused(spark, sf_small, tmp_path):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "lake")
    v1 = publish_versioned(o.filter("o_orderkey % 2 = 0"), base)
    v2 = publish_versioned(o, base)  # rewrite with no lineage
    with pytest.raises(ValueError, match="no recorded lineage"):
        table_changes(spark, base, v1, v2)


def test_schema_evolution_in_window(spark, sf_small, tmp_path):
    """An additive-evolution append inside the window: its inserts carry
    the new column, pre-evolution deletes surface with NULL for it."""
    o = _orders(spark, sf_small)
    base = str(tmp_path / "lake")
    v1 = publish_versioned(o.filter("o_orderkey % 2 = 0"), base)
    v2 = publish_append(
        o.filter("o_orderkey % 2 = 1").withColumn("flag", F.lit(1)),
        base,
        evolve="additive",
    )
    v3, _ = delete_rows_mor(spark, base, "o_orderkey", [2])  # even: pre-evo
    feed = table_changes(spark, base, v1, v3)
    assert feed.columns[:3] == ["o_orderkey", "o_totalprice", "flag"]
    ins = feed.filter("_change_type = 'insert'")
    assert ins.filter(F.col("flag").isNull()).count() == 0
    dels = feed.filter("_change_type = 'delete'").collect()
    assert len(dels) == 1 and dels[0].flag is None
