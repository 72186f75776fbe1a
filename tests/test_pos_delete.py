"""Positional deletion vectors (pipelines.delete_rows_pos /
dedup_rows_pos): the Iceberg position-delete shape beside the
equality vectors — a commit records (file, row-ordinal) addresses,
touches no data file, and readers subtract them with broadcast anti
joins. The distinguishing capability pinned here: deleting ONE of two
physically identical rows, which no equality vector can express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    build_file_index,
    dedup_rows_pos,
    delete_rows_mor,
    delete_rows_pos,
    materialize_mor,
    publish_append,
    publish_versioned,
    read_as_of,
    read_version,
    read_version_pruned,
    table_history,
    vacuum_versions,
)
from novelti_dingo_spark.sources import lakefs, load_table


def _orders(spark, sf_small):
    return load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


def test_predicate_delete_and_read(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    o = _orders(spark, sf_small)
    publish_versioned(o.repartition(4), base)
    doomed = o.filter("o_totalprice > 200000")
    v, n = delete_rows_pos(spark, base, "o_totalprice > 200000")
    assert v == 2 and n == doomed.count() > 0
    df, m = read_version(spark, base)
    assert df.filter("o_totalprice > 200000").count() == 0
    assert df.count() == o.count() - n
    assert m["rows"] == o.count() - n
    # the commit wrote only the vector — no data file in the version dir
    names = lakefs.listdir(spark, f"{base}/v=2")
    assert not [x for x in names if x.endswith(".parquet")]
    # address columns never leak to readers
    assert "_mor_file" not in df.columns and "_mor_pos" not in df.columns


def test_dedup_deletes_one_of_two_identical_rows(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    o = _orders(spark, sf_small)
    dup = o.orderBy("o_orderkey").limit(7)
    publish_versioned(o.union(dup).repartition(3), base)
    v, n = dedup_rows_pos(spark, base, ["o_orderkey"])
    assert n == 7
    df, _ = read_version(spark, base)
    # exactly one survivor per key — the equality-vector-impossible case
    assert df.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    assert df.count() == o.count()
    # survivors keep the full row payload
    assert (
        df.join(o, "o_orderkey").filter(
            df["o_totalprice"] != o["o_totalprice"]
        ).count()
        == 0
    )


def test_stacks_with_equality_vectors_and_materializes(
    spark, sf_small, tmp_path
):
    base = str(tmp_path / "lake")
    o = _orders(spark, sf_small)
    keys = [r.o_orderkey for r in o.orderBy("o_orderkey").limit(4).collect()]
    publish_versioned(o.repartition(4), base)
    delete_rows_pos(spark, base, "o_totalprice > 250000")
    delete_rows_mor(spark, base, "o_orderkey", keys)
    v, n = delete_rows_pos(spark, base, "o_orderpriority = '1-URGENT'")
    expected = o.filter(
        ~(F.col("o_totalprice") > 250000)
        & ~F.col("o_orderkey").isin(keys)
        & (F.col("o_orderpriority") != "1-URGENT")
    )
    df, _ = read_version(spark, base)
    assert df.count() == expected.count()
    # third layer only counted rows still alive after the first two
    assert n == o.filter(
        ~(F.col("o_totalprice") > 250000)
        & ~F.col("o_orderkey").isin(keys)
        & (F.col("o_orderpriority") == "1-URGENT")
    ).count()
    mv = materialize_mor(spark, base)
    df2, m2 = read_version(spark, base)
    assert df2.count() == expected.count()
    assert sorted(m2["compacted_from"]) == [1, 2, 3, 4]
    kinds = {
        r["version"]: r["kind"]
        for r in table_history(spark, base).collect()
    }
    assert kinds[2] == "pos_delete" and kinds[3] == "mor_delete"
    assert kinds[mv] == "compaction"


def test_time_travel_and_vacuum_protection(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    o = _orders(spark, sf_small)
    publish_versioned(o.repartition(2), base)
    _, m1 = read_version(spark, base)
    v, n = delete_rows_pos(spark, base, "o_totalprice > 150000")
    # pre-delete timestamp resolves to the parent (rows still present)
    df_before, _ = read_as_of(spark, base, m1["published_ts"])
    assert df_before.count() == o.count()
    # vacuum keeps the data ancestor alive: the vector needs its files
    deleted = vacuum_versions(spark, base, keep_last=1)
    assert 1 not in deleted
    df, _ = read_version(spark, base)
    assert df.count() == o.count() - n


def test_pruned_read_applies_vector(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    o = _orders(spark, sf_small)
    publish_versioned(
        o.repartitionByRange(4, "o_orderkey"),
        base,
        stats_cols=["o_orderkey"],
    )
    keys = [r.o_orderkey for r in o.orderBy("o_orderkey").limit(3).collect()]
    delete_rows_pos(
        spark, base, f"o_orderkey IN ({','.join(map(str, keys))})"
    )
    lo, hi = min(keys), max(keys) + 10
    df, total, n_read = read_version_pruned(
        spark, base, "o_orderkey", lo, hi
    )
    assert n_read < total  # carried file_stats still skip
    assert df.filter(F.col("o_orderkey").isin(keys)).count() == 0


def test_cow_over_mor_folds_stack(spark, sf_small, tmp_path):
    """delete/update_rows_cow on a merge-on-read head: the vector stack
    is folded and the mutation applied in ONE fused rewrite commit,
    compaction-marked so the streaming source never re-floods."""
    from novelti_dingo_spark.pipelines import delete_rows_cow, update_rows_cow

    base = str(tmp_path / "lake")
    o = _orders(spark, sf_small)
    publish_versioned(o.repartition(3), base)
    delete_rows_pos(spark, base, "o_totalprice > 250000")
    keys = [r.o_orderkey for r in o.orderBy("o_orderkey").limit(3).collect()]
    delete_rows_mor(spark, base, "o_orderkey", keys)
    doomed = [
        r.o_orderkey
        for r in o.orderBy(F.desc("o_orderkey")).limit(2).collect()
    ]
    v, n_rw, n_cp = delete_rows_cow(spark, base, "o_orderkey", doomed)
    df, m = read_version(spark, base)
    expected = o.filter(
        ~(F.col("o_totalprice") > 250000)
        & ~F.col("o_orderkey").isin(keys + doomed)
    )
    assert df.count() == expected.count()
    assert n_cp == 0 and "pos_delete" not in m and "mor_delete" not in m
    assert m["deleted"]["folded_mor"] and sorted(m["compacted_from"]) == [
        1, 2, 3,
    ]
    # the fused commit resolved every layer: no vector dirs ride along
    names = lakefs.listdir(spark, f"{base}/v={v}")
    assert "_deletes" not in names and "_pos_deletes" not in names
    # update over a fresh vector stack folds the same way
    delete_rows_pos(spark, base, "o_totalprice > 200000")
    uv, _, u_cp = update_rows_cow(
        spark, base, "o_orderpriority", ["1-URGENT"],
        {"o_totalprice": F.lit(0.0)},
    )
    df2, m2 = read_version(spark, base)
    assert u_cp == 0 and m2["updated"]["folded_mor"]
    assert df2.filter("o_totalprice > 200000").count() == 0
    assert (
        df2.filter("o_orderpriority = '1-URGENT' AND o_totalprice != 0")
        .count()
        == 0
    )


def test_refusals(spark, sf_small, tmp_path):
    base = str(tmp_path / "chain")
    o = _orders(spark, sf_small)
    publish_versioned(o.filter("o_orderkey % 2 = 0"), base)
    publish_append(o.filter("o_orderkey % 2 = 1"), base)
    with pytest.raises(ValueError, match="flat full snapshot"):
        delete_rows_pos(spark, base, "o_totalprice > 0")
    base2 = str(tmp_path / "flat")
    publish_versioned(o, base2)
    with pytest.raises(ValueError, match="zero rows"):
        delete_rows_pos(spark, base2, "o_totalprice < 0")
    delete_rows_pos(spark, base2, "o_orderkey = 1")
    # appends and file indexes refuse a positional head like an eq head
    with pytest.raises(ValueError, match="merge-on-read"):
        publish_append(o, base2)
    with pytest.raises(ValueError, match="merge-on-read"):
        build_file_index(spark, base2, "o_orderkey")
