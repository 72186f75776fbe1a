"""Clean-room Delta transaction-log reader/writer (public protocol):
spec-shaped commits, add/remove reconciliation, time travel, overwrite
semantics, log-level partition pruning, and loud failures on protocol
features beyond the reader."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.sources import load_table
from novelti_dingo_spark.sources.delta_log import (
    DeltaLogError,
    UnsupportedDeltaFeature,
    delta_table_version,
    read_delta_table,
    write_delta_table,
)


def test_delta_roundtrip_and_log_shape(spark, sf_small, tmp_path):
    base = str(tmp_path / "t")
    s = load_table(spark, sf_small, "supplier")
    v = write_delta_table(s, base)
    assert v == 0 and delta_table_version(base) == 0

    # value-exact roundtrip, every column every row
    back = read_delta_table(spark, base)
    assert back.schema == s.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, s.collect()))

    # the commit file is spec-shaped newline-delimited JSON actions
    log0 = os.path.join(base, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(x) for x in open(log0) if x.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert kinds[-1] == "commitInfo"
    proto = actions[0]["protocol"]
    assert proto["minReaderVersion"] == 1
    meta = actions[1]["metaData"]
    assert meta["format"]["provider"] == "parquet"
    assert meta["partitionColumns"] == []
    # schemaString parses back to the exact Spark schema
    from pyspark.sql.types import StructType

    assert StructType.fromJson(json.loads(meta["schemaString"])) == s.schema
    adds = [a["add"] for a in actions if "add" in a]
    assert adds
    for a in adds:
        assert not a["path"].startswith("/")  # relative, spec §Add
        assert a["size"] == os.path.getsize(os.path.join(base, a["path"]))
        assert a["dataChange"] is True
        assert a["partitionValues"] == {}


def test_delta_append_overwrite_and_time_travel(spark, sf_small, tmp_path):
    base = str(tmp_path / "t")
    s = load_table(spark, sf_small, "supplier")
    even = s.filter(F.col("s_suppkey") % 2 == 0)
    odd = s.filter(F.col("s_suppkey") % 2 == 1)
    assert write_delta_table(even, base) == 0
    assert write_delta_table(odd, base, mode="append") == 1
    assert read_delta_table(spark, base).count() == s.count()
    # time travel to v0: only the first commit's files
    assert read_delta_table(spark, base, version=0).count() == even.count()

    # overwrite supplants everything: removes for every prior file
    small = s.limit(3)
    assert write_delta_table(small, base, mode="overwrite") == 2
    assert read_delta_table(spark, base).count() == 3
    log2 = os.path.join(base, "_delta_log", f"{2:020d}.json")
    actions = [json.loads(x) for x in open(log2) if x.strip()]
    removed = {a["remove"]["path"] for a in actions if "remove" in a}
    prior_adds = set()
    for v in (0, 1):
        logv = os.path.join(base, "_delta_log", f"{v:020d}.json")
        prior_adds |= {
            a["add"]["path"]
            for a in (json.loads(x) for x in open(logv) if x.strip())
            if "add" in a
        }
    assert removed == prior_adds
    # pre-overwrite versions stay readable (pinned snapshots)
    assert read_delta_table(spark, base, version=1).count() == s.count()
    assert read_delta_table(spark, base, version=0).count() == even.count()

    with pytest.raises(ValueError):
        write_delta_table(s, base, mode="errorifexists")
    with pytest.raises(DeltaLogError):
        read_delta_table(spark, base, version=99)


def test_delta_partitioned_write_read_and_pruning(spark, sf_small, tmp_path):
    base = str(tmp_path / "t")
    s = load_table(spark, sf_small, "supplier")
    write_delta_table(s, base, partition_by=["s_nationkey"])

    log0 = os.path.join(base, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(x) for x in open(log0) if x.strip()]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["partitionColumns"] == ["s_nationkey"]
    adds = [a["add"] for a in actions if "add" in a]
    # spec: partitionValues are STRINGS, and the value also appears in
    # the hive-style path our writer lays out
    for a in adds:
        pv = a["partitionValues"]["s_nationkey"]
        assert isinstance(pv, str) and f"s_nationkey={pv}/" in a["path"]
    # the partition column is NOT in the data files themselves
    one = os.path.join(base, adds[0]["path"])
    import pyarrow.parquet as pq

    assert "s_nationkey" not in pq.read_schema(one).names

    # full read re-injects the typed column and matches the source
    back = read_delta_table(spark, base)
    assert dict(back.dtypes)["s_nationkey"] == dict(s.dtypes)["s_nationkey"]
    assert sorted(map(tuple, back.select(*s.columns).collect())) == sorted(
        map(tuple, s.collect())
    )

    # partition_filter prunes the FILE LIST before the scan
    pruned = read_delta_table(
        spark, base, partition_filter={"s_nationkey": 3}
    )
    want = s.filter(F.col("s_nationkey") == 3)
    assert sorted(map(tuple, pruned.select(*s.columns).collect())) == sorted(
        map(tuple, want.collect())
    )
    keep = {
        os.path.join(base, a["path"])
        for a in adds
        if a["partitionValues"]["s_nationkey"] == "3"
    }
    assert {f.replace("file://", "") for f in pruned.inputFiles()} == keep

    with pytest.raises(ValueError):
        read_delta_table(spark, base, partition_filter={"s_comment": "x"})


def test_delta_reader_fails_loud_not_wrong(spark, sf_small, tmp_path):
    base = str(tmp_path / "t")
    s = load_table(spark, sf_small, "supplier").limit(5)
    write_delta_table(s, base)

    # unknown action types in a foreign commit are ignored (forward
    # compatibility the spec requires) — reads still work
    write_delta_table(s, base, mode="append")
    log1 = os.path.join(base, "_delta_log", f"{1:020d}.json")
    with open(log1, "a") as f:
        f.write(json.dumps({"txn": {"appId": "x", "version": 1}}) + "\n")
        f.write(json.dumps({"someFutureAction": {"k": 1}}) + "\n")
    assert read_delta_table(spark, base).count() == 10

    # protocol v3 (deletion vectors / column mapping): loud refusal
    base2 = str(tmp_path / "v3")
    write_delta_table(s, base2)
    log0 = os.path.join(base2, "_delta_log", f"{0:020d}.json")
    lines = open(log0).read().splitlines()
    lines[0] = json.dumps(
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}
    )
    open(log0, "w").write("\n".join(lines) + "\n")
    with pytest.raises(UnsupportedDeltaFeature):
        read_delta_table(spark, base2)

    # checkpoint-only history (early JSON vacuumed): loud refusal
    base3 = str(tmp_path / "vac")
    write_delta_table(s, base3)
    write_delta_table(s, base3, mode="append")
    os.remove(os.path.join(base3, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(DeltaLogError):
        read_delta_table(spark, base3)

    # not a delta table at all
    with pytest.raises(DeltaLogError):
        read_delta_table(spark, str(tmp_path / "nope"))


def test_delta_checkpoint_replay_after_log_cleanup(spark, sf_small, tmp_path):
    """Spec checkpoints: after write_delta_checkpoint, deleting the
    early JSON commits (log-retention cleanup) leaves the table fully
    readable — state seeds from the checkpoint parquet, later JSON
    commits replay on top, and partition semantics survive the
    roundtrip. Time travel below the oldest reachable state stays a
    loud error."""
    from novelti_dingo_spark.sources.delta_log import (
        delta_table_version,
        write_delta_checkpoint,
    )

    base = str(tmp_path / "t")
    s = load_table(spark, sf_small, "supplier")
    even = s.filter(F.col("s_suppkey") % 2 == 0)
    odd = s.filter(F.col("s_suppkey") % 2 == 1)
    write_delta_table(even, base, partition_by=["s_nationkey"])
    write_delta_table(odd, base, mode="append", partition_by=["s_nationkey"])
    assert write_delta_checkpoint(base) == 1
    assert os.path.exists(
        os.path.join(base, "_delta_log", "_last_checkpoint")
    )

    # retention cleanup: the JSON history disappears
    for v in (0, 1):
        os.remove(os.path.join(base, "_delta_log", f"{v:020d}.json"))

    assert delta_table_version(base) == 1
    back = read_delta_table(spark, base)
    assert sorted(map(tuple, back.select(*s.columns).collect())) == sorted(
        map(tuple, s.collect())
    )
    # a later JSON commit replays on top of the checkpoint seed
    write_delta_table(
        s.limit(4), base, mode="overwrite", partition_by=["s_nationkey"]
    )
    assert read_delta_table(spark, base).count() == 4
    # pruning still works from checkpoint-seeded partitionValues
    pruned = read_delta_table(
        spark, base, version=1, partition_filter={"s_nationkey": 3}
    )
    want = s.filter(F.col("s_nationkey") == 3)
    assert sorted(map(tuple, pruned.select(*s.columns).collect())) == sorted(
        map(tuple, want.collect())
    )
    # v0's JSON is gone and no checkpoint covers it → loud error
    with pytest.raises(DeltaLogError):
        read_delta_table(spark, base, version=0)


def test_export_versioned_lake_version_for_version(spark, sf_small, tmp_path):
    """The repo's own lake exports to Delta one commit per lake
    version, idempotently: re-export skips the already-committed
    prefix, new lake versions land as new Delta commits, and every
    exported snapshot is value-exact vs its lake source."""
    from novelti_dingo_spark.pipelines import publish_versioned, read_version
    from novelti_dingo_spark.sources.delta_log import (
        delta_table_version,
        export_versioned_lake_to_delta,
    )

    lake = str(tmp_path / "lake")
    delta = str(tmp_path / "delta")
    s = load_table(spark, sf_small, "supplier")
    publish_versioned(s.filter(F.col("s_suppkey") % 2 == 0), lake)
    publish_versioned(s, lake)
    mapping = export_versioned_lake_to_delta(spark, lake, delta)
    assert mapping == {1: 0, 2: 1}
    for lv, dv in mapping.items():
        want, _ = read_version(spark, lake, lv)
        got = read_delta_table(spark, delta, version=dv)
        assert sorted(map(tuple, got.select(*want.columns).collect())) == (
            sorted(map(tuple, want.collect()))
        )
    # idempotent: nothing re-exports
    assert export_versioned_lake_to_delta(spark, lake, delta) == mapping
    assert delta_table_version(delta) == 1
    # incremental: a third lake version lands as delta version 2
    publish_versioned(s.limit(3), lake)
    m3 = export_versioned_lake_to_delta(spark, lake, delta)
    assert m3 == {1: 0, 2: 1, 3: 2}
    assert read_delta_table(spark, delta).count() == 3
