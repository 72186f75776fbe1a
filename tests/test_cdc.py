"""CDC apply stream: MERGE semantics per batch, within-batch compaction,
versioned atomic publish, exactly-once across reruns."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from novelti_dingo_spark.pipelines import read_version
from novelti_dingo_spark.streaming.cdc import cdc_apply_stream

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("v", DoubleType()),
        StructField("seq", LongType()),
        StructField("_deleted", BooleanType()),
    ]
)


def _write(df_rows, path):
    pd.DataFrame(
        df_rows, columns=["id", "name", "v", "seq", "_deleted"]
    ).to_parquet(path)


def _target(spark, base):
    return {
        r.id: (r.name, r.v) for r in read_version(spark, str(base))[0].collect()
    }


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "cdc"
    src.mkdir()
    return src, tmp_path / "target", tmp_path / "ckpt"


def test_cdc_apply_end_to_end(spark, dirs):
    src, target, ckpt = dirs
    run = lambda: cdc_apply_stream(  # noqa: E731
        spark, str(src), str(target), str(ckpt), ["id"], SCHEMA
    )

    # batch 1: inserts, including an intra-batch update (seq wins) and an
    # insert-then-delete (tombstone at higher seq -> never lands)
    _write(
        [
            (1, "a", 10.0, 1, False),
            (2, "b0", 0.0, 1, False),
            (2, "b", 20.0, 2, False),
            (3, "c", 30.0, 1, False),
            (9, "ghost", 1.0, 1, False),
            (9, None, 0.0, 2, True),
        ],
        src / "b1.parquet",
    )
    run()
    assert _target(spark, target) == {
        1: ("a", 10.0),
        2: ("b", 20.0),
        3: ("c", 30.0),
    }

    # rerun with nothing new: no new version appears
    v_before = read_version(spark, str(target))[0].collect()
    run()
    from novelti_dingo_spark.sources import lakefs

    versions = [
        n for n in lakefs.listdir(spark, str(target)) if n.startswith("v=")
    ]
    assert len(versions) == 1
    assert read_version(spark, str(target))[0].collect() == v_before

    # batch 2: update 2, delete 3, insert 4
    _write(
        [
            (2, "B", 21.0, 3, False),
            (3, None, 0.0, 2, True),
            (4, "d", 40.0, 1, False),
        ],
        src / "b2.parquet",
    )
    run()
    assert _target(spark, target) == {
        1: ("a", 10.0),
        2: ("B", 21.0),
        4: ("d", 40.0),
    }
    versions = sorted(
        n for n in lakefs.listdir(spark, str(target)) if n.startswith("v=")
    )
    assert versions == ["v=1", "v=2"]
    # version 1 still readable (reproducible-training pin)
    assert {
        r.id for r in read_version(spark, str(target), version=1)[0].collect()
    } == {1, 2, 3}


def test_cdc_replay_guard_survives_interleaved_publish_and_vacuum(
    spark, dirs
):
    """Round-9 advice (shared guard): an out-of-band publish_versioned
    between the stream's publish and a crash-replay must not reset the
    epoch guard (it used to read only LATEST's manifest), and vacuuming
    the version that carried the stream's manifest must not either (the
    _stream_ckpt control file survives)."""
    from novelti_dingo_spark.pipelines import (
        publish_versioned,
        vacuum_versions,
    )
    from novelti_dingo_spark.streaming.cdc import (
        _checkpoint_identity,
        _last_applied_epoch,
    )

    src, target, ckpt = dirs
    _write([(1, "a", 1.0, 1, False)], src / "b1.parquet")
    cdc_apply_stream(spark, str(src), str(target), str(ckpt), ["id"], SCHEMA)
    run_id = _checkpoint_identity(spark, str(ckpt))
    assert _last_applied_epoch(spark, str(target), run_id) == 0

    # out-of-band publish: LATEST's manifest has a foreign identity
    tgt_df, _ = read_version(spark, str(target))
    publish_versioned(tgt_df, str(target), meta={"note": "offline"})
    assert _last_applied_epoch(spark, str(target), run_id) == 0

    # and with the stream's own version vacuumed away, the control file
    # still carries the high-water mark
    publish_versioned(tgt_df, str(target), meta={"note": "offline2"})
    vacuum_versions(spark, str(target), keep_last=1)
    assert _last_applied_epoch(spark, str(target), run_id) == 0

    # end-to-end: force replay of batch 0 and confirm no double-apply
    commit0 = os.path.join(str(ckpt), "commits", "0")
    assert os.path.exists(commit0)
    os.remove(commit0)
    crc0 = os.path.join(os.path.dirname(commit0), ".0.crc")
    if os.path.exists(crc0):  # Hadoop ChecksumFs shadow file
        os.remove(crc0)
    cdc_apply_stream(spark, str(src), str(target), str(ckpt), ["id"], SCHEMA)
    assert _target(spark, target) == {1: ("a", 1.0)}


def test_replay_guard_scan_is_bounded_by_control_file(
    spark, dirs, monkeypatch
):
    """Round-11 advice: the guard used to read EVERY matching manifest
    on every micro-batch — O(versions) JVM reads per batch, O(n²) over
    a stream's lifetime. The control file now records the publish
    version alongside the batch epoch, and the scan skips manifests at
    or below it: with nothing published since the last control write,
    the guard reads ZERO manifests. Crash-window safety holds: a
    manifest NEWER than the recorded version (publish landed, control
    write lost) is still read and honored, and a LEGACY control file
    without the version key falls back to the full scan."""
    import json

    from novelti_dingo_spark.pipelines import publish_versioned
    from novelti_dingo_spark.sources import lakefs
    from novelti_dingo_spark.streaming.cdc import (
        _checkpoint_identity,
        _last_applied_epoch,
    )

    src, target, ckpt = dirs
    for i in range(6):
        _write([(i, "a", float(i), 1, False)], src / f"b{i}.parquet")
        cdc_apply_stream(
            spark, str(src), str(target), str(ckpt), ["id"], SCHEMA
        )
    run_id = _checkpoint_identity(spark, str(ckpt))
    assert _last_applied_epoch(spark, str(target), run_id) == 5

    real_read = lakefs.read_text
    reads: list[str] = []

    def counting_read(s, path):
        reads.append(path)
        return real_read(s, path)

    monkeypatch.setattr(lakefs, "read_text", counting_read)
    assert _last_applied_epoch(spark, str(target), run_id) == 5
    manifest_reads = [p for p in reads if p.endswith("_manifest.json")]
    assert manifest_reads == [], (
        f"guard read {len(manifest_reads)} manifests with an "
        f"up-to-date control file; expected 0: {manifest_reads}"
    )

    # crash window: a publish newer than the control file's version is
    # scanned and its (matching) epoch honored
    tgt_df, _ = read_version(spark, str(target))
    publish_versioned(
        tgt_df, str(target),
        meta={"checkpoint_id": run_id, "batch_id": 11},
    )
    reads.clear()
    assert _last_applied_epoch(spark, str(target), run_id) == 11
    manifest_reads = [p for p in reads if p.endswith("_manifest.json")]
    assert len(manifest_reads) == 1

    # legacy control file (no version key) → full scan still correct
    monkeypatch.undo()
    ctrl = f"{target}/_stream_ckpt/{run_id}.json"
    lakefs.replace_text(spark, ctrl, json.dumps({"batch_id": 5}))
    assert _last_applied_epoch(spark, str(target), run_id) == 11
