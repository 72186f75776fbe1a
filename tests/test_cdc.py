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
