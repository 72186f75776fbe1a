"""Hidden partitioning (Iceberg-style partition transforms): the layout
is hive-partitioned on a DERIVED value (day(ts), bucket(user_id),
truncate(key)) that never appears in the table schema; range reads on
the RAW column prune directories through the manifest's transform spec,
and bucket point lookups route to one directory with no index build."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    delete_rows_mor,
    publish_append,
    publish_versioned,
    read_bucket_lookup,
    read_chain_pruned,
    read_version,
    read_version_chain,
    fast_count,
)
from novelti_dingo_spark.sources import load_table


def _events(spark, sf_small):
    return load_table(spark, sf_small, "events")


def _publish_day_chain(spark, sf_small, base):
    e = _events(spark, sf_small)
    spec = {"source": "ts", "kind": "day"}
    publish_versioned(
        e.filter(F.col("ts") < "2024-01-16"), base, partition_transform=spec
    )
    publish_append(
        e.filter(F.col("ts") >= "2024-01-16"), base, partition_transform=spec
    )
    return e


def test_schema_stays_raw(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    e = _publish_day_chain(spark, sf_small, base)
    df, m = read_version(spark, base, version=1)
    assert df.columns == e.columns  # derived _hp_* column is invisible
    assert "_hp_day_ts" not in m["schema"]
    cdf, _ = read_version_chain(spark, base)
    assert cdf.columns == e.columns
    assert cdf.count() == e.count()
    assert fast_count(spark, base) == e.count()


def test_day_transform_prunes_directories(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    e = _publish_day_chain(spark, sf_small, base)
    lo, hi = "2024-01-10 00:00:00", "2024-01-20 23:59:59"
    df, total, n_read = read_chain_pruned(spark, base, "ts", lo, hi)
    want = e.filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
    assert df.count() == want.count()
    # events span Jan 1-30 => 30 day dirs across the two segments; the
    # 11-day window touches exactly 11 (6 in seg1, 5 in seg2)
    assert total == 30
    assert n_read == 11
    # exact row-level equivalence, not just the count
    got = {tuple(r) for r in df.collect()}
    exp = {tuple(r) for r in want.collect()}
    assert got == exp


def test_empty_window_reads_nothing(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    _publish_day_chain(spark, sf_small, base)
    df, total, n_read = read_chain_pruned(
        spark, base, "ts", "2025-06-01 00:00:00", "2025-06-30 23:59:59"
    )
    assert n_read == 0
    assert df.count() == 0


def test_bucket_lookup_reads_one_of_n(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    e = _events(spark, sf_small)
    publish_versioned(
        e, base,
        partition_transform={"source": "user_id", "kind": "bucket", "n": 8},
    )
    uid = e.select("user_id").first()["user_id"]
    df, total, n_read = read_bucket_lookup(spark, base, "user_id", uid)
    want = e.filter(F.col("user_id") == uid)
    assert df.count() == want.count() > 0
    assert df.columns == e.columns
    # one bucket directory of 8 (each holds >=1 file)
    assert n_read < total


def test_bucket_routing_casts_probe_to_column_type(spark, sf_small, tmp_path):
    """xxhash64 is type-sensitive: hashing the probe as int while the
    column is bigint would route to the wrong bucket and silently lose
    every row. The lookup casts the literal to the SEGMENT's column
    type, so a plain python int probe finds bigint-keyed rows."""
    base = str(tmp_path / "lake")
    e = _events(spark, sf_small)  # user_id is bigint
    publish_versioned(
        e, base,
        partition_transform={"source": "user_id", "kind": "bucket", "n": 8},
    )
    uid = int(e.select("user_id").first()["user_id"])
    df, _, _ = read_bucket_lookup(spark, base, "user_id", uid)
    assert df.count() == e.filter(F.col("user_id") == uid).count() > 0


def test_truncate_transform_numeric_and_mixed_chain(spark, sf_small, tmp_path):
    """A chain whose first segment is FLAT and second is
    truncate-transformed: the pruned read prunes the transform segment
    by directory and reads the flat one conservatively."""
    base = str(tmp_path / "lake")
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    publish_versioned(o.filter("o_orderkey % 2 = 0"), base)
    publish_append(
        o.filter("o_orderkey % 2 = 1"), base,
        partition_transform={
            "source": "o_orderkey", "kind": "truncate", "width": 1000,
        },
    )
    df, total, n_read = read_chain_pruned(spark, base, "o_orderkey", 100, 900)
    want = o.filter("o_orderkey BETWEEN 100 AND 900")
    assert df.count() == want.count() > 0
    assert n_read < total  # the transform segment pruned its far dirs


def test_truncate_transform_string(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    d = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    publish_versioned(
        d, base,
        partition_transform={"source": "lang", "kind": "truncate", "width": 1},
    )
    df, m = read_version(spark, base)
    assert df.columns == ["doc_id", "lang"]
    assert df.count() == d.count()
    assert m["partition_transform"]["col"] == "_hp_truncate_lang"


def test_month_transform_bounds(spark, sf_small, tmp_path):
    base = str(tmp_path / "lake")
    e = _events(spark, sf_small)
    publish_versioned(
        e, base, partition_transform={"source": "ts", "kind": "month"}
    )
    # all of January in one month dir: a mid-month window keeps it
    df, total, n_read = read_chain_pruned(
        spark, base, "ts", "2024-01-10 00:00:00", "2024-01-20 23:59:59"
    )
    assert total == n_read  # single 2024-01 partition, not prunable
    assert (
        df.count()
        == e.filter(
            (F.col("ts") >= "2024-01-10 00:00:00")
            & (F.col("ts") <= "2024-01-20 23:59:59")
        ).count()
    )


def test_mor_delete_over_transform_chain(spark, sf_small, tmp_path):
    """Equality delete vectors compose with hidden partitioning: the
    MOR head resolves the transform chain, subtracts the keys, and the
    schema stays raw."""
    base = str(tmp_path / "lake")
    e = _publish_day_chain(spark, sf_small, base)
    keys = [r.event_id for r in e.limit(5).collect()]
    delete_rows_mor(spark, base, "event_id", keys)
    df, _ = read_version_chain(spark, base)
    assert df.columns == e.columns
    assert df.count() == e.count() - 5
    assert df.filter(F.col("event_id").isin(keys)).count() == 0
    assert fast_count(spark, base) == e.count() - 5


def test_transform_validation(spark, sf_small, tmp_path):
    e = _events(spark, sf_small)
    with pytest.raises(ValueError, match="mutually exclusive"):
        publish_versioned(
            e, str(tmp_path / "a"),
            partition_by=["event_type"],
            partition_transform={"source": "ts", "kind": "day"},
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        publish_versioned(
            e, str(tmp_path / "b"),
            stats_cols=["ts"],
            partition_transform={"source": "ts", "kind": "day"},
        )
    with pytest.raises(ValueError, match="unknown partition transform"):
        publish_versioned(
            e, str(tmp_path / "c"),
            partition_transform={"source": "ts", "kind": "year"},
        )
    with pytest.raises(ValueError, match="string or numeric"):
        publish_versioned(
            e, str(tmp_path / "d"),
            partition_transform={
                "source": "ts", "kind": "truncate", "width": 4,
            },
        )
