"""Source/sink tests (SURVEY.md §2.1): csv/json FAILFAST ingest, partitioned
parquet sink, schema pinning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from novelti_dingo_spark.sources import (
    load_table,
    read_csv,
    read_json,
    register_views,
    write_parquet,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
    ]
)


def test_csv_roundtrip_failfast(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("id,name\n1,alpha\n2,beta\n")
    df = read_csv(spark, p, SCHEMA)
    assert [(r.id, r.name) for r in df.orderBy("id").collect()] == [
        (1, "alpha"),
        (2, "beta"),
    ]


def test_csv_failfast_raises_on_bad_row(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("id,name\nnot_an_int,alpha\n")
    with pytest.raises(Exception):
        read_csv(spark, p, SCHEMA).collect()


def test_json_ingest(spark, tmp_path):
    p = str(tmp_path / "t.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "alpha"}\n{"id": 2, "name": "beta"}\n')
    df = read_json(spark, p, SCHEMA)
    assert df.count() == 2


def test_partitioned_parquet_sink(spark, sf_small, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_small, "orders")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    # partition dirs exist → downstream reads get partition pruning
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    pruned = back.filter(F.col("o_orderstatus") == "F")
    assert "o_orderstatus=F" in pruned._jdf.queryExecution().executedPlan().toString() or pruned.count() > 0


def test_register_views(spark, sf_small):
    views = register_views(spark, sf_small)
    assert set(views) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n == 6000


def test_events_ts_is_timestamp(spark, sf_small):
    e = load_table(spark, sf_small, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"


def test_orc_roundtrip(spark, sf_small, tmp_path):
    from novelti_dingo_spark.sources.io import read_orc, write_orc

    out = str(tmp_path / "nation_orc")
    nation = load_table(spark, sf_small, "nation")
    write_orc(nation, out)
    back = read_orc(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_queries_survive_foreign_session(spark, sf_small):
    """The driver passes its OWN SparkSession (without our session.py
    configs) to queries(); load_table must self-heal the confs it needs
    (ns-parquet read, UTC) on whatever session it is handed."""
    s2 = spark.newSession()
    for conf in (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.session.timeZone",
    ):
        try:
            s2.conf.unset(conf)
        except Exception:
            pass
    e = load_table(s2, sf_small, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    assert e.count() == 1000


def test_json_quarantine_splits_good_and_bad(spark, tmp_path):
    """Lenient ingest: good lines parse typed, malformed lines go to the
    quarantine sink verbatim, nothing aborts."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from novelti_dingo_spark.sources.io import read_json_quarantine

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": "NOT_A_NUMBER", "name": "bad-type"}\n'
        '{"id": 3, "name": "also ok"}\n'
        "{this is not json at all\n"
    )
    qdir = str(tmp_path / "quarantine")
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    good = read_json_quarantine(spark, str(src), schema, quarantine_dir=qdir)
    assert sorted((r.id, r.name) for r in good.collect()) == [
        (1, "ok"),
        (3, "also ok"),
    ]
    bad_lines = {r.value for r in spark.read.text(qdir).collect()}
    assert len(bad_lines) == 2
    assert any("NOT_A_NUMBER" in x for x in bad_lines)
    assert any("not json at all" in x for x in bad_lines)


def test_events_ts_encoding_sniff(spark, tmp_path):
    """load_table must yield identical µs TimestampType values whether the
    file stores ts as timestamp[ns] (older testdata generations, read via
    nanosAsLong + explicit conversion) or timestamp[us] (current)."""
    import pandas as pd

    base = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:07.179575",
                    "2024-01-15 12:30:00.000000",
                    "2024-01-30 23:59:59.500000",
                ]
            ),
            "user_id": [10, 11, 12],
            "event_type": ["click", "view", "purchase"],
            "value": [1.5, 2.5, 3.5],
            "props": ['{"k":1}', '{"k":2}', '{"k":3}'],
        }
    )
    got = {}
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        base.assign(ts=base["ts"].astype(f"datetime64[{unit}]")).to_parquet(
            d / "events.parquet", coerce_timestamps=None
        )
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", unit
        got[unit] = sorted(r.ts for r in df.select("ts").collect())
    assert got["ns"] == got["us"]


def test_binary_file_ingest_feeds_multimodal(spark, tmp_path):
    """Raw asset files -> binaryFile source -> the multimodal decode
    stub: listing-time glob pruning, full-content fidelity, and the
    Arrow-batch plumbing over file content."""
    import os

    from pyspark.sql import functions as F

    from novelti_dingo_spark.sources.io import read_binary_files

    d = tmp_path / "assets"
    os.makedirs(d)
    payloads = {f"img_{i}.fakejpg": bytes([i]) * (100 + i) for i in range(5)}
    for name, data in payloads.items():
        (d / name).write_bytes(data)
    (d / "notes.txt").write_text("not an image")

    df = read_binary_files(spark, str(d), glob="*.fakejpg")
    rows = df.select(
        F.element_at(F.split("path", "/"), -1).alias("name"), "length", "content"
    ).collect()
    assert len(rows) == 5  # .txt pruned at listing time
    for r in rows:
        assert bytes(r["content"]) == payloads[r["name"]]
        assert r["length"] == len(payloads[r["name"]])


def test_parquet_quarantine_detects_corrupt_files(spark, sf_small, tmp_path):
    """A garbage file in the ingest dir must be reported by NAME and
    excluded, while every valid row still loads — loud quarantine, not
    the silent drop of ignoreCorruptFiles."""
    import shutil

    from novelti_dingo_spark import schemas
    from novelti_dingo_spark.sources.io import (
        load_table,
        read_parquet_quarantine,
    )

    src = tmp_path / "ingest"
    src.mkdir()
    orders = load_table(spark, sf_small, "orders").limit(200)
    staged = str(tmp_path / "staged")
    orders.coalesce(2).write.parquet(staged)
    import glob

    for i, f in enumerate(glob.glob(staged + "/part-*.parquet")):
        shutil.copy(f, src / f"good{i}.parquet")
    (src / "evil.parquet").write_bytes(b"not a parquet file at all")

    df, bad = read_parquet_quarantine(
        spark, str(src), schemas.ORDERS
    )
    assert bad == ["evil.parquet"]
    assert df.count() == 200

    # all-corrupt dir: empty frame with the pinned schema, both named
    allbad = tmp_path / "allbad"
    allbad.mkdir()
    (allbad / "x.parquet").write_bytes(b"junk")
    df2, bad2 = read_parquet_quarantine(spark, str(allbad), schemas.ORDERS)
    assert bad2 == ["x.parquet"] and df2.count() == 0
    assert df2.schema == schemas.ORDERS


def test_fixture_tag_tracks_source_content(tmp_path):
    """Fixture cache roots must change when the source dir is
    REGENERATED in place (round-7 advice: /tmp fixtures were keyed on
    bare path existence and served stale bytes after testdata
    regeneration)."""
    import os
    import time

    from novelti_dingo_spark.sources.io import fixture_tag

    d = tmp_path / "sfX"
    d.mkdir()
    (d / "orders.parquet").write_bytes(b"v1-bytes")
    t1 = fixture_tag(str(d))
    assert t1.startswith("sfX-")
    assert fixture_tag(str(d)) == t1  # stable while content unchanged
    # regenerate in place: same path, different content
    time.sleep(0.01)
    (d / "orders.parquet").write_bytes(b"v2-bytes-longer")
    t2 = fixture_tag(str(d))
    assert t2 != t1
    # same size, later mtime still invalidates
    time.sleep(0.01)
    (d / "orders.parquet").write_bytes(b"v3-bytes-longer")
    os.utime(d / "orders.parquet")
    assert fixture_tag(str(d)) != t2
