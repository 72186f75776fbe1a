"""Custom writer commit protocol (sources/ledger_sink.py): committed
files become visible atomically via the manifest; orphans never do."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from novelti_dingo_spark.sources.io import load_table
from novelti_dingo_spark.sources.ledger_sink import (
    read_ledger,
    register_ledger_sink,
)


def test_write_commit_read_roundtrip(spark, sf_small, tmp_path):
    register_ledger_sink(spark)
    path = str(tmp_path / "ledger")
    src = load_table(spark, sf_small, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    src.write.format("ledger").option("path", path).mode("append").save()

    got = read_ledger(spark, path)
    assert got.count() == src.count()
    assert (
        got.agg(F.sum(F.hash("doc_id", "lang", "n_chars"))).head()[0]
        == src.agg(F.sum(F.hash("doc_id", "lang", "n_chars"))).head()[0]
    )
    # manifest row counts reconcile with the data
    manifest = json.load(
        open(os.path.join(path, "manifest-0.json"))
    )
    assert sum(e["rows"] for e in manifest["files"]) == src.count()


def test_orphan_files_invisible(spark, sf_small, tmp_path):
    """A data file on the sink path that no manifest lists (torn write,
    failed task attempt) must not be readable through the ledger."""
    register_ledger_sink(spark)
    path = str(tmp_path / "ledger2")
    src = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    src.write.format("ledger").option("path", path).mode("append").save()
    before = read_ledger(spark, path).count()

    # simulate a torn write: a stray parquet file appears on the path
    src.limit(5).toPandas().to_parquet(os.path.join(path, "data-orphan.parquet"))
    assert read_ledger(spark, path).count() == before


def test_append_creates_new_manifest_version(spark, sf_small, tmp_path):
    register_ledger_sink(spark)
    path = str(tmp_path / "ledger3")
    src = load_table(spark, sf_small, "documents").select("doc_id")
    src.write.format("ledger").option("path", path).mode("append").save()
    src.write.format("ledger").option("path", path).mode("append").save()
    assert read_ledger(spark, path).count() == 2 * src.count()
    versions = sorted(
        f for f in os.listdir(path) if f.startswith("manifest-")
    )
    assert versions == ["manifest-0.json", "manifest-1.json"]
