"""Custom sink via the Python DataSource writer API: a manifest-committed
parquet "ledger" (SURVEY.md §2 row S6, sink side).

The point is the COMMIT PROTOCOL, the thing a distributed sink must get
right: executor tasks write data files independently and return a
WriterCommitMessage; only the driver's commit() makes them visible, by
writing a manifest that lists exactly the committed files. A reader that
goes through the manifest can never observe a torn write:

  - task failure/retry → the orphaned file exists on disk but is in no
    manifest, so it is invisible (commit messages carry only files from
    SUCCESSFUL task attempts);
  - job failure before commit() → no manifest entry, nothing visible;
  - abort() removes the staged files best-effort, but correctness never
    depends on that cleanup happening.

This mirrors what Spark's own FileOutputCommitter/table formats do; at
100 TB the same shape holds — the manifest write is O(#files) driver
work, data volume never passes through the driver.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class LedgerCommitMessage(WriterCommitMessage):
    file: str
    rows: int


class LedgerWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        """Runs on an executor: drain this partition to one parquet file."""
        import pandas as pd

        rows = list(iterator)
        fname = os.path.join(self.path, f"data-{uuid.uuid4().hex}.parquet")
        if rows:
            os.makedirs(self.path, exist_ok=True)
            pd.DataFrame([r.asDict() for r in rows]).to_parquet(fname)
            return LedgerCommitMessage(file=fname, rows=len(rows))
        return LedgerCommitMessage(file="", rows=0)

    def commit(self, messages):
        """Driver-side: publish exactly the files the successful task
        attempts reported. Manifest versions are monotonically numbered;
        readers take the highest — the atomic-visibility point."""
        os.makedirs(self.path, exist_ok=True)
        existing = [
            f for f in os.listdir(self.path)
            if f.startswith("manifest-") and f.endswith(".json")
        ]
        version = (
            max((int(f.split("-")[1].split(".")[0]) for f in existing), default=-1)
            + 1
        )
        prior: list[dict] = []
        if existing:
            latest = max(existing, key=lambda f: int(f.split("-")[1].split(".")[0]))
            with open(os.path.join(self.path, latest)) as fh:
                prior = json.load(fh)["files"]
        files = prior + [
            {"file": m.file, "rows": m.rows} for m in messages if m.rows
        ]
        tmp = os.path.join(self.path, f".manifest-{version}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": files}, fh)
        os.rename(tmp, os.path.join(self.path, f"manifest-{version}.json"))

    def abort(self, messages):
        for m in messages:
            if m is not None and m.rows:
                try:
                    os.remove(m.file)
                except OSError:
                    pass


class LedgerSink(DataSource):
    """`df.write.format("ledger").option("path", p).mode("append").save()`"""

    @classmethod
    def name(cls) -> str:
        return "ledger"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return LedgerWriter(self.options)


def register_ledger_sink(spark) -> None:
    spark.dataSource.register(LedgerSink)


def read_ledger(spark, path: str):
    """Read ONLY manifest-listed files — uncommitted/orphan files on the
    same path are invisible, which is the sink's whole guarantee."""
    manifests = [
        f for f in os.listdir(path)
        if f.startswith("manifest-") and f.endswith(".json")
    ]
    if not manifests:
        raise FileNotFoundError(f"no committed ledger manifest under {path}")
    latest = max(manifests, key=lambda f: int(f.split("-")[1].split(".")[0]))
    with open(os.path.join(path, latest)) as fh:
        files = [e["file"] for e in json.load(fh)["files"]]
    return spark.read.parquet(*files)
