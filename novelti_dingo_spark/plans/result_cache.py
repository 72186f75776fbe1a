"""Query-result cache keyed by lake input versions — the Snowflake
result-reuse shape: a named query's materialized result is valid
exactly as long as none of its input datasets has published a new
version. The key is (query name, {input: pinned version}), so
invalidation is automatic and free — a version bump changes the key;
nothing is ever checked against file mtimes or data hashes.

Correctness contract: the build callback receives the PINNED versions
and must read them (read_version / read_version_chain with an explicit
version), not LATEST — so a concurrent publish mid-build cannot make
the cached bytes disagree with their own key. Commit protocol: result
files first, `_manifest.json` last — an entry without a manifest is an
interrupted write and reads as a miss (same convention as the ledger
sink / versioned publishes).

At 100 TB this is the cheap layer ABOVE the materialized views
(plans/mv.py): an MV is maintained (incremental refresh, rewrite
containment); a cached result is immutable and disposable — right for
dashboard-style repeated queries between publishes, where recompute
cost is paid at most once per (query, table-version) combination.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _latest_version(base_dir: str) -> int:
    with open(os.path.join(base_dir.rstrip("/"), "LATEST")) as f:
        return int(f.read().strip())


def _entry_key(name: str, versions: dict[str, int]) -> str:
    blob = json.dumps({"name": name, "inputs": versions}, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def cached_result(
    spark: SparkSession,
    cache_dir: str,
    name: str,
    inputs: dict[str, str],
    build_fn: Callable[[SparkSession, dict[str, int]], DataFrame],
) -> tuple[DataFrame, bool]:
    """Return (result DataFrame, was_hit). `inputs` maps a logical
    input name to its lake base dir; `build_fn(spark, pinned)` gets
    {input_name: version} and must compute from those pinned versions."""
    pinned = {k: _latest_version(v) for k, v in inputs.items()}
    key = _entry_key(name, pinned)
    entry = os.path.join(cache_dir.rstrip("/"), name, key)
    data = os.path.join(entry, "data")
    manifest_path = os.path.join(entry, "_manifest.json")
    if os.path.exists(manifest_path):
        return spark.read.parquet(data), True
    df = build_fn(spark, pinned)
    df.write.mode("overwrite").parquet(data)
    with open(manifest_path, "w") as f:
        json.dump(
            {"name": name, "inputs": pinned, "key": key,
             "rows": spark.read.parquet(data).count()},
            f,
        )
    return spark.read.parquet(data), False


def vacuum_result_cache(
    cache_dir: str, keep_latest_per_name: int = 1
) -> list[str]:
    """Reclaim superseded entries: for each query name, keep the
    `keep_latest_per_name` most recently COMMITTED entries (manifest
    mtime) and delete the rest — plus any uncommitted (interrupted)
    entry. Returns removed entry paths."""
    import shutil

    removed: list[str] = []
    root = cache_dir.rstrip("/")
    if not os.path.isdir(root):
        return removed
    for qname in sorted(os.listdir(root)):
        qdir = os.path.join(root, qname)
        if not os.path.isdir(qdir):
            continue
        entries = []
        for key in os.listdir(qdir):
            edir = os.path.join(qdir, key)
            mpath = os.path.join(edir, "_manifest.json")
            if os.path.exists(mpath):
                entries.append((os.path.getmtime(mpath), edir))
            else:
                shutil.rmtree(edir)  # interrupted write: always reclaim
                removed.append(edir)
        entries.sort(reverse=True)
        for _, edir in entries[keep_latest_per_name:]:
            shutil.rmtree(edir)
            removed.append(edir)
    return removed
