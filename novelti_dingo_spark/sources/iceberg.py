"""Clean-room Apache Iceberg table reader/writer (public table spec:
https://iceberg.apache.org/spec/).

Round-12, the second open-table-format leg beside sources/delta_log.py:
no iceberg-spark jars exist in this container, but the Iceberg format is
a PUBLIC spec of plain files — `metadata/v<N>.metadata.json` (schemas,
partition specs, snapshot list), a per-snapshot *manifest list* (Avro),
per-manifest *manifest files* (Avro) whose entries carry the data-file
paths, and ordinary parquet data files. The repo's clean-room Avro codec
(avro_py — now with nested record/array/map support) decodes the
metadata layer, so the whole chain resolves without any Iceberg library:

    version-hint.text → vN.metadata.json → snapshot → manifest-list.avro
      → manifest.avro entries (status ∈ EXISTING/ADDED/DELETED)
      → live parquet files → one pruned multi-file scan

Key spec semantics this module implements:
- A snapshot's state is the union of live entries (status != DELETED)
  across every manifest its manifest list references — append commits
  reference the prior manifests plus one new one; overwrite commits
  reference only the new manifest (prior files simply drop out of the
  new snapshot while remaining readable at old snapshot ids).
- Unlike Delta/Hive layouts, Iceberg data files CONTAIN their partition
  columns; the per-file `partition` record in the manifest exists for
  pruning, not for value reconstruction — so `partition_filter` prunes
  the FILE LIST driver-side (identity transforms), and the scan needs
  no value injection.
- Time travel = resolving a non-current snapshot-id from the metadata's
  snapshot list (every snapshot keeps its own manifest list).

Row-level deletes (round-12, second pass): v2 POSITION deletes are
implemented in both directions — `delete_rows_from_iceberg_table`
commits a position-delete parquet (file_path, pos) under a content=1
manifest, and reads apply every delete file with one distributed LEFT
ANTI join keyed on (data-file identity, `_metadata.row_index`) — the
ordinal Spark's parquet reader exposes is exactly the spec's `pos`.
Loud refusals instead of wrong answers: format-version > 2, EQUALITY
delete files (content=2), non-parquet data files, non-identity
transforms in a partition_filter, ambiguous data-file basenames under
position deletes, and schema types beyond the supported set all raise
typed errors.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .avro_py import read_avro_records, write_avro_records

_STATUS_DELETED = 2


class UnsupportedIcebergFeature(Exception):
    """The table uses spec features beyond this reader (row-level
    deletes, format v3, non-identity transforms where they matter)."""


class IcebergError(Exception):
    """Structurally broken table metadata."""


# ----------------------------------------------------- schema conversion

_PRIM_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
}
_SPARK_TO_PRIM = {
    "boolean": "boolean",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp": "timestamp",
    "string": "string",
    "binary": "binary",
}


def _iceberg_type_to_spark(t) -> T.DataType:
    if isinstance(t, str):
        m = re.fullmatch(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if t in _PRIM_TO_SPARK:
            return _PRIM_TO_SPARK[t]
        raise UnsupportedIcebergFeature(f"iceberg type {t!r}")
    if isinstance(t, dict) and t.get("type") == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _iceberg_type_to_spark(f["type"]),
                    not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    if isinstance(t, dict) and t.get("type") == "list":
        return T.ArrayType(
            _iceberg_type_to_spark(t["element"]),
            not t.get("element-required", False),
        )
    raise UnsupportedIcebergFeature(f"iceberg type {t!r}")


def _spark_type_to_iceberg(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    s = dt.simpleString()
    if s in _SPARK_TO_PRIM:
        return _SPARK_TO_PRIM[s]
    raise UnsupportedIcebergFeature(f"cannot write spark type {s!r}")


def _schema_to_iceberg(schema: T.StructType, base_id: int = 1) -> dict:
    fields = []
    for i, f in enumerate(schema.fields):
        fields.append(
            {
                "id": base_id + i,
                "name": f.name,
                "required": not f.nullable,
                "type": _spark_type_to_iceberg(f.dataType),
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


# ----------------------------------------------------- metadata resolve

def _metadata_dir(table_path: str) -> str:
    return os.path.join(table_path, "metadata")


def _latest_metadata(table_path: str) -> tuple[dict, int]:
    md = _metadata_dir(table_path)
    if not os.path.isdir(md):
        raise IcebergError(f"not an Iceberg table (no metadata/): {table_path}")
    hint = os.path.join(md, "version-hint.text")
    if os.path.exists(hint):
        v = int(open(hint).read().strip())
    else:
        vs = [
            int(m.group(1))
            for m in (
                re.fullmatch(r"v(\d+)\.metadata\.json", n)
                for n in os.listdir(md)
            )
            if m
        ]
        if not vs:
            raise IcebergError(f"no vN.metadata.json under {md}")
        v = max(vs)
    with open(os.path.join(md, f"v{v}.metadata.json")) as f:
        return json.load(f), v


def _current_schema(meta: dict) -> T.StructType:
    fv = int(meta.get("format-version", 1))
    if fv > 2:
        raise UnsupportedIcebergFeature(f"format-version {fv}")
    if "schemas" in meta:  # v2
        sid = meta.get("current-schema-id", 0)
        js = next(
            (s for s in meta["schemas"] if s.get("schema-id") == sid),
            meta["schemas"][-1],
        )
    else:  # v1
        js = meta["schema"]
    return _iceberg_type_to_spark(
        {"type": "struct", "fields": js["fields"]}
    )


def _partition_spec(meta: dict) -> list[dict]:
    if "partition-specs" in meta:
        sid = meta.get("default-spec-id", 0)
        spec = next(
            (
                s
                for s in meta["partition-specs"]
                if s.get("spec-id") == sid
            ),
            {"fields": []},
        )
        return spec.get("fields", [])
    return meta.get("partition-spec", [])


def _resolve_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots", [])
    if not snaps:
        raise IcebergError("table has no snapshots")
    if snapshot_id is None:
        cur = meta.get("current-snapshot-id")
        snap = next(
            (s for s in snaps if s["snapshot-id"] == cur), snaps[-1]
        )
    else:
        snap = next(
            (s for s in snaps if s["snapshot-id"] == snapshot_id), None
        )
        if snap is None:
            raise IcebergError(
                f"snapshot {snapshot_id} not in table (have "
                f"{[s['snapshot-id'] for s in snaps]})"
            )
    return snap


def _abs_path(table_path: str, p: str) -> str:
    # spec paths may be absolute URIs (file:/...) or table-relative
    if p.startswith("file:"):
        return re.sub(r"^file:/*", "/", p)
    if os.path.isabs(p):
        return p
    return os.path.join(table_path, p)


def _live_files(
    table_path: str, snap: dict, partition_filter: dict | None,
    spec_fields: list[dict],
) -> tuple[list[dict], list[dict]]:
    if partition_filter:
        by_name = {f["name"]: f for f in spec_fields}
        for c in partition_filter:
            f = by_name.get(c)
            if f is None:
                raise ValueError(f"{c!r} is not a partition field")
            if f.get("transform", "identity") != "identity":
                raise UnsupportedIcebergFeature(
                    f"partition_filter on transform {f['transform']!r}"
                )
    mlist = _abs_path(table_path, snap["manifest-list"])
    _, manifests = read_avro_records(mlist)
    live: list[dict] = []
    deletes: list[dict] = []
    for mf in manifests:
        is_delete_manifest = int(mf.get("content") or 0) == 1
        mpath = _abs_path(table_path, mf["manifest_path"])
        _, entries = read_avro_records(mpath)
        for e in entries:
            if int(e["status"]) == _STATUS_DELETED:
                continue
            df_rec = e["data_file"]
            if str(df_rec.get("file_format", "")).upper() != "PARQUET":
                raise UnsupportedIcebergFeature(
                    f"data file format {df_rec.get('file_format')!r}"
                )
            content = int(df_rec.get("content") or 0)
            if is_delete_manifest or content == 1:
                # POSITION delete file (round-12: refusal → capability);
                # equality deletes (content=2) stay refused
                deletes.append(df_rec)
                continue
            if content == 2:
                raise UnsupportedIcebergFeature(
                    "equality delete files are beyond this reader"
                )
            if partition_filter:
                pv = df_rec.get("partition") or {}
                if not all(
                    pv.get(c) == v for c, v in partition_filter.items()
                ):
                    continue
            live.append(df_rec)
    return live, deletes


def iceberg_snapshots(table_path: str) -> list[dict]:
    """(snapshot-id, timestamp-ms, operation) history — the time-travel
    index."""
    meta, _ = _latest_metadata(table_path)
    return [
        {
            "snapshot_id": s["snapshot-id"],
            "timestamp_ms": s["timestamp-ms"],
            "operation": (s.get("summary") or {}).get("operation"),
        }
        for s in meta.get("snapshots", [])
    ]


def read_iceberg_table(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Scan an Iceberg table at a snapshot (default: current) by
    resolving metadata.json → manifest list → manifests → live parquet
    files, all driver-side through the clean-room Avro codec — no
    directory listing, no Iceberg jars. `partition_filter` ({col:
    value}, identity transforms) prunes the file list before the scan
    is planned. Iceberg data files contain their partition columns, so
    the pruned files read directly with the table schema."""
    meta, _ = _latest_metadata(table_path)
    schema = _current_schema(meta)
    snap = _resolve_snapshot(meta, snapshot_id)
    files, deletes = _live_files(
        table_path, snap, partition_filter, _partition_spec(meta)
    )
    if not files:
        return spark.createDataFrame([], schema)
    paths = sorted(_abs_path(table_path, f["file_path"]) for f in files)
    scan = spark.read.schema(schema).parquet(*paths)
    if not deletes:
        return scan.select(*[f.name for f in schema.fields])
    # v2 POSITION deletes: each delete parquet holds (file_path, pos)
    # rows naming ordinal positions in data files. Spark's parquet
    # reader exposes exactly that ordinal as _metadata.row_index, so
    # deletion is one LEFT ANTI join on (file identity, position) —
    # fully distributed, no per-file driver loops. File identity joins
    # on the basename (uuid-unique in practice; verified driver-side,
    # loud refusal otherwise, since URI spelling differs between the
    # writer's recorded path and the scanner's file_path).
    from pyspark.sql import functions as F

    basenames = [p.rsplit("/", 1)[-1] for p in paths]
    if len(set(basenames)) != len(basenames):
        raise UnsupportedIcebergFeature(
            "data-file basenames are not unique — position-delete "
            "matching by basename would be ambiguous"
        )
    dpaths = sorted(_abs_path(table_path, d["file_path"]) for d in deletes)
    dels = (
        spark.read.schema("file_path string, pos long")
        .parquet(*dpaths)
        .select(
            F.substring_index("file_path", "/", -1).alias("_file_base"),
            F.col("pos").alias("_pos"),
        )
    )
    keyed = scan.select(
        *[f.name for f in schema.fields],
        F.substring_index(F.col("_metadata.file_path"), "/", -1).alias(
            "_file_base"
        ),
        F.col("_metadata.row_index").alias("_pos"),
    )
    return keyed.join(
        F.broadcast(dels), ["_file_base", "_pos"], "left_anti"
    ).select(*[f.name for f in schema.fields])


# --------------------------------------------------------------- writer

_MANIFEST_SCHEMA_BASE = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
    ],
}


def _manifest_schema(part_fields: list[tuple[str, str]]) -> dict:
    part_record = {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": n, "type": ["null", t]} for n, t in part_fields
        ],
    }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int"},
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "partition", "type": part_record},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": _MANIFEST_SCHEMA_BASE["fields"]
        + [{"name": "data_file", "type": data_file}],
    }


_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

# avro encoding type per partition-source spark type (identity only)
_PART_AVRO = {"int": "int", "bigint": "long", "string": "string"}


def write_iceberg_table(
    df: DataFrame,
    table_path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> int:
    """Commit `df` as a format-v2 Iceberg snapshot: parquet data files
    (each holding a single partition tuple when partitioned — and, per
    spec, CONTAINING the partition columns), a manifest Avro of ADDED
    entries with per-file partition records, a manifest list that
    references prior manifests on append and only the new one on
    overwrite, and v<N+1>.metadata.json + version-hint.text. Returns
    the new snapshot id. Single-writer discipline (fixtures/egress);
    a shared catalog needs the spec's atomic metadata swap."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    partition_by = list(partition_by or [])
    spark = df.sparkSession
    md = _metadata_dir(table_path)
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    os.makedirs(md, exist_ok=True)

    prior_meta = None
    if os.path.exists(os.path.join(md, "version-hint.text")):
        prior_meta, prior_v = _latest_metadata(table_path)
    else:
        prior_v = 0

    dtypes = dict(df.dtypes)
    part_avro_fields = []
    for c in partition_by:
        st = dtypes[c]
        if st not in _PART_AVRO:
            raise UnsupportedIcebergFeature(
                f"partition column type {st!r} (identity over "
                f"{sorted(_PART_AVRO)} supported)"
            )
        part_avro_fields.append((c, _PART_AVRO[st]))

    # data files: one staging write per partition tuple so every file
    # maps to exactly one partition record (unpartitioned: one write)
    snapshot_id = int(time.time() * 1000) * 1000 + (prior_v + 1)
    now_ms = int(time.time() * 1000)
    entries = []

    def _stage(sub_df: DataFrame, pv: dict) -> None:
        staging = os.path.join(table_path, f"_staging-{uuid.uuid4().hex}")
        sub_df.write.mode("overwrite").parquet(staging)
        import pyarrow.parquet as pq

        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(staging, name)
            rel = os.path.join("data", f"{uuid.uuid4().hex}.parquet")
            dst = os.path.join(table_path, rel)
            os.replace(src, dst)
            entries.append(
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snapshot_id,
                    "data_file": {
                        "content": 0,
                        "file_path": rel,
                        "file_format": "PARQUET",
                        "partition": pv,
                        "record_count": pq.read_metadata(dst).num_rows,
                        "file_size_in_bytes": os.path.getsize(dst),
                    },
                }
            )
        import shutil

        shutil.rmtree(staging, ignore_errors=True)

    if partition_by:
        from pyspark.sql import functions as F

        pvs = [
            tuple(r)
            for r in df.select(*partition_by).distinct().collect()
        ]
        for pv_vals in sorted(pvs, key=lambda t: tuple(map(str, t))):
            cond = None
            for c, v in zip(partition_by, pv_vals):
                e = F.col(c).isNull() if v is None else (F.col(c) == v)
                cond = e if cond is None else (cond & e)
            _stage(df.filter(cond), dict(zip(partition_by, pv_vals)))
    else:
        _stage(df, {})

    man_rel = os.path.join("metadata", f"manifest-{uuid.uuid4().hex}.avro")
    man_abs = os.path.join(table_path, man_rel)
    write_avro_records(
        man_abs, _manifest_schema(part_avro_fields), entries
    )

    prior_manifests: list[dict] = []
    if prior_meta is not None and mode == "append":
        prev_snap = _resolve_snapshot(prior_meta, None)
        _, prior_manifests = read_avro_records(
            _abs_path(table_path, prev_snap["manifest-list"])
        )
    mlist_rel = os.path.join(
        "metadata", f"snap-{snapshot_id}-{uuid.uuid4().hex}.avro"
    )
    write_avro_records(
        os.path.join(table_path, mlist_rel),
        _MANIFEST_LIST_SCHEMA,
        prior_manifests
        + [
            {
                "manifest_path": man_rel,
                "manifest_length": os.path.getsize(man_abs),
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": snapshot_id,
            }
        ],
    )

    snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now_ms,
        "manifest-list": mlist_rel,
        "summary": {"operation": mode},
        "schema-id": 0,
    }
    if prior_meta is not None:
        meta = dict(prior_meta)
        meta["snapshots"] = list(meta.get("snapshots", [])) + [snapshot]
    else:
        ice_schema = _schema_to_iceberg(df.schema)
        meta = {
            "format-version": 2,
            "table-uuid": uuid.uuid4().hex,
            "location": table_path,
            "last-sequence-number": 0,
            "last-updated-ms": now_ms,
            "last-column-id": len(df.schema.fields),
            "schemas": [ice_schema],
            "current-schema-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": c,
                            "transform": "identity",
                            "source-id": i + 1,
                            "field-id": 1000 + i,
                        }
                        for i, c in enumerate(partition_by)
                    ],
                }
            ],
            "default-spec-id": 0,
            "properties": {},
            "snapshots": [snapshot],
        }
    meta["current-snapshot-id"] = snapshot_id
    meta["last-updated-ms"] = now_ms

    new_v = prior_v + 1
    tmp = os.path.join(md, f".v{new_v}.metadata.json.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(md, f"v{new_v}.metadata.json"))
    hint_tmp = os.path.join(md, f".hint-{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as f:
        f.write(str(new_v))
    os.replace(hint_tmp, os.path.join(md, "version-hint.text"))
    _ = spark
    return snapshot_id


def delete_rows_from_iceberg_table(
    spark: SparkSession,
    table_path: str,
    condition,
) -> int:
    """Commit v2 POSITION deletes for every current row matching
    `condition` (a Column or SQL string): scan the current snapshot
    with Spark's parquet metadata columns to get each matching row's
    (data file, ordinal position) — `_metadata.row_index` IS the
    spec's `pos` — write one position-delete parquet (file_path, pos,
    recorded with the data file's manifest path string), and commit a
    new snapshot whose manifest list carries the prior manifests plus
    a content=1 delete manifest. Data files are untouched (merge-on-
    read); older snapshots keep reading the undeleted rows. Returns
    the new snapshot id."""
    from pyspark.sql import functions as F

    meta, prior_v = _latest_metadata(table_path)
    snap = _resolve_snapshot(meta, None)
    files, _existing_deletes = _live_files(table_path, snap, None, [])
    if not files:
        raise IcebergError("no data files to delete from")
    base_to_stored = {
        f["file_path"].rsplit("/", 1)[-1]: f["file_path"] for f in files
    }
    if len(base_to_stored) != len(files):
        raise UnsupportedIcebergFeature(
            "data-file basenames are not unique — cannot key deletes"
        )
    schema = _current_schema(meta)
    paths = sorted(
        _abs_path(table_path, f["file_path"]) for f in files
    )
    cond = F.expr(condition) if isinstance(condition, str) else condition
    mapping = spark.createDataFrame(
        sorted(base_to_stored.items()), "_file_base string, file_path string"
    )
    hits = (
        spark.read.schema(schema).parquet(*paths)
        .select(
            F.substring_index(
                F.col("_metadata.file_path"), "/", -1
            ).alias("_file_base"),
            F.col("_metadata.row_index").alias("pos"),
            "*",
        )
        .filter(cond)
        .join(F.broadcast(mapping), "_file_base")
        .select("file_path", "pos")
        .orderBy("file_path", "pos")  # spec: sorted by file, position
    )

    snapshot_id = int(time.time() * 1000) * 1000 + (prior_v + 1)
    now_ms = int(time.time() * 1000)
    staging = os.path.join(table_path, f"_staging-{uuid.uuid4().hex}")
    hits.coalesce(1).write.mode("overwrite").parquet(staging)
    del_rel = os.path.join(
        "data", f"delete-{uuid.uuid4().hex}.parquet"
    )
    moved = False
    for name in sorted(os.listdir(staging)):
        if name.endswith(".parquet"):
            os.replace(
                os.path.join(staging, name),
                os.path.join(table_path, del_rel),
            )
            moved = True
            break
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    if not moved:
        raise IcebergError("delete scan produced no parquet output")

    import pyarrow.parquet as pq

    dst = os.path.join(table_path, del_rel)
    n_deletes = pq.read_metadata(dst).num_rows
    # delete manifest: same entry schema, partition record all-null at
    # the table's spec width (delete files here are table-scoped)
    spec_fields = _partition_spec(meta)
    part_avro_fields = []
    for f in spec_fields:
        part_avro_fields.append((f["name"], "string"))
    entry = {
        "status": 1,
        "snapshot_id": snapshot_id,
        "data_file": {
            "content": 1,  # POSITION DELETES
            "file_path": del_rel,
            "file_format": "PARQUET",
            "partition": {n: None for n, _ in part_avro_fields},
            "record_count": n_deletes,
            "file_size_in_bytes": os.path.getsize(dst),
        },
    }
    man_rel = os.path.join(
        "metadata", f"manifest-del-{uuid.uuid4().hex}.avro"
    )
    man_abs = os.path.join(table_path, man_rel)
    write_avro_records(man_abs, _manifest_schema(part_avro_fields), [entry])

    _, prior_manifests = read_avro_records(
        _abs_path(table_path, snap["manifest-list"])
    )
    mlist_rel = os.path.join(
        "metadata", f"snap-{snapshot_id}-{uuid.uuid4().hex}.avro"
    )
    write_avro_records(
        os.path.join(table_path, mlist_rel),
        _MANIFEST_LIST_SCHEMA,
        prior_manifests
        + [
            {
                "manifest_path": man_rel,
                "manifest_length": os.path.getsize(man_abs),
                "partition_spec_id": 0,
                "content": 1,
                "added_snapshot_id": snapshot_id,
            }
        ],
    )
    new_meta = dict(meta)
    new_meta["snapshots"] = list(meta.get("snapshots", [])) + [
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": now_ms,
            "manifest-list": mlist_rel,
            "summary": {"operation": "delete"},
            "schema-id": 0,
        }
    ]
    new_meta["current-snapshot-id"] = snapshot_id
    new_meta["last-updated-ms"] = now_ms
    new_v = prior_v + 1
    md = _metadata_dir(table_path)
    tmp = os.path.join(md, f".v{new_v}.metadata.json.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(new_meta, f)
    os.replace(tmp, os.path.join(md, f"v{new_v}.metadata.json"))
    hint_tmp = os.path.join(md, f".hint-{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as f:
        f.write(str(new_v))
    os.replace(hint_tmp, os.path.join(md, "version-hint.text"))
    return snapshot_id
