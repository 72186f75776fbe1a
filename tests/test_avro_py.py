"""Pure-python Avro container reader (sources/avro_py.py): roundtrip
against the bundled JVM reference writer (both codecs), nullable-union
nulls, sync-marker block splitting into real partitions, and loud
refusal of unsupported shapes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.sources.avro_py import (
    AvroPySource,
    _read_header,
    read_avro,
    write_avro_reference,
)
from novelti_dingo_spark.sources.io import load_table


def _supplier(spark, sf_small):
    return load_table(spark, sf_small, "supplier")


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_roundtrip_matches_jvm_reference(spark, sf_small, tmp_path, codec):
    s = _supplier(spark, sf_small)
    path = str(tmp_path / f"supplier_{codec}.avro")
    n = write_avro_reference(spark, s, path, codec=codec)
    df = read_avro(spark, path)
    assert df.schema.simpleString() == s.schema.simpleString().replace(
        "float,", "float,"
    )
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in s.collect())
    assert got == want and len(got) == n


def test_nullable_union_nulls_survive(spark, tmp_path):
    rows = [(1, "a", 1.5), (2, None, None), (3, "c", -0.25)]
    df = spark.createDataFrame(rows, "k bigint, name string, v double")
    path = str(tmp_path / "nulls.avro")
    write_avro_reference(spark, df, path, codec="deflate")
    got = sorted(
        (r.k, r.name, r.v) for r in read_avro(spark, path).collect()
    )
    assert got == sorted(rows)


def test_block_splitting_yields_parallel_partitions(spark, sf_small, tmp_path):
    """The container format is splittable on sync markers: force many
    small blocks through the JVM writer, cap rows_per_task, and the
    reader must plan >1 input partition while losing nothing."""
    jvm = spark._jvm
    s = (
        load_table(spark, sf_small, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(500)
    )
    path = str(tmp_path / "blocks.avro")
    # write with a tiny sync interval so the reference writer emits
    # many blocks (the JVM flushes a block when it crosses the bound);
    # inline re-implementation of write_avro_reference with
    # setSyncInterval — keeps the public helper's signature clean
    import json as _json

    fields = [
        {"name": f.name, "type": ["null", {"bigint": "long", "int": "int",
          "double": "double", "string": "string"}[f.dataType.simpleString()]]}
        for f in s.schema.fields
    ]
    schema_json = _json.dumps(
        {"type": "record", "name": "Row", "fields": fields}
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    dfw.setSyncInterval(256)  # ~few rows per block
    dfw.create(schema, jvm.java.io.File(path))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dec_factory = jvm.org.apache.avro.io.DecoderFactory.get()
    at = {f["name"]: f["type"] for f in fields}
    for row in s.toLocalIterator():
        obj = {
            f.name: (None if row[f.name] is None
                     else {at[f.name][1]: row[f.name]})
            for f in s.schema.fields
        }
        dec = dec_factory.jsonDecoder(schema, _json.dumps(obj))
        dfw.append(reader.read(None, dec))
    dfw.close()

    with open(path, "rb") as f:
        header = _read_header(f.read(1 << 16))
    src = AvroPySource({"path": path, "rows_per_task": "20"})
    parts = src.reader(src.schema()).partitions()
    assert len(parts) > 1, "expected multiple block-run partitions"

    df = (
        spark.read.format("avro_py")
        .option("path", path)
        .option("rows_per_task", "20")
        .load()
    )
    assert df.rdd.getNumPartitions() > 1
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in s.collect())
    assert got == want
    assert header.codec in ("null", "deflate")


def test_directory_and_filter_pushthrough(spark, sf_small, tmp_path):
    s = _supplier(spark, sf_small)
    d = tmp_path / "dir"
    write_avro_reference(
        spark, s.filter("s_suppkey % 2 = 0"), str(d / "a.avro")
    )
    write_avro_reference(
        spark, s.filter("s_suppkey % 2 = 1"), str(d / "b.avro")
    )
    df = read_avro(spark, str(d))
    assert df.count() == s.count()
    got = df.filter(F.col("s_nationkey") == 3).count()
    want = s.filter(F.col("s_nationkey") == 3).count()
    assert got == want


def test_complex_types_decode_and_remaining_shapes_refuse(spark, tmp_path):
    """Round-12: arrays (and maps/nested records) DECODE — including
    from a FOREIGN writer (the JVM's own org.apache.avro, which blocks
    arrays with negative counts differently than our writer); what
    remains unsupported (multi-branch unions, exotic codecs) still
    raises typed errors instead of misdecoding."""
    jvm = spark._jvm
    import json as _json

    schema_json = _json.dumps(
        {
            "type": "record",
            "name": "Row",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "xs", "type": {"type": "array", "items": "long"}},
            ],
        }
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    path = str(tmp_path / "arr.avro")
    dfw.create(schema, jvm.java.io.File(path))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
        schema, _json.dumps({"k": 1, "xs": [1, 2]})
    )
    dfw.append(reader.read(None, dec))
    dfw.close()
    from novelti_dingo_spark.sources.avro_py import read_avro_records

    _, rows = read_avro_records(path)
    assert rows == [{"k": 1, "xs": [1, 2]}]

    # multi-branch union: still a loud refusal
    from novelti_dingo_spark.sources.avro_py import _field_type

    with pytest.raises(NotImplementedError, match="union"):
        _field_type(["int", "string", "null"])


def test_missing_path_refuses(spark, tmp_path):
    src = AvroPySource({"path": str(tmp_path / "nothing")})
    with pytest.raises(ValueError, match="no avro files"):
        src.schema()


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_python_writer_decoded_by_jvm_reference(spark, sf_small, tmp_path, codec):
    """The sink's machine-proof mirror of the reader tests: files the
    PYTHON writer encodes must decode identically through the bundled
    JVM DataFileReader — both directions of the format are now checked
    against the reference implementation."""
    from novelti_dingo_spark.sources.avro_py import write_avro

    s = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).limit(200)
    d = str(tmp_path / f"out_{codec}")
    write_avro(s, d, codec=codec)
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    jvm = spark._jvm
    got = []
    import glob as _glob

    for fp in sorted(_glob.glob(os.path.join(d, "*.avro"))):
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(fp),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        while rdr.hasNext():
            rec = rdr.next()
            got.append(
                (
                    rec.get("o_orderkey"),
                    str(rec.get("o_orderpriority")),
                    rec.get("o_totalprice"),
                )
            )
        rdr.close()
    want = sorted(tuple(r) for r in s.collect())
    assert sorted(got) == want


def test_python_writer_python_reader_roundtrip_with_nulls(spark, tmp_path):
    from novelti_dingo_spark.sources.avro_py import read_avro, write_avro

    rows = [(1, "a", 1.5), (2, None, None), (3, "c", -0.25)]
    df = spark.createDataFrame(rows, "k bigint, name string, v double")
    d = str(tmp_path / "rt")
    write_avro(df, d)
    got = sorted((r.k, r.name, r.v) for r in read_avro(spark, d).collect())
    assert got == sorted(rows)


def test_python_writer_is_distributed(spark, sf_small, tmp_path):
    """One container file per non-empty input partition — the write
    runs on executors, not the driver."""
    import glob as _glob

    from novelti_dingo_spark.sources.avro_py import read_avro, write_avro

    s = (
        load_table(spark, sf_small, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartition(4)
    )
    d = str(tmp_path / "dist")
    write_avro(s, d)
    assert len(_glob.glob(os.path.join(d, "*.avro"))) == 4
    assert read_avro(spark, d).count() == s.count()


def test_writer_overwrite_replaces_previous_files(spark, tmp_path):
    """mode('overwrite') must actually replace the directory's previous
    files (round-7 advice: the writer ignored the overwrite flag, so
    'overwrite' silently appended). Two-phase: new files land first,
    commit deletes the stale ones."""
    import glob as _glob

    from novelti_dingo_spark.sources.avro_py import read_avro, write_avro

    d = str(tmp_path / "ow")
    old = spark.createDataFrame([(1, "old"), (2, "old")], "k bigint, tag string")
    new = spark.createDataFrame([(7, "new")], "k bigint, tag string")
    write_avro(old, d)
    n_old_files = len(_glob.glob(os.path.join(d, "*.avro")))
    assert n_old_files >= 1
    write_avro(new, d, mode="overwrite")
    got = sorted((r.k, r.tag) for r in read_avro(spark, d).collect())
    assert got == [(7, "new")]
    # append still appends
    write_avro(old, d, mode="append")
    assert read_avro(spark, d).count() == 3


def test_writer_overwrite_stages_then_swaps_atomically(spark, tmp_path):
    """Round-9 advice: the old overwrite protocol wrote new part files
    BESIDE the live ones while the previous job's _SUCCESS still stood,
    so a concurrent reader keyed on _SUCCESS could observe a valid
    marker over a mixed old+new file set. The fix stages new files in a
    hidden subdirectory and swaps at commit: before commit() the live
    *.avro set is EXACTLY the old job's output; after commit() it is
    exactly the new job's. Drives AvroPyWriter directly so the
    pre-commit window can be inspected."""
    import glob as _glob

    from pyspark.sql.types import LongType, StructField, StructType

    from novelti_dingo_spark.sources.avro_py import (
        AvroPyWriter,
        read_avro,
        write_avro,
    )

    d = str(tmp_path / "swap")
    schema = StructType([StructField("k", LongType(), False)])
    old = spark.createDataFrame([(1,), (2,)], schema)
    write_avro(old, d, codec="null")
    old_files = sorted(_glob.glob(os.path.join(d, "*.avro")))
    assert old_files and os.path.exists(os.path.join(d, "_SUCCESS"))

    w = AvroPyWriter({"path": d, "codec": "null"}, schema, overwrite=True)
    msg = w.write(iter([(7,), (8,)]))
    # pre-commit: staged file lives OUTSIDE the live *.avro set; the
    # directory still reads as the old job's complete, committed output
    assert msg.file.startswith(os.path.join(d, "_staging-"))
    assert sorted(_glob.glob(os.path.join(d, "*.avro"))) == old_files
    assert sorted((r.k,) for r in read_avro(spark, d).collect()) == [(1,), (2,)]

    w.commit([msg])
    live = _glob.glob(os.path.join(d, "*.avro"))
    assert len(live) == 1 and os.path.basename(msg.file) == os.path.basename(live[0])
    assert not os.path.exists(w.staging)  # staging dir cleaned up
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert sorted(r.k for r in read_avro(spark, d).collect()) == [7, 8]

    # abort of a staged attempt leaves the committed state untouched
    w2 = AvroPyWriter({"path": d, "codec": "null"}, schema, overwrite=True)
    msg2 = w2.write(iter([(99,)]))
    w2.abort([msg2])
    assert not os.path.exists(w2.staging)
    assert sorted(r.k for r in read_avro(spark, d).collect()) == [7, 8]


def test_wide_schema_header_beyond_64kb(spark, tmp_path):
    """A header whose schema JSON exceeds the old fixed 64 KB read
    prefix must parse (round-7 advice: incremental header parse)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from novelti_dingo_spark.sources.avro_py import (
        write_avro_file,
    )

    n_fields = 1500
    names = [f"f_{i:04d}_{'x' * 48}" for i in range(n_fields)]
    schema = StructType([StructField(n, LongType(), False) for n in names])
    path = str(tmp_path / "wide.avro")
    write_avro_file([tuple(range(n_fields))], schema, path, codec="null")
    assert os.path.getsize(path) > (1 << 16)
    with open(path, "rb") as f:
        header = _read_header(f)
    assert header.data_start > (1 << 16)
    assert len(header.schema["fields"]) == n_fields
    df = read_avro(spark, path)
    row = df.collect()[0]
    assert row[names[0]] == 0 and row[names[-1]] == n_fields - 1


def test_writer_streams_blocks_not_materializing_partition(tmp_path):
    """write_avro_file must flush encoded blocks WHILE the row iterator
    is still being consumed (round-7 advice: the sink buffered whole
    partitions via list(iterator))."""
    from pyspark.sql.types import LongType, StructField, StructType

    from novelti_dingo_spark.sources.avro_py import write_avro_file

    from pyspark.sql.types import StringType

    schema = StructType(
        [StructField("k", LongType(), False),
         StructField("pad", StringType(), False)]
    )
    path = str(tmp_path / "stream.avro")
    sizes_at_pull: list[int] = []
    pad = "x" * 1024  # each 100-row block ≈ 100 KB >> the 8 KB file buffer

    def gen():
        for i in range(1000):
            if i % 100 == 0:
                sizes_at_pull.append(
                    os.path.getsize(path) if os.path.exists(path) else 0
                )
            yield (i, pad)

    n = write_avro_file(gen(), schema, path, codec="null", rows_per_block=100)
    assert n == 1000
    # blocks hit disk before the generator finished: file size grew
    # while rows were still being pulled
    assert any(s > 0 for s in sizes_at_pull[2:]), sizes_at_pull


def test_overwrite_commit_crash_window_preserves_old_data(spark, tmp_path):
    """Round-11 advice: the swap used to DELETE the old *.avro before
    renaming the staged files in — a crash in that window destroyed the
    previous committed data. Renames now happen first: inject a crash
    right after every rename (before any delete) and assert the old
    files are all still on disk (recoverable), the directory reads as
    uncommitted (no _SUCCESS), and a clean retry converges with no
    stale _staging-* leftovers."""
    import glob as _glob

    from pyspark.sql.types import LongType, StructField, StructType

    from novelti_dingo_spark.sources.avro_py import (
        AvroPyWriter,
        read_avro,
        write_avro,
    )

    d = str(tmp_path / "crash")
    schema = StructType([StructField("k", LongType(), False)])
    write_avro(spark.createDataFrame([(1,), (2,)], schema), d, codec="null")
    old_files = sorted(_glob.glob(os.path.join(d, "*.avro")))

    w = AvroPyWriter({"path": d, "codec": "null"}, schema, overwrite=True)
    msg = w.write(iter([(7,)]))

    class Boom(RuntimeError):
        pass

    real_remove = os.remove

    def crashing_remove(p):
        if p.endswith(".avro"):  # first old-file delete = crash point
            raise Boom(p)
        real_remove(p)

    import unittest.mock as mock

    with mock.patch(
        "novelti_dingo_spark.sources.avro_py.os.remove", crashing_remove
    ):
        try:
            w.commit([msg])
            raise AssertionError("crash injection never fired")
        except Boom:
            pass

    # the previous committed data is fully intact on disk...
    for fp in old_files:
        assert os.path.exists(fp), f"old file destroyed in crash window: {fp}"
    # ...and the directory correctly reads as uncommitted
    assert not os.path.exists(os.path.join(d, "_SUCCESS"))

    # a retried overwrite (fresh writer = fresh staging dir, as the
    # engine would do) converges: exactly the new data, committed, and
    # the crashed attempt's staging dir swept
    w2 = AvroPyWriter({"path": d, "codec": "null"}, schema, overwrite=True)
    msg2 = w2.write(iter([(7,)]))
    w2.commit([msg2])
    assert sorted(r.k for r in read_avro(spark, d).collect()) == [7]
    assert _glob.glob(os.path.join(d, "_staging-*")) == []


def test_nested_record_array_map_roundtrip(tmp_path):
    """Round-12 codec extension (for Iceberg manifests): nested
    records decode to dicts, arrays to lists, maps to dicts; unions
    over complex types take the branch index; multi-block arrays from
    foreign writers (negative block counts with byte sizes) decode."""
    from novelti_dingo_spark.sources.avro_py import (
        read_avro_records,
        write_avro_records,
    )

    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "inner",
                "type": {
                    "type": "record",
                    "name": "inner_r",
                    "fields": [
                        {"name": "s", "type": "string"},
                        {"name": "xs", "type": {"type": "array", "items": "int"}},
                        {
                            "name": "kv",
                            "type": ["null", {"type": "map", "values": "double"}],
                        },
                    ],
                },
            },
            {"name": "maybe_list", "type": ["null", {"type": "array", "items": "string"}]},
        ],
    }
    rows = [
        {"id": 1, "inner": {"s": "a", "xs": [1, 2, 3], "kv": {"x": 1.5}},
         "maybe_list": ["p", "q"]},
        {"id": 2, "inner": {"s": "", "xs": [], "kv": None},
         "maybe_list": None},
    ]
    path = str(tmp_path / "nested.avro")
    assert write_avro_records(path, schema, rows) == 2
    got_schema, got = read_avro_records(path)
    assert got == rows
    assert got_schema["name"] == "outer"
