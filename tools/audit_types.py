"""Harness-parity type audit: Spark result schema vs DuckDB oracle result types.

The driver's correctness gate hashes Spark and DuckDB results side-by-side.
Our local checker canonicalizes leniently (float 1187.0 == int 1187), but the
driver's harness is type-sensitive in at least one observed case
(CORRECTNESS_r02: q12_priority_class red because DuckDB sum(CASE) returns
HUGEINT -> pandas float64 while Spark returns bigint). This tool finds every
such latent mismatch BEFORE the driver does: for each registered query with an
oracle, it runs the oracle in DuckDB, fetches the result as Arrow (preserving
HUGEINT as decimal128), runs the Spark query for its schema only, and compares
per-column type *classes* (integer / floating / decimal / string / bool /
timestamp / date / list / struct).

Usage: python tools/audit_types.py [--sf-dir /root/testdata/sf0.001] [names...]
Exit 1 if any mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import pyarrow as pa

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from novelti_dingo_spark import registry, schemas  # noqa: E402
from novelti_dingo_spark.session import get_spark  # noqa: E402

from pyspark.sql import types as T  # noqa: E402


def arrow_class(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t):
        return "floating"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def spark_class(t: T.DataType) -> str:
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "floating"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.TimestampType):
        return "timestamp"
    if isinstance(t, (T.DateType,)):
        return "date"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.ArrayType):
        return "list"
    if isinstance(t, T.StructType):
        return "struct"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, T.NullType):
        return "null"
    return str(t)


# A DuckDB "null" column class (e.g. NULL literal) vs anything is noise;
# date-vs-timestamp also hashes identically under isoformat? No: a date
# isoformats without time part while a midnight timestamp has one. Keep strict.
COMPATIBLE = {("null", "null")}


def run(sf_dir: str, names: list[str] | None) -> int:
    specs = registry.all_specs()
    if names:
        specs = {n: specs[n] for n in names}
    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in schemas.TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad = 0
    checked = 0
    for name, spec in specs.items():
        if spec.oracle is None:
            continue
        checked += 1
        try:
            sdf = spec.fn(spark, sf_dir)
            sfields = {f.name: spark_class(f.dataType) for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: spark error: {e}")
            bad += 1
            continue
        try:
            tbl = con.sql(spec.oracle).arrow()
            ofields = {f.name: arrow_class(f.type) for f in tbl.schema}
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: duckdb error: {e}")
            bad += 1
            continue
        if sorted(sfields) != sorted(ofields):
            print(f"COLS  {name}: spark {sorted(sfields)} != duckdb {sorted(ofields)}")
            bad += 1
            continue
        mism = {
            c: (sfields[c], ofields[c])
            for c in sfields
            if sfields[c] != ofields[c] and (sfields[c], ofields[c]) not in COMPATIBLE
        }
        if mism:
            detail = ", ".join(f"{c}: spark={a} duckdb={b}" for c, (a, b) in mism.items())
            print(f"TYPE  {name}: {detail}")
            bad += 1
    print(f"checked {checked} oracle queries, {bad} with type-class mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sys.exit(run(args.sf_dir, args.names or None))
