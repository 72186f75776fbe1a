"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized). Usage:

    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time
from datetime import date, datetime

import duckdb

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from novelti_dingo_spark import registry, schemas  # noqa: E402
from novelti_dingo_spark.session import get_spark  # noqa: E402


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.17g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def run(sf_dir: str, names: list[str] | None, json_out: str | None = None) -> int:
    specs = registry.all_specs()
    if names:
        specs = {n: specs[n] for n in names}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in schemas.TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = 0
    results = {}
    for name, spec in specs.items():
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"status": "spark-error"}
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok    {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            results[name] = {"status": "rows-only", "rows": len(srows),
                             "ms": round((time.time() - t0) * 1000)}
            continue
        try:
            ores = con.sql(spec.oracle)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash {sh} != {oh}")
                # print first differing canonical row to speed debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("|".join(_canon(r[i]) for i in so) for r in srows)
                oset = sorted("|".join(_canon(r[i]) for i in oo) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        problems.append(f"  spark:  {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            results[name] = {"status": "fail", "problems": problems[:1]}
            failures += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            results[name] = {"status": "oracle-match", "rows": len(srows),
                             "ms": round((time.time() - t0) * 1000)}
    summary = {"total": len(specs), "failures": failures, "sf_dir": sf_dir}
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "queries": results}, f, indent=1,
                      sort_keys=True)
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--json-out", default=None,
                    help="write per-query status/timing JSON evidence here")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sys.exit(run(args.sf_dir, args.names or None, args.json_out))
