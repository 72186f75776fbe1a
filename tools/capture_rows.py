"""Exact-output capture for registered queries (optimization-round rig).

Collects each named query's rows and records a full-float-precision
value hash (same canonicalization as tools/check_oracle.py) plus the
wall time of build+collect. Run BEFORE and AFTER an optimization and
diff the JSONs to prove the change kept results bit-identical — the
required evidence for rows-only queries that have no DuckDB oracle.

Usage: python tools/capture_rows.py --sf-dir DIR --out FILE names...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from novelti_dingo_spark import registry  # noqa: E402
from novelti_dingo_spark.session import get_spark  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import value_hash  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("capture-rows")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    out: dict[str, dict] = {}
    for i, name in enumerate(args.names):
        spark.sparkContext.setJobDescription(f"capture:{name}")
        t0 = time.perf_counter()
        try:
            df = specs[name].fn(spark, args.sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[{i+1}/{len(args.names)}] {name}: ERROR {e}", flush=True)
            continue
        sec = round(time.perf_counter() - t0, 2)
        out[name] = {
            "rows": len(rows),
            "hash": value_hash(cols, rows),
            "sec": sec,
        }
        print(
            f"[{i+1}/{len(args.names)}] {name}: {len(rows)} rows "
            f"hash={out[name]['hash']} {sec}s",
            flush=True,
        )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
