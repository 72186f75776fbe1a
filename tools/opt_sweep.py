"""Optimization-round measurement sweep (round 14, guide §1).

For every registered query at the given SF: build the DataFrame (timing
the driver-side build — lake readers replay logs in Python here), time
noop-sink executions (guide §1.4: computes every column, no result
fetch), and record plan-shape stats the 100 TB posture cares about —
Exchange count, python-eval nodes (BatchEvalPython/ArrowEvalPython),
join strategies, CartesianProduct, InMemoryTableScan, scan count.

Writes OPT_SWEEP_r14.json keyed by query name:
  {build_ms, first_ms, warm_ms (median of k), exchanges, py_eval,
   bhj, smj, shj, nlj, cartesian, scans, codegen_spans}

Usage: python tools/opt_sweep.py [--sf-dir DIR] [--runs K] [names...]

Round-15 `--e2e` mode (round-14 verdict #2): time fn() BUILD + one
noop-sink execution as ONE number per run, k runs per query, report
median + all samples. This is the honest metric for trainer-style
queries (ALS, k-means) whose work happens inside fn() — driver-side
loops, eager checkpoints, telemetry collects — which the build/warm
split above attributes to build_ms and then re-times only the final
tiny plan as warm_ms.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from novelti_dingo_spark import registry  # noqa: E402
from novelti_dingo_spark.plans import explain_formatted  # noqa: E402
from novelti_dingo_spark.session import get_spark  # noqa: E402


def plan_stats(plan: str) -> dict:
    def count(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "exchanges": count(r"\bExchange\b"),
        "py_eval": count(r"BatchEvalPython|ArrowEvalPython|MapInPandas"
                         r"|MapInArrow|FlatMapGroupsInPandas"),
        "bhj": count(r"BroadcastHashJoin"),
        "smj": count(r"SortMergeJoin"),
        "shj": count(r"ShuffledHashJoin"),
        "bnlj": count(r"BroadcastNestedLoopJoin"),
        "cartesian": count(r"CartesianProduct"),
        "scans": count(r"Scan parquet|FileScan parquet"),
        "inmem": count(r"InMemoryTableScan"),
        "codegen_spans": count(r"WholeStageCodegen"),
        "sorts": count(r"\bSort \["),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--e2e", action="store_true",
        help="time fn() build + one noop execution as ONE end-to-end "
        "number per run (trainer queries do their work inside fn())",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("opt-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    names = args.names or list(specs)
    out: dict[str, dict] = {}
    if args.e2e:
        for i, name in enumerate(names):
            spec = specs[name]
            spark.sparkContext.setJobDescription(f"sweep-e2e:{name}")
            try:
                samples = []
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    df = spec.fn(spark, args.sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(
                        round((time.perf_counter() - t0) * 1000, 1)
                    )
                out[name] = {
                    "e2e_ms": round(statistics.median(samples), 1),
                    "e2e_ms_runs": samples,
                }
                print(
                    f"[{i+1}/{len(names)}] {name}: e2e_ms="
                    f"{out[name]['e2e_ms']:.0f} runs={samples}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                print(f"[{i+1}/{len(names)}] {name}: ERROR {e}", flush=True)
        path = args.out or os.path.join(REPO_ROOT, "OPT_SWEEP_E2E.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path} ({len(out)} queries)")
        return
    for i, name in enumerate(names):
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            build_ms = (time.perf_counter() - t0) * 1000
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            first_ms = (time.perf_counter() - t0) * 1000
            warms = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                warms.append((time.perf_counter() - t0) * 1000)
            rec = {
                "build_ms": round(build_ms, 1),
                "first_ms": round(first_ms, 1),
                "warm_ms": round(statistics.median(warms), 1),
            }
            rec.update(plan_stats(explain_formatted(df)))
            out[name] = rec
            print(
                f"[{i+1}/{len(names)}] {name}: build={rec['build_ms']:.0f} "
                f"first={rec['first_ms']:.0f} warm={rec['warm_ms']:.0f} "
                f"ex={rec['exchanges']} py={rec['py_eval']}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[{i+1}/{len(names)}] {name}: ERROR {e}", flush=True)
    path = args.out or os.path.join(REPO_ROOT, "OPT_SWEEP_r14.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path} ({len(out)} queries)")


if __name__ == "__main__":
    main()
