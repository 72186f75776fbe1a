"""Reproducible end-to-end ALS A/B (round-14 verdict item 2).

Round 14 restructured ALS training (commit 1727800: per-entity
applyInPandas ridge solves -> codegen'd normal-equation partial aggs +
one batched mapInPandas solve; commit 89c1baa: lazy checkpoints +
shared keyed ratings + deferred telemetry). The committed r14 sweeps
could not see the win because opt_sweep's build/warm split attributes
trainer work to build_ms and then re-times only the final tiny plan.

This script times the ONLY honest metric for a trainer query — fn()
construction + one noop-sink execution as a single number — and
interleaves OLD and NEW within one Spark session (ABAB...) so machine
drift hits both arms equally. The OLD implementation is extracted from
git (`OLD_REF`) at runtime and exec'd with its @register calls stubbed
out, so nothing about the live registry changes.

Usage: python tools/als_ab.py [--sf-dir DIR] [--runs K] [--out PATH]
Writes ALS_AB_r15.json: per query, per arm: all samples + median.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
import types

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# the commit that introduced the batched-solve ALS; its parent holds the
# last per-entity applyInPandas shape
NEW_SHAPE_COMMIT = "172780032173887f55d556130af5d577d76a5499"


def load_old_module() -> types.ModuleType:
    """Exec the pre-optimization als.py from git history as a module.
    @register is stubbed to a pass-through so the live registry keeps
    the current implementations."""
    src = subprocess.check_output(
        [
            "git", "-C", REPO_ROOT, "show",
            f"{NEW_SHAPE_COMMIT}^:novelti_dingo_spark/operators/als.py",
        ],
        text=True,
    )
    mod = types.ModuleType("als_old_ab")
    mod.__package__ = "novelti_dingo_spark.operators"
    # neutralize registration before the decorators run
    import novelti_dingo_spark.operators.als as als_pkg  # noqa: F401

    exec(  # noqa: S102 — our own committed history, not external input
        compile(src, "als_old_ab(from git)", "exec"), mod.__dict__
    )
    return mod


def time_e2e(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round((time.perf_counter() - t0) * 1000.0, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO_ROOT, "ALS_AB_r15.json")
    )
    args = ap.parse_args()

    from novelti_dingo_spark.operators import als as als_new
    from novelti_dingo_spark.session import get_spark

    # stub register: the old module re-declares the same query names
    import novelti_dingo_spark.registry as registry

    real_register = registry.register
    registry.register = lambda *a, **k: (lambda f: f)
    try:
        als_old = load_old_module()
    finally:
        registry.register = real_register

    spark = get_spark()
    arms = {
        "als_convergence": {
            "old": als_old.als_convergence,
            "new": als_new.als_convergence,
        },
        "als_top_recs": {
            "old": als_old.als_top_recs,
            "new": als_new.als_top_recs,
        },
    }
    out: dict = {
        "protocol": (
            "end-to-end ms = fn() build + one noop-sink execution; "
            f"interleaved old/new x{args.runs} in one session; "
            "old = applyInPandas per-entity solve + eager checkpoints "
            f"({NEW_SHAPE_COMMIT[:7]}^), new = working tree"
        ),
        "sf_dir": args.sf_dir,
    }
    for qname, fns in arms.items():
        samples: dict[str, list[float]] = {"old": [], "new": []}
        # warm both arms once (JIT, parquet footer cache) — dropped
        for arm in ("old", "new"):
            spark.sparkContext.setJobDescription(f"als-ab:{qname}:warm:{arm}")
            time_e2e(spark, fns[arm], args.sf_dir)
        for r in range(args.runs):
            for arm in ("old", "new"):
                spark.sparkContext.setJobDescription(
                    f"als-ab:{qname}:{arm}:{r}"
                )
                ms = time_e2e(spark, fns[arm], args.sf_dir)
                samples[arm].append(ms)
                print(f"{qname} {arm} run{r}: {ms:.0f} ms", flush=True)
        rows_old = [
            tuple(x) for x in fns["old"](spark, args.sf_dir).collect()
        ]
        rows_new = [
            tuple(x) for x in fns["new"](spark, args.sf_dir).collect()
        ]
        out[qname] = {
            "old_ms": round(statistics.median(samples["old"]), 1),
            "new_ms": round(statistics.median(samples["new"]), 1),
            "old_runs": samples["old"],
            "new_runs": samples["new"],
            "speedup": round(
                statistics.median(samples["old"])
                / statistics.median(samples["new"]),
                2,
            ),
            "rows_equal_old_vs_new": sorted(rows_old) == sorted(rows_new),
        }
        print(f"{qname}: {out[qname]}", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
