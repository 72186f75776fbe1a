"""Dump .explain("formatted") for named queries to plans/r14/<name>_<tag>.txt.

Round-14 deliverable rig: run with --tag before (from the pre-change
tree, e.g. a git worktree at the baseline commit) and --tag after (from
HEAD) so the judge can diff plan shapes against the claims in
OPTIMIZATION_r14.md.

Usage: python tools/capture_plans.py --tag after [--sf-dir DIR] names...
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from novelti_dingo_spark import registry  # noqa: E402
from novelti_dingo_spark.plans.explain import explain_formatted  # noqa: E402
from novelti_dingo_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out-dir", default=os.path.join(REPO_ROOT, "plans", "r14"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        try:
            df = specs[name].fn(spark, args.sf_dir)
            plan = explain_formatted(df)
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building {name}: {type(e).__name__}: {e}"
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
