"""CLI: `python -m novelti_dingo_spark <command>`.

Commands:
  list                         list registered queries (+oracle status)
  run NAME [--sf-dir DIR] [-n N]   run a query, print N rows (default 20)
  explain NAME [--sf-dir DIR]  print the formatted physical plan
  check [NAMES...]             run the DuckDB oracle gate (all or subset)
  bench                        run the headline benchmark
"""

from __future__ import annotations

import argparse
import pathlib
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="novelti_dingo_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    for c in ("run", "explain"):
        p = sub.add_parser(c)
        p.add_argument("name")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if c == "run":
            p.add_argument("-n", type=int, default=20)
    p = sub.add_parser("check")
    p.add_argument("names", nargs="*")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sub.add_parser("bench")
    p = sub.add_parser("mart")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    p = sub.add_parser("curate")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    p.add_argument("--min-quality", type=float, default=0.5)
    args = ap.parse_args(argv)

    from . import registry

    if args.cmd == "list":
        for name, spec in sorted(registry.all_specs().items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:32s} [{oracle:9s}] {spec.survey_rows}")
        return 0
    if args.cmd == "bench":
        # bench.py lives at the repo root, not in the package — resolve it
        # relative to this file so the CLI works from any cwd
        _repo_root = str(pathlib.Path(__file__).resolve().parent.parent)
        if _repo_root not in sys.path:
            sys.path.insert(0, _repo_root)
        import bench

        bench.main()
        return 0
    if args.cmd == "mart":
        from .pipelines import build_order_mart
        from .session import get_spark as _gs

        paths = build_order_mart(_gs("mart"), args.sf_dir, args.out)
        for k, v in paths.items():
            print(f"{k}: {v}")
        return 0
    if args.cmd == "curate":
        import json

        from .pipelines import curate_corpus
        from .session import get_spark as _gs

        stats = curate_corpus(
            _gs("curate"), args.sf_dir, args.out, min_quality=args.min_quality
        )
        print(json.dumps(stats))
        return 0
    if args.cmd == "check":
        _tools = str(pathlib.Path(__file__).resolve().parent.parent / "tools")
        if _tools not in sys.path:
            sys.path.insert(0, _tools)
        from check_oracle import run as check_run

        return check_run(args.sf_dir, args.names or None)

    from .session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    spec = registry.all_specs().get(args.name)
    if spec is None:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    df = spec.fn(spark, args.sf_dir)
    if args.cmd == "explain":
        from .plans import explain_formatted

        print(explain_formatted(df))
    else:
        df.show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
