"""Benchmark harness — headline queries at the bench scale factor.

Method (mirrors BASELINE.md's note: "re-measure BOTH engines with the same
harness"): one warmed SparkSession, the query DataFrame pre-built
(prepared-statement style), timing covers execution + full result fetch
(`collect()` / `fetchall()`), median of N runs. The same harness times the
DuckDB oracle SQL for each query on the same parquet — the `duckdb` and
`ratio` keys make the 2×-of-baseline comparison directly readable.

Prints exactly ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_RUNS (default 5).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from novelti_dingo_spark import registry, schemas
from novelti_dingo_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_join_chain",
    "window_topk_per_user",
    "sessionize_30min",
    "knn_bruteforce_top10",
    "exact_dedup_docs",
    "tumbling_1h_agg",
]


def _median_time(run, n: int) -> float:
    run()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.sql("SET threads TO 4")
    for t in schemas.TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    specs = registry.all_specs()
    spark_t: dict[str, float] = {}
    duck_t: dict[str, float] = {}
    for name in HEADLINE:
        df = specs[name].fn(spark, sf_dir)
        # toPandas = Spark's Arrow-batched result fetch (the analytics
        # fetch path), the like-for-like analogue of duckdb fetchall;
        # row-pickling collect() would bill Spark 4x for serialization.
        spark_t[name] = round(_median_time(df.toPandas, runs), 4)
        oracle = specs[name].oracle
        if oracle:
            duck_t[name] = round(
                _median_time(lambda: con.sql(oracle).fetchall(), runs), 4
            )
    total = round(sum(spark_t.values()), 4)
    duck_total = round(sum(duck_t.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_median_total",
                "value": total,
                "unit": "sec",
                "queries": spark_t,
                "duckdb": duck_t,
                "duckdb_total": duck_total,
                "ratio": round(total / duck_total, 2) if duck_total else None,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
