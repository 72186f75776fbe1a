"""Measured ANN recall@10 vs brute force — the reproducible source of
SCALE.md's recall table, now as a (variant × nprobe) SWEEP instead of a
single point per family.

Ground truth: knn_bruteforce_top10 (exact cosine). Recall@10 =
|approx top-10 ∩ exact top-10| / 10 for query vector 0 over the
uniform-random sf0.01 corpus (the WORST case for quantizers — no
structure for cells/codes to exploit; tests/test_pq.py's
planted-cluster case shows the structured-corpus counterpoint).

Usage: python tools/measure_recall.py [--sf-dir /root/testdata/sf0.01]
Prints one markdown table row per measured point.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from novelti_dingo_spark import registry  # noqa: E402
from novelti_dingo_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_spark("recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    sf = args.sf_dir

    exact = {
        r.vec_id
        for r in specs["knn_bruteforce_top10"].fn(spark, sf).collect()
    }

    def recall(df) -> float:
        got = {r.vec_id for r in df.collect()}
        return len(got & exact) / len(exact)

    from novelti_dingo_spark.operators.ivf import K as IVF_K, ivf_knn
    from novelti_dingo_spark.operators.opq import opq_knn
    from novelti_dingo_spark.operators.pq import (
        ivf_pq_knn,
        ivf_pq_residual_knn,
    )

    rows: list[tuple[str, float, str]] = []

    for np_ in (1, 2, 4, 8):
        rows.append(
            (
                f"IVF exact, nprobe={np_}/{IVF_K}",
                recall(ivf_knn(spark, sf, n_probe=np_)),
                f"512·({np_}/{IVF_K})",
            )
        )
    for np_ in (2, 4, 8):
        rows.append(
            (
                f"IVF-PQ, nprobe={np_}/{IVF_K}",
                recall(ivf_pq_knn(spark, sf, n_probe=np_)),
                f"8·({np_}/{IVF_K})",
            )
        )
    for np_ in (2, 4, 8):
        rows.append(
            (
                f"IVF-PQ residual, nprobe={np_}/{IVF_K}",
                recall(ivf_pq_residual_knn(spark, sf, n_probe=np_)),
                f"8·({np_}/{IVF_K})",
            )
        )
    for np_ in (2, 4, 8):
        rows.append(
            (
                f"IVF-PQ residual + rerank-50, nprobe={np_}/{IVF_K}",
                recall(
                    ivf_pq_residual_knn(spark, sf, n_probe=np_, rerank=50)
                ),
                f"8·({np_}/{IVF_K}) + 512·(50/n)",
            )
        )
    rows.append(
        ("PQ-ADC raw", recall(specs["pq_knn_top10"].fn(spark, sf)), "8")
    )
    rows.append(
        (
            "PQ shortlist-100 → exact rerank",
            recall(specs["pq_rerank_top10"].fn(spark, sf)),
            "8 + 512·(100/n)",
        )
    )
    rows.append(("OPQ-rotated PQ-ADC", recall(opq_knn(spark, sf)), "8"))
    rows.append(
        (
            "int8 quantized kNN",
            recall(specs["knn_quantized_top10"].fn(spark, sf)),
            "64 (int8)",
        )
    )

    print("| variant | recall@10 | bytes touched per vector |")
    print("|---|---|---|")
    for name, r, bytes_ in rows:
        print(f"| {name} | {r:.1f} | {bytes_} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
