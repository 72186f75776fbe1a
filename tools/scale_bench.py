"""Empirical scale proof (round-6 verdict, next-round item #1).

The 100 TB arguments in SCALE.md were design-argued and sf0.1-measured;
this harness MEASURES the growth curves on 5x-50x corpora so the
sub-quadratic claims for the dedup/ANN/spatial/lake paths are empirical,
not rhetorical. Everything is deterministic (replica-tagged documents,
splitmix-seeded vectors, key-offset replicas), so curves reproduce.

Corpus construction rules (what makes the curves meaningful):
- documents x K: each replica's words carry a replica tag
  (r<k>_word), so intra-replica shingle structure is EXACTLY the
  original corpus's while cross-replica Jaccard is 0 — true near-dup
  pair count grows LINEARLY in K (constant duplicate density). A naive
  K-fold copy would create K-sized identical clusters and force the
  true pair count itself quadratic, proving nothing about the
  algorithm.
- embeddings: the original 2,000 vectors stay as a prefix (vec_id 0,
  the query parameter, included); new unit vectors are seeded from
  splitmix64(vec_id) — same label distribution, same dimensionality.
- spatial: the CUSTOMER side replicates with key offsets (fresh md5
  coordinates in the same box); the supplier side stays fixed — the
  fixed-catalog / growing-corpus production shape, where true pair
  count grows linearly with the big side.
- lake: one full publish + K append batches of constant size; the
  claim measured is that APPEND cost stays flat as the chain grows
  (O(batch), never O(table)) while compaction pays the one O(table)
  rewrite.

Usage (families separately — the big corpora take minutes):
    python tools/scale_bench.py build  --k 1 5 25
    python tools/scale_bench.py dedup  --k 1 5 25
    python tools/scale_bench.py gemm   --k 1 5
    python tools/scale_bench.py ann    --n 2000 20000 100000
    python tools/scale_bench.py spatial --k 1 5 25
    python tools/scale_bench.py lake   --appends 25
Each run merges its numbers into SCALE_MEASURED.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/ndscale"
OUT_JSON = os.path.join(REPO, "SCALE_MEASURED.json")


def _merge(section: str, payload: dict) -> None:
    data = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            data = json.load(f)
    data.setdefault(section, {}).update(payload)
    with open(OUT_JSON, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"[merged -> {OUT_JSON}] {section}: {json.dumps(payload)[:200]}")


def _med(fn, runs: int = 3) -> float:
    fn()  # warm (plan cache, page cache, codegen)
    xs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 3)


def _fixture_dir(tag: str) -> str:
    d = os.path.join(ROOT, tag)
    os.makedirs(d, exist_ok=True)
    return d


# ------------------------------------------------------------------ build


def build_docs(k: int) -> str:
    out = _fixture_dir(f"docs_x{k}")
    path = os.path.join(out, "documents.parquet")
    if not os.path.exists(path):
        duckdb.sql(
            rf"""
            COPY (
              SELECT d.doc_id + r.k * 1000000 AS doc_id,
                     CASE WHEN r.k = 0 THEN d.text
                          ELSE regexp_replace(
                                 d.text, '([A-Za-z0-9]+)',
                                 'r' || r.k || '_\1', 'g')
                     END AS text,
                     d.lang, d.source,
                     length(CASE WHEN r.k = 0 THEN d.text
                                 ELSE regexp_replace(
                                        d.text, '([A-Za-z0-9]+)',
                                        'r' || r.k || '_\1', 'g') END
                           ) AS n_chars
              FROM '{SRC}/documents.parquet' d,
                   (SELECT unnest(range({k})) AS k) r
              ORDER BY doc_id
            ) TO '{path}' (FORMAT PARQUET)
            """
        )
    return out


def build_embeddings(n: int) -> str:
    out = _fixture_dir(f"emb_{n}")
    path = os.path.join(out, "embeddings.parquet")
    if os.path.exists(path):
        return out
    if n > 10_000_000:
        return _build_embeddings_chunked(n, out, path)
    if not os.path.exists(path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        base = duckdb.sql(
            f"SELECT vec_id, embedding, label "
            f"FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
        ).fetchall()
        n_base = len(base)
        ids = [r[0] for r in base]
        vecs = [r[1] for r in base]
        labels = [r[2] for r in base]
        if n > n_base:
            extra = n - n_base
            # splitmix-style determinism: one PCG stream seeded per
            # corpus size keeps the fixture reproducible
            rng = np.random.default_rng(0xD1460 + n)
            m = rng.standard_normal((extra, 64))
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            ids.extend(range(n_base, n))
            vecs.extend(m.astype(np.float32).tolist())
            labels.extend(int(x) for x in rng.integers(0, 10, extra))
        tbl = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
        pq.write_table(tbl, path)
    return out


def _build_embeddings_chunked(n: int, out: str, path: str) -> str:
    """100M-scale fixture writer (round-12, the one-decade-past-10M
    probe): the in-memory builder above materializes the whole corpus
    as python lists — ~50 GB of float64 plus list overhead at 100M —
    so beyond 10M the fixture streams through a ParquetWriter in 1M-row
    chunks, zero-copy Arrow list arrays from flat numpy buffers.
    Deterministic per n (separate label stream — the >10M fixtures are
    new; sub-10M fixtures keep their historical byte-identity)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(0xD1460 + n)
    rng_labels = np.random.default_rng(0xD1461 + n)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    chunk = 1_000_000
    # 128k-row row groups (~32 MB of float32 vectors): 32 concurrent
    # local tasks each decode one row group — 1M-row groups OOM'd a
    # default heap at 100M (measured round-12; FAILED_READ_FILE ← Java
    # heap space), and small groups parallelize the scan better anyway
    row_group = 131_072
    tmp = path + ".tmp"
    with pq.ParquetWriter(tmp, schema) as w:
        for lo in range(0, n, chunk):
            hi = min(n, lo + chunk)
            m = rng.standard_normal((hi - lo, 64))
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            flat = pa.array(m.astype(np.float32).ravel(), pa.float32())
            offsets = pa.array(
                np.arange(0, (hi - lo + 1) * 64, 64, dtype=np.int32)
            )
            w.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(
                            np.arange(lo, hi, dtype=np.int64)
                        ),
                        "embedding": pa.ListArray.from_arrays(
                            offsets, flat
                        ),
                        "label": pa.array(
                            rng_labels.integers(
                                0, 10, hi - lo, dtype=np.int32
                            )
                        ),
                    },
                    schema=schema,
                ),
                row_group_size=row_group,
            )
    os.replace(tmp, path)
    return out


def build_spatial(k: int) -> str:
    out = _fixture_dir(f"spatial_x{k}")
    cpath = os.path.join(out, "customer.parquet")
    spath = os.path.join(out, "supplier.parquet")
    if not os.path.exists(cpath):
        duckdb.sql(
            f"""
            COPY (
              SELECT c.c_custkey + r.k * 10000000 AS c_custkey,
                     c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
              FROM '{SRC}/customer.parquet' c,
                   (SELECT unnest(range({k})) AS k) r
              ORDER BY c_custkey
            ) TO '{cpath}' (FORMAT PARQUET)
            """
        )
    if not os.path.exists(spath):
        duckdb.sql(
            f"COPY (SELECT * FROM '{SRC}/supplier.parquet') "
            f"TO '{spath}' (FORMAT PARQUET)"
        )
    return out


# --------------------------------------------------------------- families


def _spark():
    from novelti_dingo_spark.session import get_spark

    spark = get_spark("scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _shuffle_written(df) -> dict:
    """Sum shuffle-write bytes/records over every exchange in the
    EXECUTED plan (py4j walk after an action has run the DataFrame).
    The round-12 pre-rank claim is about shuffle VOLUME, not wall —
    this reads the volume out of Spark's own SQL metrics instead of
    asserting it."""
    def walk(jnode, acc):
        m = jnode.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            name, metric = kv._1(), kv._2()
            if name in ("shuffleBytesWritten", "shuffleRecordsWritten"):
                acc[name] = acc.get(name, 0) + metric.value()
        cls = jnode.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            kids = [jnode.executedPlan()]
        elif cls.endswith("QueryStageExec"):
            kids = [jnode.plan()]
        else:
            ch = jnode.children()
            kids = [ch.apply(i) for i in range(ch.size())]
        for k in kids:
            walk(k, acc)
        return acc

    acc = walk(df._jdf.queryExecution().executedPlan(), {})
    return {
        "shuffle_bytes": int(acc.get("shuffleBytesWritten", 0)),
        "shuffle_records": int(acc.get("shuffleRecordsWritten", 0)),
    }


def _timed_count(df) -> tuple[int, float]:
    """One timed .count() — cold-enough single runs are the right
    trade at minute-scale corpora (JIT/codegen noise is ~1-2 s,
    invisible against the 1x/5x/25x curve levels being measured)."""
    t0 = time.perf_counter()
    n = df.count()
    return n, round(time.perf_counter() - t0, 3)


def run_dedup(ks: list[int]) -> None:
    from novelti_dingo_spark.operators.dedup import (
        jaccard_pairs_prefix_filter,
        lsh_candidate_pairs,
        minhash_lsh_pairs,
    )

    spark = _spark()
    res = {}
    for k in ks:
        d = build_docs(k)
        n_docs = 5000 * k
        n_cand, t_cand = _timed_count(lsh_candidate_pairs(spark, d))
        n_pairs, t_mh = _timed_count(minhash_lsh_pairs(spark, d))
        n_pf, t_pf = _timed_count(jaccard_pairs_prefix_filter(spark, d))
        all_pairs = n_docs * (n_docs - 1) // 2
        res[f"x{k}"] = {
            "n_docs": n_docs,
            "lsh_candidates": n_cand,
            "lsh_candidates_wall_s": t_cand,
            "candidate_frac_of_allpairs": round(n_cand / all_pairs, 8),
            "minhash_true_pairs": n_pairs,
            "minhash_wall_s": t_mh,
            "prefix_filter_pairs": n_pf,
            "prefix_filter_wall_s": t_pf,
        }
        print(f"x{k}: {res[f'x{k}']}")
    _merge("dedup", res)


def run_gemm(ks: list[int]) -> None:
    from novelti_dingo_spark.operators.dedup import ngram_jaccard_pairs

    spark = _spark()
    res = {}
    for k in ks:
        d = build_docs(k)
        _n, t = _timed_count(ngram_jaccard_pairs(spark, d))
        res[f"x{k}"] = {"n_docs": 5000 * k, "gemm_wall_s": t}
        print(f"x{k}: {res[f'x{k}']}")
    _merge("gemm_jaccard", res)


def run_ann(ns: list[int]) -> None:
    """ANN study with BUILD and PROBE isolated (round-8 verdict #2: the
    old single wall bucketed training+probe, so the amortized serving
    cost — the number that decides whether an index ever pays for
    itself — was never measured).

    Per corpus size:
    - build_s: train k-means (k_cells) + publish the CELL-PARTITIONED
      index snapshot — one-time cost, amortized over every query.
    - probe_s: median serving query against the pinned snapshot
      (driver-side routing over k centroids, partition-pruned scan of
      the n_probe cells, exact in-cell scoring = probe+rerank).
    - brute_s: median in-memory brute scan (knn_bruteforce_top10's
      pinned-corpus serving path) — the exact baseline the probe must
      beat for the index to have a winning regime.
    - recall_at_10: |ivf top10 ∩ brute top10| / 10.
    """
    import shutil

    from novelti_dingo_spark.operators.ivf import (
        ivf_knn_from_index,
        publish_ivf_index,
    )
    from novelti_dingo_spark.operators.similarity import knn_bruteforce_top10

    spark = _spark()
    k_cells, n_probe = 32, 4
    res = {}
    for n in ns:
        d = build_embeddings(n)
        qv = duckdb.sql(
            f"SELECT embedding FROM '{d}/embeddings.parquet' WHERE vec_id = 0"
        ).fetchone()[0]
        qv = [float(x) for x in qv]
        base = os.path.join(d, "ivf_index")
        shutil.rmtree(base, ignore_errors=True)
        t0 = time.perf_counter()
        publish_ivf_index(
            spark, d, base, k_cells=k_cells, partition_postings=True
        )
        build_s = round(time.perf_counter() - t0, 3)

        def probe():
            return ivf_knn_from_index(
                spark, base, qv, k=10, n_probe=n_probe, exclude_vec_id=0
            ).collect()

        def brute():
            return knn_bruteforce_top10(spark, d).collect()

        probe_s = _med(probe)
        brute_s = _med(brute)
        got = {r.vec_id for r in probe()}
        want = {r.vec_id for r in brute()}
        res[str(n)] = {
            "n_vectors": n,
            "k_cells": k_cells,
            "n_probe": n_probe,
            "build_s": build_s,
            "probe_s": probe_s,
            "brute_s": brute_s,
            "recall_at_10": round(len(got & want) / 10, 2),
            "breakeven_queries": (
                round(build_s / (brute_s - probe_s), 1)
                if brute_s > probe_s
                else None  # probe never beats brute → no winning regime
            ),
        }
        print(f"{n}: {res[str(n)]}")
    _merge("ann", res)


def build_docs_skewed(k: int, n_hot: int = 1500) -> str:
    """docs ×k PLUS n_hot near-identical boilerplate docs (one shared
    paragraph + a unique tail token): their minhash signatures agree on
    most bands, so a handful of LSH buckets hold ~n_hot docs each —
    the deliberately skewed corpus for the band-join study."""
    out = _fixture_dir(f"docs_x{k}_hot{n_hot}")
    path = os.path.join(out, "documents.parquet")
    if not os.path.exists(path):
        boiler = " ".join(
            f"boilerplate legal footer clause {i} all rights reserved"
            for i in range(40)
        )
        duckdb.sql(
            rf"""
            COPY (
              SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
              FROM '{SRC}/documents.parquet' d
              UNION ALL
              SELECT 90000000 + h.k AS doc_id,
                     '{boiler} unique_tail_' || h.k AS text,
                     'en' AS lang, 'boiler' AS source,
                     length('{boiler}') + 15 AS n_chars
              FROM (SELECT unnest(range({n_hot})) AS k) h
              ORDER BY doc_id
            ) TO '{path}' (FORMAT PARQUET)
            """
        )
    return out


def run_skew_lsh(n_hot: int = 1500) -> None:
    """Hot-bucket LSH study (the band-join twin of round-7's spatial
    hot-cell study): n_hot near-identical docs flood a few buckets, so
    the plain band self-join puts ~n_hot² pair-rows in single tasks.
    Measures plain (AQE off), AQE skew handling, and the SALTED join
    (lsh_candidate_pairs_salted) — with identical candidate-set
    checksums asserted across all three."""
    from novelti_dingo_spark.operators.dedup import (
        _lsh_bands,
        lsh_candidate_pairs,
        lsh_candidate_pairs_salted,
    )
    from pyspark.sql import functions as F

    spark = _spark()
    d = build_docs_skewed(1, n_hot)
    bands = _lsh_bands(spark, d, 128, 32)
    hot = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .head()
    )

    def checksum(df):
        # bit_xor: order-independent, overflow-free pair-set fingerprint
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(doc_a, doc_b))").alias("h"),
        ).head()

    res = {"n_hot": n_hot, "max_bucket": int(hot.n)}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.perf_counter()
    c_plain = checksum(lsh_candidate_pairs(spark, d))
    res["plain_aqe_off_s"] = round(time.perf_counter() - t0, 3)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t0 = time.perf_counter()
    c_aqe = checksum(lsh_candidate_pairs(spark, d))
    res["plain_aqe_on_s"] = round(time.perf_counter() - t0, 3)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.perf_counter()
    c_salt = checksum(lsh_candidate_pairs_salted(spark, d))
    res["salted_aqe_off_s"] = round(time.perf_counter() - t0, 3)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # the production treatment: CAP hot buckets (recall-affecting by
    # design — the dropped pairs are the boilerplate flood itself,
    # which the exact-hash dedup path handles at O(m))
    from novelti_dingo_spark.operators.dedup import (
        lsh_candidate_pairs_capped,
    )

    t0 = time.perf_counter()
    c_cap = checksum(lsh_candidate_pairs_capped(spark, d, max_bucket=200))
    res["capped_s"] = round(time.perf_counter() - t0, 3)
    res["capped_candidates"] = int(c_cap.n)
    res["n_candidates"] = int(c_plain.n)
    # where capping actually pays: the EXACT-VERIFY stage is
    # |candidates| gram-set intersections — the flood's 1M+ pairs all
    # reach it, the capped 1.6k don't. End-to-end verified-pairs walls:
    from novelti_dingo_spark.functions.text_funcs import token_bigrams
    from novelti_dingo_spark.operators.dedup import JACCARD_THRESHOLD

    grams = (
        spark.read.parquet(f"{d}/documents.parquet")
        .select(
            "doc_id",
            F.array_distinct(token_bigrams("text")).alias("grams"),
        )
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))

    def verify(cand):
        inter = F.size(F.array_intersect("ga", "gb"))
        union = F.size(F.array_union("ga", "gb"))
        return (
            cand.join(ga, "doc_a").join(gb, "doc_b")
            .filter(inter * F.lit(1.0) / union >= JACCARD_THRESHOLD)
            .count()
        )

    t0 = time.perf_counter()
    res["plain_verified_pairs"] = int(
        verify(lsh_candidate_pairs(spark, d))
    )
    res["plain_end_to_end_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    res["capped_verified_pairs"] = int(
        verify(lsh_candidate_pairs_capped(spark, d, max_bucket=200))
    )
    res["capped_end_to_end_s"] = round(time.perf_counter() - t0, 3)
    assert (c_plain.n, c_plain.h) == (c_aqe.n, c_aqe.h) == (c_salt.n, c_salt.h), (
        "candidate sets diverged across skew treatments"
    )
    res["checksums_identical"] = True
    print(res)
    _merge("skew_lsh", res)


def run_ann_pq(ns: list[int]) -> None:
    """The COMPOSED index point: IVF routing × PQ bytes — swept over
    the ENCODING variants (round-10 verdict #1: the raw 32-bit
    composition measured recall@10 = 0.0 at 1M):

      raw_k16  — round-9 format (PQ on raw vectors, 4-bit codes)
      res_k16  — residual encoding, same 32-bit budget
      res_k256 — residual + 1-byte codes (64 bits/vector; sampled
                 training + numpy encoder — the production rate)

    For each (n, variant): build wall, amortized ADC-only and
    ADC+exact-rerank probe walls (median over the query set), and
    recall@10 of BOTH outputs vs exact — AVERAGED over N_QUERIES query
    vectors (a single query's recall has 0.1 granularity and is noise;
    the round-9 sweep's one-query numbers wobbled ±0.2). Published
    indexes are REUSED across runs (content-keyed fixture dirs), so a
    re-measure doesn't re-pay the builds."""
    from novelti_dingo_spark.operators.pq import (
        ivfpq_knn_from_index,
        publish_ivfpq_index,
    )
    from novelti_dingo_spark.sources import lakefs
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    k_cells, n_probe, n_queries = 32, 4, 10
    variants = [
        ("raw_k16", dict(residual=False, pq_k=16)),
        ("res_k16", dict(residual=True, pq_k=16)),
        ("res_k256", dict(residual=True, pq_k=256)),
    ]
    res = {}
    for n in ns:
        d = build_embeddings(n)
        qvs = {
            int(vid): [float(x) for x in emb]
            for vid, emb in duckdb.sql(
                f"SELECT vec_id, embedding FROM '{d}/embeddings.parquet' "
                f"WHERE vec_id < {n_queries} ORDER BY vec_id"
            ).fetchall()
        }
        # exact ground truth per query (DuckDB dot product, self excluded)
        truth = {}
        for vid, qv in qvs.items():
            qlit = "[" + ",".join(repr(x) for x in qv) + "]::FLOAT[]"
            truth[vid] = {
                r[0]
                for r in duckdb.sql(
                    f"SELECT vec_id FROM '{d}/embeddings.parquet' "
                    f"WHERE vec_id <> {vid} "
                    f"ORDER BY list_dot_product(embedding, {qlit}) DESC, "
                    f"vec_id LIMIT 10"
                ).fetchall()
            }
        e = load_table(spark, d, "embeddings")
        per_variant = {}
        for tag, kw in variants:
            if tag == "raw_k16" and n >= 1_000_000:
                # round-9 already measured the raw composition at 1M
                # (SCALE_MEASURED.json ann_ivfpq."1000000": recall 0.0,
                # build 2313 s) — don't re-pay a 38-minute build to
                # reconfirm the format this sweep exists to replace
                continue
            base = os.path.join(d, f"ivfpq_index_{tag}")
            if lakefs.exists(spark, f"{base}/LATEST"):
                build_s = None  # reused from a prior run's publish
            else:
                t0 = time.perf_counter()
                publish_ivfpq_index(spark, d, base, k_cells=k_cells, **kw)
                build_s = round(time.perf_counter() - t0, 3)

            def adc(vid, qv):
                return ivfpq_knn_from_index(
                    spark, base, qv, n_probe=n_probe, exclude_vec_id=vid
                ).collect()

            def rerank(vid, qv):
                return ivfpq_knn_from_index(
                    spark, base, qv, n_probe=n_probe, shortlist=100,
                    rerank=e, exclude_vec_id=vid,
                ).collect()

            adc_walls, rr_walls, adc_rec, rr_rec = [], [], [], []
            for vid, qv in qvs.items():
                t0 = time.perf_counter()
                got_adc = {r.vec_id for r in adc(vid, qv)}
                adc_walls.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                got_rr = {r.vec_id for r in rerank(vid, qv)}
                rr_walls.append(time.perf_counter() - t0)
                adc_rec.append(len(got_adc & truth[vid]) / 10)
                rr_rec.append(len(got_rr & truth[vid]) / 10)
            per_variant[tag] = {
                "build_s": build_s,
                "n_queries": n_queries,
                "adc_probe_s": round(statistics.median(adc_walls), 3),
                "rerank_probe_s": round(statistics.median(rr_walls), 3),
                "recall_at_10_adc": round(
                    statistics.mean(adc_rec), 3
                ),
                "recall_at_10_reranked": round(
                    statistics.mean(rr_rec), 3
                ),
            }
            print(f"{n}/{tag}: {per_variant[tag]}")
        res[str(n)] = {
            "n_vectors": n,
            "k_cells": k_cells,
            "n_probe": n_probe,
            **per_variant,
        }
    _merge("ann_ivfpq", res)


def _ann_truth(d: str, n_queries: int = 10):
    """(query vectors, exact top-10 ground truth) via DuckDB — shared
    by the recall harnesses."""
    qvs = {
        int(vid): [float(x) for x in emb]
        for vid, emb in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{d}/embeddings.parquet' "
            f"WHERE vec_id < {n_queries} ORDER BY vec_id"
        ).fetchall()
    }
    truth = {}
    for vid, qv in qvs.items():
        qlit = "[" + ",".join(repr(x) for x in qv) + "]::FLOAT[]"
        truth[vid] = {
            r[0]
            for r in duckdb.sql(
                f"SELECT vec_id FROM '{d}/embeddings.parquet' "
                f"WHERE vec_id <> {vid} "
                f"ORDER BY list_dot_product(embedding, {qlit}) DESC, "
                f"vec_id LIMIT 10"
            ).fetchall()
        }
    return qvs, truth


def _probe_recall(spark, base, qvs, truth, e, n_probe: int) -> dict:
    """Median probe walls + mean recall@10 (ADC and reranked) over the
    query set — the run_ann_pq measurement, reusable."""
    from novelti_dingo_spark.operators.pq import ivfpq_knn_from_index

    adc_walls, rr_walls, adc_rec, rr_rec = [], [], [], []
    for vid, qv in qvs.items():
        t0 = time.perf_counter()
        got_adc = {
            r.vec_id
            for r in ivfpq_knn_from_index(
                spark, base, qv, n_probe=n_probe, exclude_vec_id=vid
            ).collect()
        }
        adc_walls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        got_rr = {
            r.vec_id
            for r in ivfpq_knn_from_index(
                spark, base, qv, n_probe=n_probe, shortlist=100,
                rerank=e, exclude_vec_id=vid,
            ).collect()
        }
        rr_walls.append(time.perf_counter() - t0)
        adc_rec.append(len(got_adc & truth[vid]) / 10)
        rr_rec.append(len(got_rr & truth[vid]) / 10)
    return {
        "adc_probe_s": round(statistics.median(adc_walls), 3),
        "rerank_probe_s": round(statistics.median(rr_walls), 3),
        "recall_at_10_adc": round(statistics.mean(adc_rec), 3),
        "recall_at_10_reranked": round(statistics.mean(rr_rec), 3),
    }


def build_embeddings_aniso(n: int, decay: float = 0.75) -> str:
    """An ANISOTROPIC fixture — per-dimension std (j+1)^-decay, then
    normalized: variance concentrates in the leading dimensions, so
    plain PQ's contiguous subspaces are unbalanced (the leading
    subspace carries nearly all signal; trailing codebooks quantize
    noise). This is the regime OPQ's rotation exists for."""
    out = _fixture_dir(f"emba_{n}_{decay}")
    path = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(0xA150 + n)
        std = (np.arange(64, dtype=np.float64) + 1.0) ** (-decay)
        vecs = rng.standard_normal((n, 64)) * std[None, :]
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    [int(i % 10) for i in range(n)], pa.int32()
                ),
            }
        )
        pq.write_table(tbl, path)
    return out


def run_ann_opq(ns: list[int]) -> None:
    """Where the PERSISTED OPQ rotation moves recall (round-11): the
    res/opq_res pairs at k16 and k256 on the uniform fixture (isotropic
    — R should tie) and the anisotropic fixture (variance concentrated
    in leading dims — R's redistribution should pay). Same 10-query
    exact-ground-truth harness as run_ann_pq."""
    from novelti_dingo_spark.operators.pq import publish_ivfpq_index
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    k_cells, n_probe = 32, 4
    variants = [
        ("res_k16", dict(residual=True, pq_k=16)),
        ("opq_res_k16", dict(residual=True, pq_k=16, opq=True)),
        ("res_k256", dict(residual=True, pq_k=256)),
        ("opq_res_k256", dict(residual=True, pq_k=256, opq=True)),
    ]
    res = {}
    for n in ns:
        for fam, d in (
            ("uniform", build_embeddings(n)),
            ("aniso", build_embeddings_aniso(n)),
        ):
            qvs, truth = _ann_truth(d)
            e = load_table(spark, d, "embeddings")
            per_variant = {}
            for tag, kw in variants:
                base = os.path.join(d, f"ivfpq_opq_sweep_{tag}")
                build_s = None
                if not os.path.exists(os.path.join(base, "LATEST")):
                    t0 = time.perf_counter()
                    publish_ivfpq_index(
                        spark, d, base, k_cells=k_cells, **kw
                    )
                    build_s = round(time.perf_counter() - t0, 3)
                per_variant[tag] = {
                    "build_s": build_s,
                    **_probe_recall(spark, base, qvs, truth, e, n_probe),
                }
                print(f"{n}/{fam}/{tag}: {per_variant[tag]}")
            res[f"{fam}_{n}"] = {
                "n_vectors": n,
                "fixture": fam,
                "k_cells": k_cells,
                "n_probe": n_probe,
                "n_queries": 10,
                **per_variant,
            }
    _merge("ann_ivfpq_opq", res)


def run_ann_clustered_sweep(ns: list[int]) -> None:
    """The SERVING DIAL chart on the clustered fixture (round-11
    follow-on to ann_clustered's single operating point): recall@10 ×
    probe wall over n_probe ∈ {2,4,8} for both code rates, QUERY-ONLY
    (reuses the published ann_clustered indexes — n_probe is a
    query-time knob, the whole point of the routing/IVF split)."""
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    res = {}
    for n in ns:
        d = build_embeddings_clustered(n)
        qvs, truth = _ann_truth(d)
        e = load_table(spark, d, "embeddings")
        for tag in ("res_k16", "res_k256"):
            base = os.path.join(d, f"ivfpq_{tag}")
            if not os.path.exists(os.path.join(base, "LATEST")):
                from novelti_dingo_spark.operators.pq import (
                    publish_ivfpq_index,
                )

                publish_ivfpq_index(
                    spark, d, base, k_cells=32,
                    pq_k=16 if tag == "res_k16" else 256,
                )
            for n_probe in (2, 4, 8):
                key = f"{tag}_probe{n_probe}_{n}"
                res[key] = {
                    "n_vectors": n,
                    "variant": tag,
                    "n_probe": n_probe,
                    **_probe_recall(spark, base, qvs, truth, e, n_probe),
                }
                print(f"{key}: {res[key]}")
    _merge("ann_clustered_nprobe", res)


def run_ann_batch(ns: list[int], n_queries: int = 16) -> None:
    """Batched vs sequential IVF-PQ serving (round-11): Q corpus-vector
    queries answered as ONE pruned scan + window rank
    (ivfpq_knn_batch_from_index) vs Q single-query jobs. The single
    path's wall is dominated by per-job overhead at local scale — the
    batch amortizes it Q ways; on a cluster the same shape amortizes
    scheduler + scan setup. Uses the run_ann_sampled index if present
    (publishes one otherwise)."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.operators.pq import (
        ivfpq_knn_batch_from_index,
        ivfpq_knn_from_index,
        publish_ivfpq_index,
    )
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    res = {}
    for n in ns:
        d = build_embeddings(n)
        base = os.path.join(d, "ivfpq_index_sampled_thr")
        if not os.path.exists(os.path.join(base, "LATEST")):
            publish_ivfpq_index(spark, d, base, k_cells=32, pq_k=256)
        e = load_table(spark, d, "embeddings")
        queries = {
            int(r.vec_id): [float(x) for x in r.embedding]
            for r in e.filter(F.col("vec_id") < n_queries).collect()
        }

        def sequential():
            for qid, qv in queries.items():
                ivfpq_knn_from_index(
                    spark, base, qv, n_probe=4, exclude_vec_id=qid
                ).collect()

        def batched():
            ivfpq_knn_batch_from_index(
                spark, base, queries, n_probe=4, exclude_self=True
            ).collect()

        def sequential_rerank():
            for qid, qv in queries.items():
                ivfpq_knn_from_index(
                    spark, base, qv, n_probe=4, shortlist=100,
                    rerank=e, exclude_vec_id=qid,
                ).collect()

        def batched_rerank():
            ivfpq_knn_batch_from_index(
                spark, base, queries, n_probe=4, shortlist=100,
                rerank=e, exclude_self=True,
            ).collect()

        seq_s = _med(sequential)
        bat_s = _med(batched)
        seq_rr_s = _med(sequential_rerank)
        bat_rr_s = _med(batched_rerank)
        # shuffle volume through the per-query window (round-12):
        # Catalyst's WindowGroupLimit(Partial) bounds the exchange to
        # partitions·Q·k survivor rows — measure records/bytes written
        # and the candidate volume they replace, instead of asserting
        d_on = ivfpq_knn_batch_from_index(
            spark, base, queries, n_probe=4, exclude_self=True
        )
        d_on.collect()
        sw = _shuffle_written(d_on)
        n_codes = duckdb.sql(
            f"SELECT count(*) FROM '{d}/embeddings.parquet'"
        ).fetchone()[0]
        res[str(n)] = {
            "n_vectors": n,
            "n_queries": n_queries,
            "n_probe": 4,
            "sequential_s": seq_s,
            "batched_s": bat_s,
            "speedup": round(seq_s / bat_s, 2) if bat_s else None,
            "sequential_rerank_s": seq_rr_s,
            "batched_rerank_s": bat_rr_s,
            "speedup_rerank": (
                round(seq_rr_s / bat_rr_s, 2) if bat_rr_s else None
            ),
            # total shuffle written by the batched serve (window group
            # limit survivors + final orderBy rows); contrast with the
            # approximate candidate volume Q·(n_probe/32)·n the window
            # would shuffle without the rank-limit pushdown
            "serve_shuffle_records": sw["shuffle_records"],
            "serve_shuffle_bytes": sw["shuffle_bytes"],
            "approx_candidate_rows": int(
                n_queries * 4 / 32 * n_codes
            ),
        }
        print(f"{n}/batch: {res[str(n)]}")
    _merge("ann_batch_serve", res)


def run_ann_sampled(ns: list[int]) -> None:
    """Round-11 re-measure of the SAMPLED-TRAINER composed build after
    the TakeOrdered→threshold-filter sampler swap (hash_sample.py):
    publish_ivfpq_index with the new defaults (sampled coarse trainer
    over a 256·k_cells threshold sample, pq_k=256 numpy trainer over a
    2^16 threshold sample), recall measured the same way as run_ann_pq
    (averaged over N_QUERIES queries vs exact DuckDB ground truth).
    Builds are NEVER fixture-reused here — the build wall IS the
    number under test; the round-10 TakeOrdered build (1212 s at 1M,
    SCALE_MEASURED.json ann_ivfpq_sampled_trainer.build_s_takeordered)
    is the comparison line."""
    from novelti_dingo_spark.operators.pq import (
        ivfpq_knn_from_index,
        publish_ivfpq_index,
    )
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    k_cells, n_probe, n_queries = 32, 4, 10
    res = {}
    for n in ns:
        d = build_embeddings(n)
        qvs = {
            int(vid): [float(x) for x in emb]
            for vid, emb in duckdb.sql(
                f"SELECT vec_id, embedding FROM '{d}/embeddings.parquet' "
                f"WHERE vec_id < {n_queries} ORDER BY vec_id"
            ).fetchall()
        }
        truth = {}
        for vid, qv in qvs.items():
            qlit = "[" + ",".join(repr(x) for x in qv) + "]::FLOAT[]"
            truth[vid] = {
                r[0]
                for r in duckdb.sql(
                    f"SELECT vec_id FROM '{d}/embeddings.parquet' "
                    f"WHERE vec_id <> {vid} "
                    f"ORDER BY list_dot_product(embedding, {qlit}) DESC, "
                    f"vec_id LIMIT 10"
                ).fetchall()
            }
        base = os.path.join(d, "ivfpq_index_sampled_thr")
        if os.path.exists(base):
            import shutil

            shutil.rmtree(base)  # the build wall is the measurement
        t0 = time.perf_counter()
        timings: dict = {}
        publish_ivfpq_index(
            spark, d, base, k_cells=k_cells, pq_k=256, timings=timings
        )  # round-11 defaults: residual + sampled trainer + threshold
        build_s = round(time.perf_counter() - t0, 3)
        e = load_table(spark, d, "embeddings")
        adc_walls, rr_walls, adc_rec, rr_rec = [], [], [], []
        for vid, qv in qvs.items():
            t0 = time.perf_counter()
            got_adc = {
                r.vec_id
                for r in ivfpq_knn_from_index(
                    spark, base, qv, n_probe=n_probe, exclude_vec_id=vid
                ).collect()
            }
            adc_walls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            got_rr = {
                r.vec_id
                for r in ivfpq_knn_from_index(
                    spark, base, qv, n_probe=n_probe, shortlist=100,
                    rerank=e, exclude_vec_id=vid,
                ).collect()
            }
            rr_walls.append(time.perf_counter() - t0)
            adc_rec.append(len(got_adc & truth[vid]) / 10)
            rr_rec.append(len(got_rr & truth[vid]) / 10)
        res[str(n)] = {
            "n_vectors": n,
            "k_cells": k_cells,
            "n_probe": n_probe,
            "n_queries": n_queries,
            "pq_k": 256,
            "trainer": "sampled",
            "sampler": "hash_threshold",
            "coarse_sample": 256 * k_cells,
            "build_s": build_s,
            # per-phase walls (round-12): coarse_train/pq_train are the
            # eager driver-side trainers (pq_train includes the sample
            # pass its threshold filter evaluates); write is the fused
            # assign+encode+cell-partitioned publish job — the candidate
            # superlinear phase the 100M decade probes
            "phase_walls": timings,
            "adc_probe_s": round(statistics.median(adc_walls), 3),
            "rerank_probe_s": round(statistics.median(rr_walls), 3),
            "recall_at_10_adc": round(statistics.mean(adc_rec), 3),
            "recall_at_10_reranked": round(statistics.mean(rr_rec), 3),
        }
        if n == 1_000_000:
            # the round-10 TakeOrdered-sampler build this swap replaces
            res[str(n)]["build_s_takeordered"] = 1212.018
        print(f"{n}/sampled_thr: {res[str(n)]}")
    _merge("ann_ivfpq_sampled_trainer", res)


def build_embeddings_clustered(
    n: int, n_clusters: int = 1024, noise: float = 0.15
) -> str:
    """A CLUSTERED 1M-scale embedding fixture — the distribution real
    embedding corpora actually have (the uniform-sphere fixture is the
    worst case for PQ: near-orthogonal gaps leave nothing within-cell
    to quantize; SCALE.md's recall-ceiling caveat). Each vector =
    normalize(center[i % n_clusters] + N(0, noise²)) with centers on
    the unit sphere — deterministic per (n, n_clusters, noise)."""
    out = _fixture_dir(f"embc_{n}_{n_clusters}_{noise}")
    path = os.path.join(out, "embeddings.parquet")
    if os.path.exists(path):
        return out
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(0xC105 + n)
    centers = rng.standard_normal((n_clusters, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    if n > 10_000_000:
        # 100M-decade path (round-13): stream through a ParquetWriter
        # in 1M-row chunks with 128k-row row groups — the same shape
        # as _build_embeddings_chunked (an in-memory build is ~50 GB
        # of float64 at 100M, and 1M-row groups OOM the 32-way scan)
        schema = pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        )
        chunk, row_group = 1_000_000, 131_072
        tmp = path + ".tmp"
        with pq.ParquetWriter(tmp, schema) as w:
            for lo in range(0, n, chunk):
                hi = min(n, lo + chunk)
                idx = np.arange(lo, hi) % n_clusters
                v = centers[idx] + noise * rng.standard_normal(
                    (hi - lo, 64)
                )
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                flat = pa.array(v.astype(np.float32).ravel(), pa.float32())
                offsets = pa.array(
                    np.arange(0, (hi - lo + 1) * 64, 64, dtype=np.int32)
                )
                w.write_table(
                    pa.table(
                        {
                            "vec_id": pa.array(
                                np.arange(lo, hi, dtype=np.int64)
                            ),
                            "embedding": pa.ListArray.from_arrays(
                                offsets, flat
                            ),
                            "label": pa.array(
                                (np.arange(lo, hi) % 10).astype(np.int32)
                            ),
                        },
                        schema=schema,
                    ),
                    row_group_size=row_group,
                )
        os.replace(tmp, path)
        return out
    vecs = np.empty((n, 64), dtype=np.float64)
    chunk = 1 << 17
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        idx = np.arange(lo, hi) % n_clusters
        v = centers[idx] + noise * rng.standard_normal((hi - lo, 64))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        vecs[lo:hi] = v
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
            "label": pa.array(
                [int(i % 10) for i in range(n)], pa.int32()
            ),
        }
    )
    pq.write_table(tbl, path)
    return out


def run_ann_clustered(ns: list[int]) -> None:
    """Recall@10 of the composed residual index on CLUSTERED data at
    scale — the honest headline number a production corpus would see
    (round-10 verdict #6: the planted-cluster recall-1.0 proof was
    pytest-scale only; the 1M sweep used the uniform worst case).
    Same harness as run_ann_pq (10 queries, exact DuckDB ground truth)
    over the planted-cluster generator above, at res_k16 and res_k256
    with the round-11 default build path."""
    from novelti_dingo_spark.operators.pq import (
        ivfpq_knn_from_index,
        publish_ivfpq_index,
    )
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    k_cells, n_probe, n_queries = 32, 4, 10
    res = {}
    for n in ns:
        d = build_embeddings_clustered(n)
        qvs = {
            int(vid): [float(x) for x in emb]
            for vid, emb in duckdb.sql(
                f"SELECT vec_id, embedding FROM '{d}/embeddings.parquet' "
                f"WHERE vec_id < {n_queries} ORDER BY vec_id"
            ).fetchall()
        }
        truth = {}
        for vid, qv in qvs.items():
            qlit = "[" + ",".join(repr(x) for x in qv) + "]::FLOAT[]"
            truth[vid] = {
                r[0]
                for r in duckdb.sql(
                    f"SELECT vec_id FROM '{d}/embeddings.parquet' "
                    f"WHERE vec_id <> {vid} "
                    f"ORDER BY list_dot_product(embedding, {qlit}) DESC, "
                    f"vec_id LIMIT 10"
                ).fetchall()
            }
        e = load_table(spark, d, "embeddings")
        per_variant = {}
        # at the 100M decade one build is ~90 min (write-phase bound,
        # SCALE.md round-12) — probe the QUALITY variant only there;
        # the small-n sweep keeps both code rates
        variants = (
            (("res_k256", 256),)
            if n > 10_000_000
            else (("res_k16", 16), ("res_k256", 256))
        )
        for tag, pq_k in variants:
            base = os.path.join(d, f"ivfpq_{tag}")
            build_s = None
            timings: dict = {}
            if not os.path.exists(os.path.join(base, "LATEST")):
                t0 = time.perf_counter()
                publish_ivfpq_index(
                    spark, d, base, k_cells=k_cells, pq_k=pq_k,
                    timings=timings,
                )
                build_s = round(time.perf_counter() - t0, 3)
            adc_walls, rr_walls, adc_rec, rr_rec = [], [], [], []
            for vid, qv in qvs.items():
                t0 = time.perf_counter()
                got_adc = {
                    r.vec_id
                    for r in ivfpq_knn_from_index(
                        spark, base, qv, n_probe=n_probe, exclude_vec_id=vid
                    ).collect()
                }
                adc_walls.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                got_rr = {
                    r.vec_id
                    for r in ivfpq_knn_from_index(
                        spark, base, qv, n_probe=n_probe, shortlist=100,
                        rerank=e, exclude_vec_id=vid,
                    ).collect()
                }
                rr_walls.append(time.perf_counter() - t0)
                adc_rec.append(len(got_adc & truth[vid]) / 10)
                rr_rec.append(len(got_rr & truth[vid]) / 10)
            per_variant[tag] = {
                "build_s": build_s,
                "phase_walls": timings or None,
                "adc_probe_s": round(statistics.median(adc_walls), 3),
                "rerank_probe_s": round(statistics.median(rr_walls), 3),
                "recall_at_10_adc": round(statistics.mean(adc_rec), 3),
                "recall_at_10_reranked": round(statistics.mean(rr_rec), 3),
            }
            print(f"{n}/clustered/{tag}: {per_variant[tag]}")
        res[str(n)] = {
            "n_vectors": n,
            "n_clusters": 1024,
            "noise": 0.15,
            "k_cells": k_cells,
            "n_probe": n_probe,
            "n_queries": n_queries,
            **per_variant,
        }
    _merge("ann_ivfpq_clustered", res)


def run_ann_geometry(ns: list[int]) -> None:
    """Recall@10 vs INDEX GEOMETRY on clustered corpora (round-14 —
    the round-13 verdict's #4: the 100M probe proved fixed k_cells=32
    starves the shortlist; geometry must scale with N). Per corpus
    size, build the quality variant (residual, pq_k=256) under TWO
    geometries — the legacy fixed (32 cells, n_probe 4) and
    ivf.default_ann_geometry's ≈4·√N rule — against the same planted-
    cluster fixture, exact DuckDB ground truth, 10 queries, rerank=100.
    Merges under `ann_ivfpq_geometry`, one sub-entry per geometry, so
    the recall-vs-build curve is recorded instead of asserted."""
    from novelti_dingo_spark.operators.ivf import default_ann_geometry
    from novelti_dingo_spark.operators.pq import (
        ivfpq_knn_from_index,
        publish_ivfpq_index,
    )
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    n_queries = 10
    res = {}
    for n in ns:
        d = build_embeddings_clustered(n)
        qvs, truth = _ann_truth(d, n_queries)
        e = load_table(spark, d, "embeddings")
        auto_k, auto_np = default_ann_geometry(n)
        geometries = [("g32", 32, 4)]
        if (auto_k, auto_np) != (32, 4):
            geometries.append((f"g{auto_k}", auto_k, auto_np))
        per_geom = {}
        for tag, k_cells, n_probe in geometries:
            base = os.path.join(d, f"ivfpq_res_k256_{tag}")
            legacy = os.path.join(d, "ivfpq_res_k256")
            if tag == "g32" and os.path.exists(
                os.path.join(legacy, "LATEST")
            ) and not os.path.exists(base):
                base = legacy  # reuse the round-13 build at this n
            build_s = None
            timings: dict = {}
            if not os.path.exists(os.path.join(base, "LATEST")):
                t0 = time.perf_counter()
                publish_ivfpq_index(
                    spark, d, base, k_cells=k_cells, pq_k=256,
                    timings=timings,
                )
                build_s = round(time.perf_counter() - t0, 3)
            adc_walls, rr_walls, adc_rec, rr_rec = [], [], [], []
            for vid, qv in qvs.items():
                t0 = time.perf_counter()
                got_adc = {
                    r.vec_id
                    for r in ivfpq_knn_from_index(
                        spark, base, qv, n_probe=n_probe,
                        exclude_vec_id=vid,
                    ).collect()
                }
                adc_walls.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                got_rr = {
                    r.vec_id
                    for r in ivfpq_knn_from_index(
                        spark, base, qv, n_probe=n_probe, shortlist=100,
                        rerank=e, exclude_vec_id=vid,
                    ).collect()
                }
                rr_walls.append(time.perf_counter() - t0)
                adc_rec.append(len(got_adc & truth[vid]) / 10)
                rr_rec.append(len(got_rr & truth[vid]) / 10)
            per_geom[tag] = {
                "k_cells": k_cells,
                "n_probe": n_probe,
                "build_s": build_s,
                "phase_walls": timings or None,
                "adc_probe_s": round(statistics.median(adc_walls), 3),
                "rerank_probe_s": round(statistics.median(rr_walls), 3),
                "recall_at_10_adc": round(statistics.mean(adc_rec), 3),
                "recall_at_10_reranked": round(
                    statistics.mean(rr_rec), 3
                ),
            }
            print(f"{n}/geometry/{tag}: {per_geom[tag]}", flush=True)
        res[str(n)] = {
            "n_vectors": n,
            "n_clusters": 1024,
            "noise": 0.15,
            "n_queries": n_queries,
            "pq_k": 256,
            "auto_rule": "k=clamp(4*sqrt(N),32,4096), n_probe=max(4,k/32)",
            **per_geom,
        }
    _merge("ann_ivfpq_geometry", res)


def run_ann_sweep(ns: list[int], probes: list[int] | None = None) -> None:
    """The recall/cost DIAL, measured: for each corpus size, sweep
    n_probe and record (probe_s, recall@10) against the exact brute
    top-10. Probe cost should scale ~linearly in n_probe (it reads
    n_probe/k_cells of the postings); recall rises monotonically and
    hits 1.0 at n_probe = k_cells by construction (an exact scan
    routed through the index). Uses the index snapshots run_ann
    published (same k_cells=32); rebuilds any that are missing."""
    import shutil

    from novelti_dingo_spark.operators.ivf import (
        ivf_knn_from_index,
        publish_ivf_index,
    )
    from novelti_dingo_spark.operators.similarity import knn_bruteforce_top10

    spark = _spark()
    k_cells = 32
    probes = probes or [1, 2, 4, 8, 16, 32]
    res = {}
    for n in ns:
        d = build_embeddings(n)
        qv = duckdb.sql(
            f"SELECT embedding FROM '{d}/embeddings.parquet' WHERE vec_id = 0"
        ).fetchone()[0]
        qv = [float(x) for x in qv]
        base = os.path.join(d, "ivf_index")
        if not os.path.exists(os.path.join(base, "LATEST")):
            shutil.rmtree(base, ignore_errors=True)
            publish_ivf_index(
                spark, d, base, k_cells=k_cells, partition_postings=True
            )
        want = {r.vec_id for r in knn_bruteforce_top10(spark, d).collect()}
        curve = {}
        for np_ in probes:
            def probe():
                return ivf_knn_from_index(
                    spark, base, qv, k=10, n_probe=np_, exclude_vec_id=0
                ).collect()

            probe_s = _med(probe)
            got = {r.vec_id for r in probe()}
            curve[str(np_)] = {
                "probe_s": probe_s,
                "recall_at_10": round(len(got & want) / 10, 2),
            }
            print(f"n={n} n_probe={np_}: {curve[str(np_)]}")
        res[str(n)] = {"k_cells": k_cells, "curve": curve}
    _merge("ann_nprobe", res)


def run_spatial(ks: list[int]) -> None:
    from novelti_dingo_spark.operators.spatial import (
        spatial_radius_join,
        spatial_radius_join_geo,
    )

    spark = _spark()
    res = {}
    for k in ks:
        d = build_spatial(k)
        n_planar, t_planar = _timed_count(spatial_radius_join(spark, d))
        n_geo, t_geo = _timed_count(spatial_radius_join_geo(spark, d))
        res[f"x{k}"] = {
            "n_customers": 15000 * k,
            "n_suppliers": 1000,
            "planar_pairs": n_planar,
            "planar_wall_s": t_planar,
            "geo_pairs": n_geo,
            "geo_wall_s": t_geo,
        }
        print(f"x{k}: {res[f'x{k}']}")
    _merge("spatial", res)


def run_lake(n_appends: int) -> None:
    import shutil

    from pyspark.sql import functions as F

    from novelti_dingo_spark.pipelines import (
        compact_chain,
        publish_append,
        publish_versioned,
        read_version_chain,
        vacuum_versions,
    )
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    base = os.path.join(ROOT, "lake_cycle")
    shutil.rmtree(base, ignore_errors=True)
    o = load_table(spark, SRC, "orders")
    batch = o.select("o_orderkey", "o_custkey", "o_totalprice")
    n_batch = batch.count()

    t0 = time.perf_counter()
    publish_versioned(batch, base)
    t_publish = round(time.perf_counter() - t0, 3)
    append_s = []
    for i in range(n_appends):
        shifted = batch.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit((i + 1) * 10_000_000)
        )
        t0 = time.perf_counter()
        publish_append(shifted, base)
        append_s.append(round(time.perf_counter() - t0, 3))
    df, chain = read_version_chain(spark, base)
    t_read = _med(lambda: read_version_chain(spark, base)[0].count())
    total_rows = df.count()
    t0 = time.perf_counter()
    compact_chain(spark, base)
    t_compact = round(time.perf_counter() - t0, 3)
    t_read_compacted = _med(
        lambda: read_version_chain(spark, base)[0].count()
    )
    t0 = time.perf_counter()
    deleted = vacuum_versions(spark, base, keep_last=1)
    t_vacuum = round(time.perf_counter() - t0, 3)
    first5 = append_s[:5]
    last5 = append_s[-5:]
    res = {
        "batch_rows": n_batch,
        "n_appends": n_appends,
        "total_rows": total_rows,
        "publish_full_s": t_publish,
        "append_s_first5": first5,
        "append_s_last5": last5,
        "append_s_median": round(statistics.median(append_s), 3),
        "append_flatness_last5_over_first5": round(
            statistics.median(last5) / statistics.median(first5), 2
        ),
        "read_chain_s": t_read,
        "compact_s": t_compact,
        "read_compacted_s": t_read_compacted,
        "vacuum_s": t_vacuum,
        "vacuumed_versions": len(deleted),
    }
    print(res)
    _merge("lake_cycle", res)



def run_text(ks: list[int]) -> None:
    """Inverted-index build (expected ~linear in docs) and BM25 query
    cost (expected FLAT: the In-filter postings scan touches the query
    terms' postings, whose size is constant across replicas because
    the fixed terms exist only in replica 0 — index growth must not
    leak into query latency)."""
    import shutil

    from novelti_dingo_spark.operators.invindex import (
        _TERMS,
        build_inverted_index,
        search_bm25,
    )
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    res = {}
    for k in ks:
        d = build_docs(k)
        base = os.path.join(ROOT, f"invindex_x{k}")
        shutil.rmtree(base, ignore_errors=True)
        docs = load_table(spark, d, "documents")
        t0 = time.perf_counter()
        build_inverted_index(docs, base)
        t_build = round(time.perf_counter() - t0, 3)
        from novelti_dingo_spark.pipelines import read_version

        idx, _m = read_version(spark, base)
        n_postings = idx.count()
        _n, t_q = _timed_count(search_bm25(spark, base, list(_TERMS), k=10))
        # second timed query on the warm index — the serving figure
        _n2, t_q2 = _timed_count(search_bm25(spark, base, list(_TERMS), k=10))
        res[f"x{k}"] = {
            "n_docs": 5000 * k,
            "n_postings": n_postings,
            "index_build_s": t_build,
            "bm25_query_s_cold": t_q,
            "bm25_query_s_warm": t_q2,
        }
        print(f"x{k}: {res[f'x{k}']}")
    _merge("text_index", res)


def run_cdc(n_appends: int) -> None:
    """Change-feed cost: reading the LAST commit's changes must stay
    FLAT as the chain grows (O(changes), never O(table)) — measured at
    three chain depths; the full-history feed is the O(total) contrast."""
    import shutil

    from pyspark.sql import functions as F

    from novelti_dingo_spark.pipelines import (
        publish_append,
        publish_versioned,
        table_changes,
    )
    from novelti_dingo_spark.sources.io import load_table

    spark = _spark()
    base = os.path.join(ROOT, "cdc_chain")
    shutil.rmtree(base, ignore_errors=True)
    o = load_table(spark, SRC, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    publish_versioned(o, base)
    res = {"batch_rows": o.count(), "tail_read_s_at_depth": {}}
    checkpoints = {5, n_appends // 2, n_appends}
    v = 1
    for i in range(n_appends):
        shifted = o.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit((i + 1) * 10_000_000)
        )
        v = publish_append(shifted, base)
        depth = i + 1
        if depth in checkpoints:
            _n, t_tail = _timed_count(table_changes(spark, base, v - 1, v))
            res["tail_read_s_at_depth"][str(depth)] = t_tail
    _n_all, t_all = _timed_count(table_changes(spark, base, 1, v))
    res["full_feed_rows"] = _n_all
    res["full_feed_s"] = t_all
    print(res)
    _merge("cdc_feed", res)



def run_skew(k: int = 25) -> None:
    """Hot-cell skew study (round-8 list item pulled forward): every
    scaled customer lands in ONE spatial grid cell, so the blocked
    join's cell key has a single hot value. Three measured strategies:
    (a) plain shuffle join (one reducer owns the hot cell),
    (b) AQE skew-join splitting (thresholds lowered to local scale —
        the production no-code-change answer),
    (c) manual salting (operators/skew.salted_join — the recipe for
        engines/paths AQE can't split).
    Output correctness is asserted equal across all three."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.operators.skew import salted_join

    spark = _spark()
    n_hot = 15000 * k
    # hot facts: every row in cell (150, 0) of a 0.3-deg grid
    facts = (
        spark.range(n_hot)
        .withColumn("cell", F.lit(150 * 100000 + 0))
        .withColumn("payload", F.col("id") % 97)
    )
    # dim: 10 rows in the hot cell + 990 elsewhere
    dim = spark.range(1000).select(
        F.col("id").alias("dim_id"),
        F.when(F.col("id") < 10, F.lit(150 * 100000 + 0))
        .otherwise(F.col("id") * 7 + 1)
        .alias("cell"),
        (F.col("id") % 13).alias("weight"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def agg(joined):
        return joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("payload") * F.col("weight")).alias("s"),
        )

    def measure(tag, mk):
        df = mk()
        n0, t0 = _timed_count(df)
        row = df.collect()[0]
        return {"wall_s": t0, "n": int(row["n"]), "s": int(row["s"])}

    res = {"n_hot_facts": n_hot, "hot_cell_dim_rows": 10}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    res["plain_shuffle"] = measure(
        "plain", lambda: agg(facts.join(dim, "cell"))
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
    )
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
    )
    res["aqe_skew_split"] = measure(
        "aqe", lambda: agg(facts.join(dim, "cell"))
    )
    for key in (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ):
        spark.conf.unset(key)
    res["salted_join_8"] = measure(
        "salted",
        lambda: agg(salted_join(facts, dim, key="cell", row_id="id")),
    )
    assert (
        res["plain_shuffle"]["n"]
        == res["aqe_skew_split"]["n"]
        == res["salted_join_8"]["n"]
    )
    assert (
        res["plain_shuffle"]["s"]
        == res["aqe_skew_split"]["s"]
        == res["salted_join_8"]["s"]
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    print(res)
    _merge("skew_hot_cell", res)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("family", choices=[
        "build", "dedup", "gemm", "ann", "ann_sweep", "spatial", "lake",
        "text", "cdc", "skew", "skew_lsh", "ann_pq", "ann_sampled",
        "ann_clustered", "ann_opq", "ann_batch", "ann_clustered_sweep",
        "ann_geometry",
    ])
    p.add_argument("--k", type=int, nargs="*", default=[1, 5, 25])
    p.add_argument("--n", type=int, nargs="*", default=[2000, 20000, 100000])
    p.add_argument("--appends", type=int, default=25)
    a = p.parse_args()
    if a.family == "build":
        for k in a.k:
            print(build_docs(k), build_spatial(k))
        for n in a.n:
            print(build_embeddings(n))
    elif a.family == "dedup":
        run_dedup(a.k)
    elif a.family == "gemm":
        run_gemm(a.k)
    elif a.family == "ann":
        run_ann(a.n)
    elif a.family == "ann_sweep":
        run_ann_sweep(a.n)
    elif a.family == "ann_pq":
        run_ann_pq(a.n)
    elif a.family == "ann_sampled":
        run_ann_sampled(a.n)
    elif a.family == "ann_clustered":
        run_ann_clustered(a.n)
    elif a.family == "ann_opq":
        run_ann_opq(a.n)
    elif a.family == "ann_batch":
        run_ann_batch(a.n)
    elif a.family == "ann_clustered_sweep":
        run_ann_clustered_sweep(a.n)
    elif a.family == "ann_geometry":
        run_ann_geometry(a.n)
    elif a.family == "spatial":
        run_spatial(a.k)
    elif a.family == "lake":
        run_lake(a.appends)
    elif a.family == "text":
        run_text(a.k)
    elif a.family == "cdc":
        run_cdc(a.appends)
    elif a.family == "skew":
        run_skew(a.k[0] if a.k else 25)
    elif a.family == "skew_lsh":
        run_skew_lsh()


if __name__ == "__main__":
    main()
