"""Training-data preparation operators: document chunking, sequence
packing, and quantized similarity (SURVEY.md §2 L-rows — the corpus →
training-batch path that sits between curation and the data loader).

All three are expressed with JVM-side built-ins (split / slice /
sequence / window cumsum / HOF arithmetic) so they stay inside
whole-stage codegen; none needs a Python worker. Chunking and packing
are per-document / per-group local computations — at 100 TB they
parallelize embarrassingly with zero or one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load_table

CHUNK_TOKENS = 20  # tokens per chunk
CHUNK_STRIDE = 15  # new tokens per chunk → 5-token overlap between chunks
PACK_BUDGET = 256  # tokens per packed training sequence


@register(
    "chunk_documents",
    f"""
    SELECT doc_id, i AS chunk_id,
           array_to_string(toks[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' ')
             AS chunk_text,
           len(toks[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_TOKENS}])
             AS n_chunk_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         range(0, 8) r(i)
    WHERE i*{CHUNK_STRIDE} < len(toks)
    """,
    survey_rows="L12,X4,F5",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split each document into
    {CHUNK_TOKENS}-token chunks advancing {CHUNK_STRIDE} tokens per step
    (5-token overlap), the standard prep for embedding or context-window
    training. Pure built-ins: split → sequence → explode → slice, all
    codegen'd; chunk count per doc is data-driven (no padding rows). A
    row only ever expands into its own chunks — no shuffle at any scale;
    the explode multiplies rows ~n_tokens/stride ≈ 3× here, and column
    pruning drops the original text before the explode output is wide.
    (The oracle's range(0,8) is a static spine ≥ the max chunks/doc at
    this corpus — 99 tokens → 7 chunks — filtered to the same data-driven
    condition; the Spark side computes the exact sequence per row.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    d = d.select("doc_id", toks.alias("toks"), n.alias("n"))
    # chunk starts: 0, stride, 2*stride, ... while start < n_tokens
    idx = F.sequence(
        F.lit(0), F.floor((F.col("n") - 1) / CHUNK_STRIDE).cast("int")
    )
    chunked = d.select(
        "doc_id", "toks", F.explode(idx).alias("chunk_id")
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


@register(
    "pack_sequences",
    f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY source
                                             ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING)
                         - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS bin_id
      FROM toks)
    SELECT source, bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM packed GROUP BY source, bin_id
    """,
    survey_rows="L13,W3,A1",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in stable doc_id order, per
    source shard) to fixed token-budget training bins of {PACK_BUDGET}
    tokens via a running-sum window — bin_id = completed budget units
    before the doc starts. This is the streaming-pack formulation: a
    document whose tokens straddle a boundary stays with its starting
    bin, so bins can overflow by at most max_doc_tokens — exactly how
    concat-then-split packing behaves in LLM data loaders (first-fit
    greedy packing is inherently sequential state and would need
    applyInPandasWithState; the cumsum form is order-deterministic,
    engine-portable, and one shuffle). Token counts are integers, so the
    running sum is exact in both engines. At 100 TB the window partitions
    by shard (source here), so no global ordering bottleneck."""
    d = load_table(spark, sf_dir, "documents")
    d = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "knn_quantized_top10",
    """
    WITH q AS (
      SELECT embedding::DOUBLE[] AS v,
             127.0 / list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
               AS scale
      FROM embeddings WHERE vec_id = 0),
    qq AS (SELECT list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT))
                    AS qa, scale AS qscale FROM q),
    c AS (
      SELECT vec_id, label,
             127.0 / list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
               AS scale,
             embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id <> 0),
    cq AS (SELECT vec_id, label,
                  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT))
                    AS qb, scale AS cscale FROM c)
    SELECT vec_id, label,
           list_sum(list_transform(list_zip(qa, qb), p -> p[1] * p[2]))
             / (qscale * cscale) AS qdot
    FROM cq CROSS JOIN qq
    ORDER BY qdot DESC, vec_id LIMIT 10
    """,
    survey_rows="L14,L3,F5",
)
def knn_quantized_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized kNN: symmetric per-vector int8 quantization
    (scale = 127/max|x|, q = floor(x*scale + 0.5)) and top-10 by
    dequantized integer dot product — the memory-layout trade every
    vector store makes (4× smaller vectors, integer SIMD dots) with
    recall loss bounded by quantization error. floor(x+0.5) instead of
    round() because the two engines' float round() modes differ
    (HALF_UP vs half-even) while floor is IEEE-exact in both. The
    integer dot is exact arithmetic; the dequantize divide is one IEEE
    op — both engines produce bit-identical scores, so this is
    oracle-checked (unlike LSH/IVF, which are rows-only by randomness).
    Same scan shape as knn_bruteforce_top10: broadcast 1-row query,
    single corpus scan, TakeOrderedAndProject top-k; at 100 TB the
    quantized corpus column is what you'd persist (pack to binary), and
    the scan reads 1/4 the bytes."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    scale = 127.0 / F.array_max(F.transform(v, lambda x: F.abs(x)))
    qvec = F.transform(F.col("v"), lambda x: F.floor(x * F.col("scale") + 0.5))
    quant = e.select("vec_id", "label", v.alias("v"), scale.alias("scale")).select(
        "vec_id", "label", "scale", qvec.alias("q")
    )
    qside = (
        quant.filter(F.col("vec_id") == 0)
        .select(F.col("q").alias("qa"), F.col("scale").alias("qscale"))
    )
    cside = quant.filter(F.col("vec_id") != 0).select(
        "vec_id", "label", F.col("q").alias("qb"), F.col("scale").alias("cscale")
    )
    idot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        cside.crossJoin(F.broadcast(qside))
        .select(
            "vec_id",
            "label",
            (idot / (F.col("qscale") * F.col("cscale"))).alias("qdot"),
        )
        .orderBy(F.desc("qdot"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "pack_sequences_firstfit",
    None,  # first-fit is inherently sequential per shard (each placement
    # depends on every bin's current fill) — not window-expressible;
    # invariants pinned in tests/test_llm_prep.py: partition of docs,
    # no bin over budget unless a single doc exceeds it, fill >= cumsum
    # packing, determinism
    survey_rows="L13,X2",
)
def pack_sequences_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L13 (exact variant): TRUE first-fit bin packing per source shard —
    each doc (stable doc_id order) goes into the lowest-numbered open bin
    it fits; a doc longer than the budget gets a bin alone. Unlike the
    cumsum formulation (pack_sequences), bins never overflow (except the
    single-oversized-doc case) and tail gaps get back-filled by later
    short docs, so fewer bins at equal budget.

    Scale shape: the sequential state is PER SHARD, so each shard is one
    `applyInPandas` task (Arrow-batched, a plain Python loop over the
    shard's docs). Shards are the parallelism unit exactly as in the
    cumsum variant — the difference is only within-shard: O(docs × open
    bins) worst case, O(docs) with the one-open-bin-per-fill-level trick
    kept simple here since shard ≈ 10⁵ docs at 100 TB. The output
    contract matches pack_sequences so downstream shard writers accept
    either."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        fills: list[int] = []  # bin_id -> current token fill
        assign = []
        for n in pdf["n_tokens"]:
            n = int(n)
            for b, f in enumerate(fills):
                if f + n <= PACK_BUDGET:
                    fills[b] = f + n
                    assign.append(b)
                    break
            else:
                fills.append(n)
                assign.append(len(fills) - 1)
        out = pdf.assign(bin_id=assign)
        return (
            out.groupby("bin_id", as_index=False)
            .agg(
                source=("source", "first"),
                n_docs=("doc_id", "size"),
                total_tokens=("n_tokens", "sum"),
                first_doc=("doc_id", "min"),
                last_doc=("doc_id", "max"),
            )[["source", "bin_id", "n_docs", "total_tokens",
               "first_doc", "last_doc"]]
        )

    return d.groupBy("source").applyInPandas(
        pack,
        "source string, bin_id long, n_docs long, total_tokens long, "
        "first_doc long, last_doc long",
    )


@register(
    "target_encode_oof",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_orderkey % 5 AS fold,
             o.o_totalprice AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), g AS (
      SELECT sum(y) / count(*) AS gm FROM j
    ), sf AS (
      SELECT seg, fold, sum(y) AS s, count(*) AS c FROM j GROUP BY 1, 2
    ), tot AS (
      SELECT seg, sum(s) AS ts, sum(c) AS tc FROM sf GROUP BY 1
    )
    SELECT sf.seg AS c_mktsegment, CAST(sf.fold AS BIGINT) AS fold,
           sf.c AS n_rows,
           round(((tot.ts - sf.s) + 10.0 * g.gm) / (tot.tc - sf.c + 10.0), 2)
             AS encoded
    FROM sf JOIN tot ON tot.seg = sf.seg CROSS JOIN g
    """,
    survey_rows="A1,W3,ml-prep",
)
def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe TARGET ENCODING with out-of-fold means (the
    feature-engineering idiom behind CatBoost-style ordered target
    statistics): category c_mktsegment is encoded, per deterministic
    fold (o_orderkey % 5), as the smoothed mean of o_totalprice over
    every OTHER fold — ((seg_sum − fold_sum) + m·global_mean) /
    ((seg_cnt − fold_cnt) + m), m=10 — so a row's own fold never leaks
    its target into the feature it trains on.

    Plan shape at 100 TB: one broadcast dim join, ONE grouped agg at
    (category, fold) grain — k×5 rows — then window sums per category
    over that tiny frame and a broadcast 1-row global mean; the fact is
    scanned once, and the leave-fold-out arithmetic happens on the k×5
    rollup, never re-scanning per fold (the naive per-fold-join
    implementation would scan the fact 5 times). Both engines derive
    the global mean as sum/count over identical doubles; output rounds
    to cents, far above cross-engine float-summation-order noise."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    ).select(
        F.col("c_mktsegment"),
        (F.col("o_orderkey") % 5).alias("fold"),
        F.col("o_totalprice").alias("y"),
    )
    sf = j.groupBy("c_mktsegment", "fold").agg(
        F.sum("y").alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    g = j.agg(
        (F.sum("y") / F.count(F.lit(1))).alias("_gm")
    )
    w = Window.partitionBy("c_mktsegment")
    enc = (
        sf.withColumn("_ts", F.sum("_s").over(w))
        .withColumn("_tc", F.sum("_c").over(w))
        .crossJoin(F.broadcast(g))
        .select(
            "c_mktsegment",
            F.col("fold").cast("long").alias("fold"),
            F.col("_c").alias("n_rows"),
            F.round(
                ((F.col("_ts") - F.col("_s")) + F.lit(10.0) * F.col("_gm"))
                / (F.col("_tc") - F.col("_c") + F.lit(10.0)),
                2,
            ).alias("encoded"),
        )
    )
    return enc
