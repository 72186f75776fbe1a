"""Distributed BPE tokenizer training (Sennrich et al., ACL'16) — the
missing piece between token *counting* (L5) and training-batch prep
(L12/L13): learning the subword vocabulary itself from the corpus.

Why this scales (the standard industrial trick): BPE never iterates over
the corpus. The corpus is scanned ONCE into a (word, count) frequency
table — vocabulary-sized, not corpus-sized — and every merge iteration
runs on that table: pair counting is a two-phase weighted agg over
|vocab| rows, and the ONLY datum that reaches the driver per iteration
is the single winning pair (same driver contract as the k-means loops in
ivf.py/pca.py: scalars and centroids only). At 100 TB the word-count
build is one explode + partial agg; 10⁵ distinct words × 30k merges is
cluster-trivial.

Determinism: ties in pair frequency break on the pair's lexicographic
order; the merge application is a LEFT FOLD (leftmost non-overlapping
occurrences first), matching the reference tokenizer behavior — pinned
against a pure-Python reimplementation in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens
from ..registry import register
from ..sources.io import load_table

N_MERGES = 12


def _chars(word: Column) -> Column:
    """Word → array of single-character symbols."""
    return F.filter(F.split(word, ""), lambda c: c != "")


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """One BPE merge as a left fold: scan symbols once, fusing each
    leftmost non-overlapping (a, b) adjacency into a+b — the exact
    semantics reference BPE implementations use."""
    return F.aggregate(
        syms,
        F.expr("array()").cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_count_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, count) — the one corpus-sized pass; everything after runs
    on this vocabulary-sized table."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` merges → [(left, right, weighted_count)].
    Each iteration: weighted adjacent-pair agg over the word table
    (two-phase, |vocab| rows), a 1-row argmax to the driver, then the
    merge folded into every word's symbol array. localCheckpoint cuts
    the per-iteration lineage exactly like the k-means loops."""
    wc = word_count_table(spark, sf_dir).select(
        "cnt", _chars(F.col("w")).alias("syms")
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = wc.select(
            "cnt",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) > 1 THEN transform("
                    "sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] AS a, syms[i] AS b)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .head()
        )
        if top is None:
            break
        merges.append((top.a, top.b, top.total))
        wc = wc.select(
            "cnt", _apply_merge(F.col("syms"), top.a, top.b).alias("syms")
        ).localCheckpoint()
    return merges


@register(
    "bpe_merge_table",
    None,  # iterative, data-dependent merge sequence → rows-only; the
    # full merge list is pinned against a pure-Python BPE in tests/test_bpe.py.
    survey_rows="L25,L5,iterative",
)
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned tokenizer: merge rank → (left, right, merged token,
    weighted adjacency count at selection time)."""
    merges = bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        [
            (i + 1, a, b, a + b, int(total))
            for i, (a, b, total) in enumerate(merges)
        ],
        "rank int, left string, right string, merged string, weighted_count long",
    )


@register(
    "bpe_token_counts",
    None,  # encoding applies the learned (data-dependent) merges →
    # rows-only; parity with Python reference encoding in tests/test_bpe.py.
    survey_rows="L25,L5,F5",
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoded with the learned merges: subword-token frequencies
    over docs 0-19. The merge chain is applied as N nested folds — pure
    codegen'd HOFs, no Python per row; the merge list itself is the only
    driver-side state (the broadcast-model pattern: train once, apply
    scan-side)."""
    merges = bpe_train(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    words = d.select(
        "doc_id", F.explode(tokens("text")).alias("w")
    )
    syms = _chars(F.col("w"))
    for a, b, _ in merges:
        syms = _apply_merge(syms, a, b)
    return (
        words.select("doc_id", F.explode(syms).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --- tokenizer persistence: the merge table as a versioned asset -----------


def publish_tokenizer(
    spark: SparkSession, sf_dir: str, base_dir: str
) -> int:
    """Train the BPE merges and publish them as a versioned dataset:
    the tokenizer IS data (an ordered merge table), and training twice
    on different corpus snapshots must never silently change every
    downstream token id — so the tokenizer gets the same immutable
    version/pin semantics as any other lake table. Columns: merge_rank
    (application order), left, right, weighted_count."""
    from ..pipelines import publish_versioned

    merges = bpe_train(spark, sf_dir)
    df = spark.createDataFrame(
        [(i, a, b, int(c)) for i, (a, b, c) in enumerate(merges)],
        "merge_rank int, left string, right string, weighted_count long",
    )
    return publish_versioned(
        df, base_dir, meta={"n_merges": len(merges), "source_sf": sf_dir}
    )


def encode_with_tokenizer(
    spark: SparkSession,
    base_dir: str,
    docs: DataFrame,
    version: int | None = None,
) -> DataFrame:
    """Encode documents with a PINNED tokenizer version: load the merge
    table (vocabulary-scale — driver-side by design, it IS the model),
    apply the merges as nested codegen'd folds exactly like the fresh
    path. Returns (doc_id, token, cnt)."""
    from ..functions.text_funcs import tokens
    from ..pipelines import read_version

    mdf, _ = read_version(spark, base_dir, version)
    merges = [
        (r.left, r.right)
        for r in mdf.orderBy("merge_rank").collect()
    ]
    words = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    syms = _chars(F.col("w"))
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    return (
        words.select("doc_id", F.explode(syms).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
