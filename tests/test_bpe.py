"""BPE training parity: the distributed merge loop must reproduce a
pure-Python reference BPE (same tie-breaks, same leftmost-fold merge
semantics) exactly, and the encoded corpus must match reference
encoding."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from novelti_dingo_spark.operators.bpe import (
    N_MERGES,
    bpe_merge_table,
    bpe_token_counts,
    bpe_train,
    word_count_table,
)
from novelti_dingo_spark.sources import load_table


def _py_apply(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_bpe(word_counts: dict[str, int], n: int):
    syms = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n):
        pc: Counter = Counter()
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (a, b), total = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, total))
        for w in syms:
            syms[w] = _py_apply(syms[w], a, b)
    return merges, syms


def test_bpe_train_matches_python_reference(spark, sf_small):
    wc = {r.w: r.cnt for r in word_count_table(spark, sf_small).collect()}
    want, _ = _py_bpe(wc, N_MERGES)
    got = bpe_train(spark, sf_small)
    assert got == want


def test_bpe_merge_table_shape(spark, sf_small):
    rows = bpe_merge_table(spark, sf_small).collect()
    assert len(rows) == N_MERGES
    assert [r.rank for r in rows] == list(range(1, N_MERGES + 1))
    for r in rows:
        assert r.merged == r.left + r.right
        assert r.weighted_count > 0
    # counts at selection time are non-increasing is NOT guaranteed by
    # BPE (later merges can create new frequent pairs), but every count
    # must be a real adjacency count — cross-checked in the parity test.


def test_bpe_encoding_matches_python_reference(spark, sf_small):
    wc = {r.w: r.cnt for r in word_count_table(spark, sf_small).collect()}
    merges, final_syms = _py_bpe(wc, N_MERGES)
    d = load_table(spark, sf_small, "documents").filter(F.col("doc_id") < 20)
    want: Counter = Counter()
    for r in d.select("doc_id", "text").collect():
        for w in r.text.split(" "):
            for t in final_syms[w]:
                want[(r.doc_id, t)] += 1
    got = {
        (r.doc_id, r.token): r.cnt
        for r in bpe_token_counts(spark, sf_small).collect()
    }
    assert got == dict(want)


def test_tokenizer_persistence_reproduces_fresh_encoding(
    spark, sf_small, tmp_path
):
    """Publish the trained merges as a versioned asset; encoding from
    the pinned version must equal the fresh train+encode path row for
    row (token ids are downstream-stable only if the tokenizer is)."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.operators.bpe import (
        bpe_token_counts,
        encode_with_tokenizer,
        publish_tokenizer,
    )
    from novelti_dingo_spark.sources.io import load_table

    base = str(tmp_path / "tok")
    v = publish_tokenizer(spark, sf_small, base)
    docs = load_table(spark, sf_small, "documents").filter(
        F.col("doc_id") < 20
    )
    served = {
        (r.doc_id, r.token): r.cnt
        for r in encode_with_tokenizer(spark, base, docs, version=v).collect()
    }
    fresh = {
        (r.doc_id, r.token): r.cnt
        for r in bpe_token_counts(spark, sf_small).collect()
    }
    assert served == fresh and len(fresh) > 0
