"""Curation-operator tests: semantic assertions beyond the oracle hashes
(Python-reference recompute for repetition, full-redaction invariants,
contamination bounds and self-consistency, rollup decision coherence)."""

from __future__ import annotations

import duckdb

from novelti_dingo_spark.operators.curation import (
    benchmark_contamination,
    pii_redact,
    repetition_stats,
    source_quality_rollup,
)


def test_repetition_matches_python(spark, sf_small):
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_small}/documents.parquet' LIMIT 25"
        ).fetchall()
    )
    got = {
        r.doc_id: r
        for r in repetition_stats(spark, sf_small).filter("doc_id < 25").collect()
    }
    for doc_id, text in texts.items():
        toks = text.split(" ")
        if len(toks) < 2:
            assert doc_id not in got
            continue
        row = got[doc_id]
        assert row.n_tokens == len(toks)
        assert abs(row.dup_word_frac - (1 - len(set(toks)) / len(toks))) < 1e-12
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        top = max(grams.count(g) for g in set(grams))
        assert abs(row.top_bigram_frac - top / len(grams)) < 1e-12
        assert row.keep == (
            row.dup_word_frac <= 0.8 and row.top_bigram_frac <= 0.2
        )


def test_pii_redact_removes_everything(spark, sf_small):
    rows = pii_redact(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.clean, r
        assert r.n_emails == 1 and r.n_phones == 1
        assert "<EMAIL>" in r.tail_40 and "<PHONE>" in r.tail_40
        assert "@" not in r.tail_40 and "555-" not in r.tail_40


def test_contamination_bounds_and_eval_excluded(spark, sf_small):
    df = benchmark_contamination(spark, sf_small)
    rows = df.collect()
    assert rows
    eval_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_small}/documents.parquet' WHERE source = 'src0'"
        ).fetchall()
    }
    for r in rows:
        assert r.doc_id not in eval_ids
        assert 0 <= r.n_hits <= r.n_grams
        assert abs(r.contamination - r.n_hits / r.n_grams) < 1e-12


def test_source_rollup_decision_coherent(spark, sf_small):
    rows = source_quality_rollup(spark, sf_small).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_small}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.keep_source == (r.long_share >= 0.4)
        assert 0 <= r.long_share <= 1
