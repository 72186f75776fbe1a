"""Inverted-index invariants beyond the oracle query: empty and
missing-term searches, single-term equivalence with a direct scan,
pushed-down token filter in the index scan plan, and index refresh via
republish."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from novelti_dingo_spark.operators.invindex import (
    build_inverted_index,
    search_all_terms,
)
from novelti_dingo_spark.plans import explain_formatted
from novelti_dingo_spark.sources import load_table


def _contains(docs, term):
    return docs.filter(
        F.array_contains(F.split("text", " "), term)
    ).select("doc_id")


def test_single_term_matches_direct_scan(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    got = {r.doc_id for r in search_all_terms(spark, base, ["spark"]).collect()}
    want = {r.doc_id for r in _contains(docs, "spark").collect()}
    assert got == want and got


def test_missing_term_yields_empty(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    assert search_all_terms(spark, base, ["spark", "zzz_not_a_token"]).count() == 0


def test_conjunction_is_intersection(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    got = {
        r.doc_id
        for r in search_all_terms(spark, base, ["hash", "sort"]).collect()
    }
    a = {r.doc_id for r in _contains(docs, "hash").collect()}
    b = {r.doc_id for r in _contains(docs, "sort").collect()}
    assert got == (a & b)


def test_token_filter_pushed_into_index_scan(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    plan = explain_formatted(search_all_terms(spark, base, ["hash", "sort"]))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:200]
    assert "token" in pushed and "In" in pushed


def test_phrase_search_matches_substring_scan(spark, sf_small, tmp_path):
    from novelti_dingo_spark.operators.invindex import search_phrase

    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    got = {
        r.doc_id for r in search_phrase(spark, base, ["big", "data"]).collect()
    }
    want = {
        r.doc_id
        for r in docs.filter(
            F.concat(F.lit(" "), F.col("text"), F.lit(" ")).contains(
                " big data "
            )
        ).collect()
    }
    assert got == want and got


def test_phrase_counts_overlapping_occurrences(spark, tmp_path):
    from novelti_dingo_spark.operators.invindex import search_phrase

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b"), (2, "b a")],
        "doc_id long, text string",
    )
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    occ = {
        r.doc_id: r.n_occurrences
        for r in search_phrase(spark, base, ["a", "a"]).collect()
    }
    assert occ == {0: 2}  # starts at 0 and 1 — overlapping counted
    occ2 = {
        r.doc_id: r.n_occurrences
        for r in search_phrase(spark, base, ["a", "b"]).collect()
    }
    assert occ2 == {0: 1, 1: 1}


def test_refresh_republish_flips_atomically(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    v1 = build_inverted_index(docs.filter(F.col("doc_id") < 100), base)
    n1 = search_all_terms(spark, base, ["spark"]).count()
    v2 = build_inverted_index(docs, base)
    assert (v1, v2) == (1, 2)
    n2 = search_all_terms(spark, base, ["spark"]).count()
    assert n2 >= n1
    assert n2 == _contains(docs, "spark").count()


def test_bitmap_search_equals_exploded_search(spark, sf_small, tmp_path):
    """Bitmap AND must equal the exploded count-distinct plan for the
    same terms — including a single-term search (bitmap expansion is
    exactly the posting list) and a term set with an absent term."""
    from novelti_dingo_spark.operators.invindex import (
        bitmap_postings,
        bitmap_search_all,
    )
    from novelti_dingo_spark.pipelines import read_version

    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    idx, _ = read_version(spark, base)
    bm = bitmap_postings(idx).persist()
    try:
        for terms in (["spark"], ["scan", "filter"], ["scan", "zzz_nope"]):
            got = {r.doc_id for r in bitmap_search_all(bm, terms).collect()}
            want = {
                r.doc_id
                for r in search_all_terms(spark, base, terms).collect()
            }
            assert got == want, terms
    finally:
        bm.unpersist()


def test_bitmap_postings_word_packing(spark, sf_small, tmp_path):
    """Every set bit round-trips: popcount over a term's masks equals
    its exploded posting count, and block ids span doc_id/64."""
    from novelti_dingo_spark.operators.invindex import bitmap_postings
    from novelti_dingo_spark.pipelines import read_version

    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    idx, _ = read_version(spark, base)
    bm = bitmap_postings(idx)
    row = (
        bm.filter(F.col("token") == "spark")
        .agg(
            F.sum(F.expr("bit_count(mask)")).alias("bits"),
            F.max("block").alias("maxb"),
        )
        .head()
    )
    n_postings = idx.filter(F.col("token") == "spark").count()
    max_doc = idx.agg(F.max("doc_id")).head()[0]
    assert row["bits"] == n_postings > 0
    assert row["maxb"] <= max_doc // 64


def test_bitmap_not_only_search_uses_universe(spark, sf_small, tmp_path):
    """NOT-only retrieval ('everything except docs containing X') must
    come from the corpus universe, not the index — a term absent from
    half the docs has no posting rows for them."""
    from novelti_dingo_spark.operators.invindex import (
        bitmap_postings,
        bitmap_search_expr,
    )
    from novelti_dingo_spark.pipelines import read_version

    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    idx, _ = read_version(spark, base)
    bm = bitmap_postings(idx)
    got = {
        r.doc_id
        for r in bitmap_search_expr(bm, docs, [], ["spark"]).collect()
    }
    want = {
        r.doc_id
        for r in docs.filter(
            ~F.array_contains(F.split("text", " "), "spark")
        ).collect()
    }
    assert got == want and got


def test_runlen_search_equals_exploded_search(spark, sf_small, tmp_path):
    """Run-container intersection must equal the exploded plan —
    including single-term (spans expand to exactly the posting list),
    an absent term (empty result), and dense-dense pairs whose spans
    merely touch."""
    from novelti_dingo_spark.operators.invindex import (
        runlen_postings,
        runlen_search_all,
    )
    from novelti_dingo_spark.pipelines import read_version

    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    idx, _ = read_version(spark, base)
    runs = runlen_postings(idx).persist()
    try:
        for terms in (
            ["spark"], ["scan", "merge"], ["scan", "filter", "merge"],
            ["scan", "zzz_nope"],
        ):
            got = [
                r.doc_id for r in runlen_search_all(runs, terms).collect()
            ]
            want = {
                r.doc_id
                for r in search_all_terms(spark, base, terms).collect()
            }
            assert set(got) == want, terms
            assert len(got) == len(want), f"duplicate doc_ids for {terms}"
    finally:
        runs.unpersist()


def test_runlen_compresses_dense_terms(spark, sf_small, tmp_path):
    """The run layout's reason to exist: a dense term's posting list
    collapses to far fewer spans than postings (best case 1), and the
    spans reconstruct the list exactly."""
    from novelti_dingo_spark.operators.invindex import runlen_postings
    from novelti_dingo_spark.pipelines import read_version

    docs = load_table(spark, sf_small, "documents")
    base = os.path.join(str(tmp_path), "idx")
    build_inverted_index(docs, base)
    idx, _ = read_version(spark, base)
    dense = idx.groupBy("token").count().orderBy(F.desc("count")).first()
    runs = runlen_postings(idx).filter(F.col("token") == dense.token)
    n_runs = runs.count()
    assert n_runs * 4 < dense["count"], (n_runs, dense["count"])
    covered = runs.select(
        F.explode(
            F.sequence(F.col("run_start"), F.col("run_end"))
        ).alias("doc_id")
    )
    original = idx.filter(F.col("token") == dense.token).select("doc_id")
    assert covered.count() == original.count()
    assert covered.exceptAll(original).count() == 0
