"""Text-analysis and multimodal plumbing tests."""

from __future__ import annotations

import hashlib

import duckdb

from novelti_dingo_spark.operators.multimodal import (
    decode_image_stub,
    multimodal_decode_features,
)
from novelti_dingo_spark.operators.text import doc_fingerprint


def test_fingerprint_matches_python(spark, sf_small):
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_small}/documents.parquet' LIMIT 20"
        ).fetchall()
    )
    got = {
        r.doc_id: r.fingerprint
        for r in doc_fingerprint(spark, sf_small).filter("doc_id < 20").collect()
    }
    for doc_id, text in texts.items():
        toks = text.split(" ")
        if len(toks) < 5:
            assert doc_id not in got
            continue
        shingles = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
        want = min(hashlib.md5(s.encode()).hexdigest() for s in shingles)
        assert got[doc_id] == want


def test_multimodal_decode_plumbing(spark, sf_small):
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
        ).fetchall()
    )
    rows = multimodal_decode_features(spark, sf_small).collect()
    assert len(rows) == len(texts)
    for r in rows[:50]:
        payload = texts[r.doc_id].encode()
        assert r.payload_bytes == len(payload)
        w, h = decode_image_stub(payload)
        assert (r.fake_width, r.fake_height) == (w, h)
        assert r.decoder == "stub-v1"


def test_multimodal_resize_deterministic(spark, sf_small):
    from novelti_dingo_spark.operators.multimodal import multimodal_resize, resize_stub

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
        ).fetchall()
    )
    rows = multimodal_resize(spark, sf_small).collect()
    assert len(rows) == len(texts)
    for r in rows[:30]:
        w, h, b = resize_stub(texts[r.doc_id].encode(), 256)
        assert (r.out_width, r.out_height, r.resized_bytes) == (w, h, b)
        assert max(r.out_width, r.out_height) <= 256


def test_multimodal_frame_sample_shape(spark, sf_small):
    from novelti_dingo_spark.operators.multimodal import multimodal_frame_sample

    rows = multimodal_frame_sample(spark, sf_small).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) == 4 for v in by_doc.values())
    for frames in list(by_doc.values())[:20]:
        offs = [f.frame_offset_bytes for f in sorted(frames, key=lambda x: x.frame_idx)]
        assert offs == sorted(offs)
        assert offs[0] == 0


def test_winnowing_no_miss_guarantee(spark):
    """Schleimer et al.'s no-miss property: two documents sharing a run
    of >= w+k-1 = 8 consecutive tokens MUST share at least one selected
    fingerprint hash, whatever surrounds the run. Disjoint documents
    share none (md5 grams, no collisions at this size)."""
    import pandas as pd

    from novelti_dingo_spark.operators.text import winnow_selected_hashes

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"one two three four five six {shared} seven eight nine ten",
                f"{shared} completely different trailing tokens here now ok",
                "unrelated words entirely nothing in common with others "
                "padding padding padding padding",
            ],
        }
    )
    d = spark.createDataFrame(docs)
    fps = winnow_selected_hashes(d).collect()
    by_doc = {i: {r.fp for r in fps if r.doc_id == i} for i in (1, 2, 3)}
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_density(spark, sf_small):
    """Expected fingerprint density is ~2/(w+1) of grams (w=4 → ~40%);
    assert the measured corpus sits in a sane band and every doc selects
    at least one fingerprint per window span."""
    from novelti_dingo_spark.operators.text import winnow_fingerprints_df
    from novelti_dingo_spark.sources import load_table

    d = load_table(spark, sf_small, "documents")
    rows = winnow_fingerprints_df(d).collect()
    assert rows
    total_fps = sum(r.n_fps for r in rows)
    total_grams = sum(r.n_grams for r in rows)
    assert 0.2 < total_fps / total_grams < 0.6
    for r in rows:
        assert 1 <= r.n_fps <= r.n_grams
