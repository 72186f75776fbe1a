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
