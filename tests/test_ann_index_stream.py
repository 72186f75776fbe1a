"""Streaming IVF index maintenance (streaming/ann_index.py): one
snapshot per streamed batch, pinned readers undisturbed by concurrent
appends, exactly-once across checkpoint replay, fresh-checkpoint
identity scoping, and the no-index refusal."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.operators.ivf import (
    ivf_knn_from_index,
    publish_ivf_index,
)
from novelti_dingo_spark.pipelines import read_snapshot
from novelti_dingo_spark.sources import lakefs
from novelti_dingo_spark.sources.io import load_table
from novelti_dingo_spark.streaming.ann_index import ivf_index_append_stream


def _new_vec_file(path, start, n, dim=64):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(start)
    m = rng.standard_normal((n, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(start, start + n), pa.int64()),
            "embedding": pa.array(
                m.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
            "label": pa.array(
                [int(x) for x in rng.integers(0, 10, n)], pa.int32()
            ),
        }
    )
    pq.write_table(tbl, str(path))
    os.utime(path, (1_900_000_000 + start,) * 2)


def test_streamed_appends_grow_index_pinned_reader_stable(
    spark, sf_small, tmp_path
):
    base = str(tmp_path / "ivf")
    v1 = publish_ivf_index(spark, sf_small, base)
    e = load_table(spark, sf_small, "embeddings")
    q = list(e.filter(F.col("vec_id") == 0).head().embedding)
    pinned_before = [
        (r.vec_id, r.cos_sim)
        for r in ivf_knn_from_index(
            spark, base, q, version=v1, exclude_vec_id=0
        ).collect()
    ]
    n0 = read_snapshot(spark, base)[0]["postings"].count()

    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 100_000, 40)
    _new_vec_file(src / "b.parquet", 100_100, 25)
    ckpt = str(tmp_path / "ckpt")
    ivf_index_append_stream(spark, str(src), base, ckpt)

    # one snapshot per file batch
    assert lakefs.read_text(spark, f"{base}/LATEST").strip() == str(v1 + 2)
    tables, _ = read_snapshot(spark, base)
    assert tables["postings"].count() == n0 + 65
    # every streamed vector landed in a valid cell of the FROZEN
    # centroids (no retrain)
    cents = {r.cid for r in tables["centroids"].collect()}
    new_cells = {
        r.cid
        for r in tables["postings"].filter("vec_id >= 100000").collect()
    }
    assert new_cells <= cents and new_cells
    # a reader pinned to v1 is byte-stable through the appends
    pinned_after = [
        (r.vec_id, r.cos_sim)
        for r in ivf_knn_from_index(
            spark, base, q, version=v1, exclude_vec_id=0
        ).collect()
    ]
    assert pinned_after == pinned_before


def test_replay_is_exactly_once_and_fresh_checkpoint_appends(
    spark, sf_small, tmp_path
):
    base = str(tmp_path / "ivf")
    publish_ivf_index(spark, sf_small, base)
    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 200_000, 10)
    ckpt = str(tmp_path / "ckpt")
    ivf_index_append_stream(spark, str(src), base, ckpt)
    v_after = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    n_after = read_snapshot(spark, base)[0]["postings"].count()
    # re-run with the SAME checkpoint: nothing new to read, no publish
    ivf_index_append_stream(spark, str(src), base, ckpt)
    assert int(lakefs.read_text(spark, f"{base}/LATEST").strip()) == v_after
    assert read_snapshot(spark, base)[0]["postings"].count() == n_after
    # a FRESH checkpoint on the same source re-reads the file — and the
    # identity-scoped guard correctly treats it as NEW work, not a
    # replay (epoch ids restart at 0 but checkpoint_id differs)
    ivf_index_append_stream(spark, str(src), base, str(tmp_path / "ckpt2"))
    assert (
        int(lakefs.read_text(spark, f"{base}/LATEST").strip()) == v_after + 1
    )
    assert read_snapshot(spark, base)[0]["postings"].count() == n_after + 10


def test_stream_refuses_untrained_index(spark, tmp_path):
    with pytest.raises(ValueError, match="no published index"):
        ivf_index_append_stream(
            spark, str(tmp_path / "src"), str(tmp_path / "nope"),
            str(tmp_path / "ckpt"),
        )
