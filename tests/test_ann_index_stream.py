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
from novelti_dingo_spark.pipelines import read_snapshot_chain as read_snapshot
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


def test_replay_guard_survives_interleaved_offline_publish(
    spark, sf_small, tmp_path
):
    """Round-9 advice: the guard used to read only the LATEST snapshot's
    manifest, so an offline append_vectors_to_index landing between the
    stream's publish and a crash-replay made _last_appended_epoch
    return -1 and the replayed batch was appended a SECOND time. Now
    the guard scans every snapshot manifest plus the per-checkpoint
    control file."""
    from novelti_dingo_spark.operators.ivf import append_vectors_to_index
    from novelti_dingo_spark.streaming.ann_index import _last_appended_epoch
    from novelti_dingo_spark.streaming.cdc import _checkpoint_identity

    base = str(tmp_path / "ivf")
    publish_ivf_index(spark, sf_small, base)
    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 300_000, 12)
    ckpt = str(tmp_path / "ckpt")
    ivf_index_append_stream(spark, str(src), base, ckpt)
    run_id = _checkpoint_identity(spark, ckpt)
    assert _last_appended_epoch(spark, base, run_id) == 0

    # an OFFLINE (non-stream) append lands on top — LATEST's manifest
    # now carries no checkpoint_id
    extra = (
        load_table(spark, sf_small, "embeddings")
        .limit(5)
        .withColumn("vec_id", F.col("vec_id") + 400_000)
    )
    append_vectors_to_index(spark, base, extra)
    n_after_offline = read_snapshot(spark, base)[0]["postings"].count()

    # the guard still sees the stream's own manifest behind LATEST
    assert _last_appended_epoch(spark, base, run_id) == 0

    # end-to-end: force Spark to REPLAY batch 0 by deleting its commit
    # marker (crash-between-publish-and-checkpoint-commit simulation),
    # then re-run — the guard must skip the duplicate publish
    commit0 = os.path.join(ckpt, "commits", "0")
    assert os.path.exists(commit0)
    os.remove(commit0)
    crc0 = os.path.join(os.path.dirname(commit0), ".0.crc")
    if os.path.exists(crc0):  # Hadoop ChecksumFs shadow file
        os.remove(crc0)
    ivf_index_append_stream(spark, str(src), base, ckpt)
    assert read_snapshot(spark, base)[0]["postings"].count() == n_after_offline


def test_replay_guard_survives_vacuum_of_stream_snapshot(
    spark, sf_small, tmp_path
):
    """The control-file half of the guard: vacuum_snapshots can reclaim
    the snapshot dir that carried the stream's manifest — the
    per-checkpoint high-water mark in _stream_ckpt/ must survive it."""
    from novelti_dingo_spark.operators.ivf import append_vectors_to_index
    from novelti_dingo_spark.pipelines import vacuum_snapshots
    from novelti_dingo_spark.streaming.ann_index import _last_appended_epoch
    from novelti_dingo_spark.streaming.cdc import _checkpoint_identity

    base = str(tmp_path / "ivf")
    publish_ivf_index(spark, sf_small, base)
    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 500_000, 8)
    ckpt = str(tmp_path / "ckpt")
    ivf_index_append_stream(spark, str(src), base, ckpt)
    run_id = _checkpoint_identity(spark, ckpt)
    # two offline publishes push the stream's snapshot out of keep_last
    extra = (
        load_table(spark, sf_small, "embeddings")
        .limit(3)
        .withColumn("vec_id", F.col("vec_id") + 600_000)
    )
    append_vectors_to_index(spark, base, extra)
    append_vectors_to_index(
        spark, base, extra.withColumn("vec_id", F.col("vec_id") + 100)
    )
    vacuum_snapshots(spark, base, keep_last=2)
    assert _last_appended_epoch(spark, base, run_id) == 0


def test_ivfpq_streamed_appends_encode_with_frozen_quantizers(
    spark, sf_small, tmp_path
):
    """Round-10: the composed IVF-PQ index grows by stream — appended
    vectors get PQ codes from the PUBLISHED codebooks (no retrain of
    either level), one snapshot per batch, pinned readers byte-stable,
    and the new codes are numpy-verifiable against the frozen
    codebooks (residual encoding included)."""
    import numpy as np

    from novelti_dingo_spark.operators.pq import (
        ivfpq_knn_from_index,
        publish_ivfpq_index,
    )
    from novelti_dingo_spark.streaming.ann_index import (
        ivfpq_index_append_stream,
    )

    base = str(tmp_path / "ivfpq")
    v1 = publish_ivfpq_index(spark, sf_small, base, k_cells=8)
    e = load_table(spark, sf_small, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).head().embedding]
    pinned_before = [
        (r.vec_id, r.pq_sim)
        for r in ivfpq_knn_from_index(
            spark, base, q, version=v1, n_probe=2, exclude_vec_id=0
        ).collect()
    ]
    t0, m0 = read_snapshot(spark, base)
    n0 = t0["codes"].count()
    cb0 = sorted(
        (r.m, r.cid, tuple(r.centroid)) for r in t0["codebooks"].collect()
    )

    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 700_000, 30)
    _new_vec_file(src / "b.parquet", 700_100, 20)
    ckpt = str(tmp_path / "ckpt")
    ivfpq_index_append_stream(spark, str(src), base, ckpt)

    assert lakefs.read_text(spark, f"{base}/LATEST").strip() == str(v1 + 2)
    tables, manifest = read_snapshot(spark, base)
    assert manifest["residual"] is True  # format flags carried forward
    assert tables["codes"].count() == n0 + 50
    # quantizers are FROZEN across streamed appends
    cb1 = sorted(
        (r.m, r.cid, tuple(r.centroid))
        for r in tables["codebooks"].collect()
    )
    assert cb0 == cb1
    # new codes verify against the frozen quantizers in numpy: for one
    # streamed vector, code_m is the argmin centroid of its residual
    coarse = {r.cid: np.array(r.centroid) for r in tables["coarse"].collect()}
    cbs = {
        (r.m, r.cid): np.array(r.centroid)
        for r in tables["codebooks"].collect()
    }
    new_row = (
        tables["codes"].filter(F.col("vec_id") >= 700_000).head()
    )
    vec = np.array(
        spark.read.parquet(str(src))
        .filter(F.col("vec_id") == new_row.vec_id)
        .head()
        .embedding,
        dtype=np.float64,
    )
    resid = vec - coarse[new_row.cell]
    from novelti_dingo_spark.operators.pq import K as PQ_K, M, SUBDIM

    for m in range(M):
        sub = resid[m * SUBDIM:(m + 1) * SUBDIM]
        dists = {
            cid: float(((cbs[(m, cid)] - sub) ** 2).sum())
            for cid in range(PQ_K)
            if (m, cid) in cbs
        }
        best = min(dists, key=lambda c: (dists[c], c))
        assert new_row.codes[m] == best
    # a reader pinned to v1 is byte-stable through the appends
    pinned_after = [
        (r.vec_id, r.pq_sim)
        for r in ivfpq_knn_from_index(
            spark, base, q, version=v1, n_probe=2, exclude_vec_id=0
        ).collect()
    ]
    assert pinned_after == pinned_before


def test_ivfpq_stream_replay_exactly_once_and_refusals(
    spark, sf_small, tmp_path
):
    """Mirrors the IVF stream's exactly-once coverage for the composed
    index: same-checkpoint rerun is a no-op, a forced replay (deleted
    commit marker) does not double-append even with an interleaved
    offline publish, and an untrained base is refused."""
    from novelti_dingo_spark.operators.pq import (
        append_vectors_to_ivfpq_index,
        publish_ivfpq_index,
    )
    from novelti_dingo_spark.streaming.ann_index import (
        ivfpq_index_append_stream,
    )

    with pytest.raises(ValueError, match="no published index"):
        ivfpq_index_append_stream(
            spark, str(tmp_path / "src"), str(tmp_path / "nope"),
            str(tmp_path / "ckpt0"),
        )

    base = str(tmp_path / "ivfpq")
    publish_ivfpq_index(spark, sf_small, base, k_cells=8)
    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 800_000, 10)
    ckpt = str(tmp_path / "ckpt")
    ivfpq_index_append_stream(spark, str(src), base, ckpt)
    v_after = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    n_after = read_snapshot(spark, base)[0]["codes"].count()
    # same checkpoint, nothing new: no publish
    ivfpq_index_append_stream(spark, str(src), base, ckpt)
    assert int(lakefs.read_text(spark, f"{base}/LATEST").strip()) == v_after
    # interleaved OFFLINE append + forced replay: guard holds
    extra = (
        load_table(spark, sf_small, "embeddings")
        .limit(4)
        .withColumn("vec_id", F.col("vec_id") + 900_000)
    )
    append_vectors_to_ivfpq_index(spark, base, extra)
    n_offline = read_snapshot(spark, base)[0]["codes"].count()
    assert n_offline == n_after + 4
    commit0 = os.path.join(ckpt, "commits", "0")
    os.remove(commit0)
    crc0 = os.path.join(os.path.dirname(commit0), ".0.crc")
    if os.path.exists(crc0):  # Hadoop ChecksumFs shadow file
        os.remove(crc0)
    ivfpq_index_append_stream(spark, str(src), base, ckpt)
    assert read_snapshot(spark, base)[0]["codes"].count() == n_offline


def test_pq_streamed_appends_encode_with_frozen_codebooks(
    spark, sf_small, tmp_path
):
    """Round-11: the PLAIN-PQ index (the last layout without appends)
    grows by stream — appended vectors get codes from the PUBLISHED
    codebooks, one delta snapshot per batch, pinned readers
    byte-stable, and a new code is numpy-verifiable against the frozen
    codebooks."""
    import numpy as np

    from novelti_dingo_spark.operators.pq import (
        K as PQ_K,
        M,
        SUBDIM,
        pq_knn_from_index,
        publish_pq_index,
    )
    from novelti_dingo_spark.streaming.ann_index import (
        pq_index_append_stream,
    )

    base = str(tmp_path / "pq")
    v1 = publish_pq_index(spark, sf_small, base)
    e = load_table(spark, sf_small, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).head().embedding]
    pinned_before = [
        (r.vec_id, r.pq_sim)
        for r in pq_knn_from_index(
            spark, base, q, version=v1, exclude_vec_id=0
        ).collect()
    ]
    t0, _ = read_snapshot(spark, base)
    n0 = t0["codes"].count()
    cb0 = sorted(
        (r.m, r.cid, tuple(r.centroid)) for r in t0["codebooks"].collect()
    )

    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 700_000, 30)
    _new_vec_file(src / "b.parquet", 700_100, 20)
    ckpt = str(tmp_path / "ckpt")
    pq_index_append_stream(spark, str(src), base, ckpt)

    assert lakefs.read_text(spark, f"{base}/LATEST").strip() == str(v1 + 2)
    tables, manifest = read_snapshot(spark, base)
    assert int(manifest["k"]) == PQ_K  # format keys carried forward
    assert tables["codes"].count() == n0 + 50
    cb1 = sorted(
        (r.m, r.cid, tuple(r.centroid))
        for r in tables["codebooks"].collect()
    )
    assert cb0 == cb1
    # new codes verify against the frozen codebooks in numpy (raw
    # subvector argmin — the plain-PQ layout has no coarse level)
    cbs = {
        (r.m, r.cid): np.array(r.centroid)
        for r in tables["codebooks"].collect()
    }
    new_row = tables["codes"].filter(F.col("vec_id") >= 700_000).head()
    vec = np.array(
        spark.read.parquet(str(src))
        .filter(F.col("vec_id") == new_row.vec_id)
        .head()
        .embedding,
        dtype=np.float64,
    )
    for m in range(M):
        sub = vec[m * SUBDIM:(m + 1) * SUBDIM]
        dists = {
            cid: float(((cbs[(m, cid)] - sub) ** 2).sum())
            for cid in range(PQ_K)
            if (m, cid) in cbs
        }
        best = min(dists, key=lambda c: (dists[c], c))
        assert new_row.codes[m] == best
    # the streamed vectors are SERVED through the resolved chain
    served = {
        r.vec_id
        for r in pq_knn_from_index(
            spark, base, q, k=n0 + 50, exclude_vec_id=0
        ).collect()
    }
    assert {700_000, 700_100} <= served
    # a reader pinned to v1 is byte-stable through the appends
    pinned_after = [
        (r.vec_id, r.pq_sim)
        for r in pq_knn_from_index(
            spark, base, q, version=v1, exclude_vec_id=0
        ).collect()
    ]
    assert pinned_after == pinned_before


def test_pq_stream_replay_exactly_once_and_refusals(
    spark, sf_small, tmp_path
):
    """Exactly-once coverage for the plain-PQ stream: same-checkpoint
    rerun is a no-op, a forced replay (deleted commit marker) does not
    double-append even with an interleaved offline append, and an
    untrained base is refused."""
    from novelti_dingo_spark.operators.pq import (
        append_vectors_to_pq_index,
        publish_pq_index,
    )
    from novelti_dingo_spark.streaming.ann_index import (
        pq_index_append_stream,
    )

    with pytest.raises(ValueError, match="no published index"):
        pq_index_append_stream(
            spark, str(tmp_path / "src"), str(tmp_path / "nope"),
            str(tmp_path / "ckpt0"),
        )

    base = str(tmp_path / "pq")
    publish_pq_index(spark, sf_small, base)
    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 800_000, 10)
    ckpt = str(tmp_path / "ckpt")
    pq_index_append_stream(spark, str(src), base, ckpt)
    v_after = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    n_after = read_snapshot(spark, base)[0]["codes"].count()
    pq_index_append_stream(spark, str(src), base, ckpt)
    assert int(lakefs.read_text(spark, f"{base}/LATEST").strip()) == v_after
    extra = (
        load_table(spark, sf_small, "embeddings")
        .limit(4)
        .withColumn("vec_id", F.col("vec_id") + 900_000)
    )
    append_vectors_to_pq_index(spark, base, extra)
    n_offline = read_snapshot(spark, base)[0]["codes"].count()
    assert n_offline == n_after + 4
    commit0 = os.path.join(ckpt, "commits", "0")
    os.remove(commit0)
    crc0 = os.path.join(os.path.dirname(commit0), ".0.crc")
    if os.path.exists(crc0):
        os.remove(crc0)
    pq_index_append_stream(spark, str(src), base, ckpt)
    assert read_snapshot(spark, base)[0]["codes"].count() == n_offline


def test_pq_append_rewrite_mode_and_mode_refusal(spark, sf_small, tmp_path):
    """mode='rewrite' republishes the FULL index (no delta_parent — a
    plain snapshot any reader resolves without chain machinery); an
    unknown mode is refused loudly."""
    from novelti_dingo_spark.operators.pq import (
        append_vectors_to_pq_index,
        publish_pq_index,
    )
    from novelti_dingo_spark.pipelines import read_snapshot as read_full

    base = str(tmp_path / "pq")
    publish_pq_index(spark, sf_small, base)
    n0 = read_full(spark, base)[0]["codes"].count()
    extra = (
        load_table(spark, sf_small, "embeddings")
        .limit(6)
        .withColumn("vec_id", F.col("vec_id") + 800_000)
    )
    with pytest.raises(ValueError, match="mode must be"):
        append_vectors_to_pq_index(spark, base, extra, mode="merge")
    append_vectors_to_pq_index(spark, base, extra, mode="rewrite")
    tables, manifest = read_full(spark, base)
    assert manifest.get("delta_parent") is None
    assert tables["codes"].count() == n0 + 6
    assert "codebooks" in tables  # full snapshot carries every table


def test_stream_auto_compaction_folds_chain_reader_stable(
    spark, sf_small, tmp_path
):
    """Round-11 auto-compaction policy: with compact_every=2 the
    stream folds the delta chain into a full snapshot as soon as the
    just-published manifest's chain_len reaches the threshold — an
    unattended ingest stream can no longer grow an unbounded chain.
    A reader pinned to a MID-CHAIN delta version resolves identical
    bytes before and after the fold (compaction only ADDS a snapshot),
    and the guard still treats the compacted snapshot as no epoch."""
    from novelti_dingo_spark.operators.pq import (
        pq_knn_from_index,
        publish_pq_index,
    )
    from novelti_dingo_spark.pipelines import read_snapshot as read_full
    from novelti_dingo_spark.streaming.ann_index import (
        pq_index_append_stream,
    )

    base = str(tmp_path / "pq")
    v1 = publish_pq_index(spark, sf_small, base)
    e = load_table(spark, sf_small, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).head().embedding]
    src = tmp_path / "newvecs"
    src.mkdir()
    _new_vec_file(src / "a.parquet", 700_000, 8)
    _new_vec_file(src / "b.parquet", 700_100, 8)
    ckpt = str(tmp_path / "ckpt")
    pq_index_append_stream(spark, str(src), base, ckpt, compact_every=2)
    # v1 full, v2 delta(len 1), v3 delta(len 2) -> compacted v4 (full)
    head_v = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    assert head_v == v1 + 3
    _, head_m = read_full(spark, base)
    assert head_m.get("delta_parent") is None
    assert head_m.get("compacted_chain") is True
    assert "chain_len" not in head_m  # a full snapshot starts a new chain
    # pinned mid-chain reader: identical bytes through the fold
    mid = [
        (r.vec_id, r.pq_sim)
        for r in pq_knn_from_index(
            spark, base, q, version=v1 + 2, k=20, exclude_vec_id=0
        ).collect()
    ]
    head = [
        (r.vec_id, r.pq_sim)
        for r in pq_knn_from_index(
            spark, base, q, k=20, exclude_vec_id=0
        ).collect()
    ]
    assert mid == head  # the fold changed layout, not content
    # next batch starts a fresh chain on top of the compacted snapshot
    _new_vec_file(src / "c.parquet", 700_200, 8)
    pq_index_append_stream(spark, str(src), base, ckpt, compact_every=2)
    _, m5 = read_full(spark, base)
    assert int(m5["chain_len"]) == 1
    assert int(m5["delta_parent"]) == head_v
    assert read_snapshot(spark, base)[0]["codes"].count() == 500 + 24
