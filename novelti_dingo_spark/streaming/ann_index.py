"""Streaming ANN index maintenance: new vectors stream into a
published index as incremental snapshots — the wiring between the
per-layout append verbs (IVF `append_vectors_to_index`, IVF-PQ
`append_vectors_to_ivfpq_index`, plain-PQ `append_vectors_to_pq_index`;
frozen quantizers, no retrain) and Structured Streaming's foreachBatch,
with the same exactly-once discipline as the CDC sink
(streaming/cdc.py):

- one published index snapshot per non-empty micro-batch;
- replay guard scoped to the checkpoint's identity: a crash between
  publish and checkpoint commit replays the batch, the
  (checkpoint_id, batch_id) pair recorded in the snapshot manifest
  detects it, and the publish is skipped — never a double-append;
- a FRESH checkpoint pointed at an existing index (epoch ids restart
  at 0) is not mistaken for a replay, because the guard only applies
  when the recorded identity matches the running checkpoint's.

Readers are never disturbed: publish_snapshot flips one LATEST pointer
atomically, so a query pinned to a snapshot version (the reproducible-
retrieval contract of ivf_knn_from_index) resolves the same bytes
before, during, and after any number of streamed appends. Retrain
stays an OFFLINE decision: monitor cell skew (ivf_cell_sizes) and
republish with publish_ivf_index when drift makes cells lopsided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.ivf import append_vectors_to_index
from ..sources import lakefs
from .cdc import (
    _checkpoint_identity,
    _last_stream_epoch,
    _record_stream_epoch,
)

# fold the delta chain back into one full snapshot once it reaches this
# many links (~one compaction per COMPACT_EVERY batches: the serve-side
# chain walk stays O(64) while the compaction write amortizes to
# corpus/64 bytes per batch). None disables the policy.
COMPACT_EVERY = 64


def _last_appended_epoch(spark: SparkSession, base: str, run_id: str) -> int:
    """Highest batch epoch already published into this index by THIS
    checkpoint lineage (snapshot-manifest flavor of the CDC guard:
    scans ALL snapshot manifests plus the per-checkpoint control file,
    so a non-stream publish — an offline append_vectors_to_index or a
    publish_ivf_index retrain — landing between the stream's publish
    and a crash-replay no longer hides the stream's own manifest
    behind LATEST; round-9 advice)."""
    return _last_stream_epoch(spark, base.rstrip("/"), run_id, "snap=")


def ivf_index_append_stream(
    spark: SparkSession,
    vectors_dir: str,
    index_base: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>, label int",
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """One incremental index-maintenance run (Trigger.AvailableNow):
    every new-vector file not yet in the checkpoint is assigned to the
    existing coarse centroids and published as the next index
    snapshot. The index must already exist (publish_ivf_index) — a
    stream cannot train the quantizer, only grow the postings."""
    _index_append_stream(
        spark, vectors_dir, index_base, checkpoint_dir, schema,
        append_vectors_to_index, "publish_ivf_index", compact_every,
    )


def ivfpq_index_append_stream(
    spark: SparkSession,
    vectors_dir: str,
    index_base: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>, label int",
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """Streaming maintenance of the COMPOSED IVF-PQ index (round-10):
    appended vectors are PQ-ENCODED per batch with the published
    codebooks (coarse-assign → residual-subtract if the snapshot is
    residual-encoded → frozen-codebook encode), one snapshot per
    non-empty batch, same exactly-once replay guard. Coarse centroids
    and codebooks republish unchanged — pinned readers are byte-stable
    and unpinned readers score in the same LUT space across appends.
    The retrain threshold (cell skew / residual-norm drift) is
    documented on append_vectors_to_ivfpq_index; the stream never
    retrains."""
    from ..operators.pq import append_vectors_to_ivfpq_index

    _index_append_stream(
        spark, vectors_dir, index_base, checkpoint_dir, schema,
        append_vectors_to_ivfpq_index, "publish_ivfpq_index",
        compact_every,
    )


def pq_index_append_stream(
    spark: SparkSession,
    vectors_dir: str,
    index_base: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>, label int",
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """Streaming maintenance of the PLAIN-PQ index (round-11 — the
    last of the three persisted layouts to gain appends): each batch is
    encoded with the FROZEN published codebooks and lands as a
    codes-only delta snapshot; same exactly-once replay guard, same
    auto-compaction policy. pq_knn_from_index resolves the chain."""
    from ..operators.pq import append_vectors_to_pq_index

    _index_append_stream(
        spark, vectors_dir, index_base, checkpoint_dir, schema,
        append_vectors_to_pq_index, "publish_pq_index", compact_every,
    )


def _index_append_stream(
    spark: SparkSession,
    vectors_dir: str,
    index_base: str,
    checkpoint_dir: str,
    schema: str,
    append_fn,
    trainer_name: str,
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    import json

    from ..pipelines import compact_snapshot_chain

    base = index_base.rstrip("/")
    if not lakefs.exists(spark, f"{base}/LATEST"):
        raise ValueError(
            f"{index_base} holds no published index — run "
            f"{trainer_name} first (streams append, they don't train)"
        )
    run_id = _checkpoint_identity(spark, checkpoint_dir)

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        if epoch_id <= _last_appended_epoch(spark, base, run_id):
            return  # replayed batch: already published
        v = append_fn(
            spark, base, batch,
            meta={"batch_id": int(epoch_id), "checkpoint_id": run_id},
        )
        # auto-compaction (round-11): an unattended delta-append stream
        # otherwise grows an unbounded chain (every serve call pays an
        # O(chain) manifest walk) until someone compacts manually. The
        # chain length comes from the just-published manifest's
        # chain_len counter — one O(1) read, no chain walk. Compaction
        # publishes a NEW full snapshot carrying no (checkpoint_id,
        # batch_id), so the replay guard is undisturbed; a crash
        # between append and compaction just leaves the chain one
        # batch longer for the next trigger. Pinned readers keep
        # resolving the old chain until vacuum — byte-stable.
        if compact_every is not None:
            manifest = json.loads(
                lakefs.read_text(spark, f"{base}/snap={v}/_manifest.json")
            )
            if int(manifest.get("chain_len", 0)) >= compact_every:
                v = compact_snapshot_chain(spark, base)
        _record_stream_epoch(spark, base, run_id, epoch_id, version=v)

    q = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(vectors_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
