"""Streaming ANN index maintenance: new vectors stream into the
published IVF index as incremental snapshots — the wiring between
`append_vectors_to_index` (assignment-only, no retrain) and Structured
Streaming's foreachBatch, with the same exactly-once discipline as the
CDC sink (streaming/cdc.py):

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

import json

from pyspark.sql import DataFrame, SparkSession

from ..operators.ivf import append_vectors_to_index
from ..sources import lakefs
from .cdc import _checkpoint_identity


def _last_appended_epoch(spark: SparkSession, base: str, run_id: str) -> int:
    """Highest batch epoch already published into this index by THIS
    checkpoint lineage (snapshot-manifest flavor of the CDC guard)."""
    b = base.rstrip("/")
    if not lakefs.exists(spark, f"{b}/LATEST"):
        return -1
    v = int(lakefs.read_text(spark, f"{b}/LATEST").strip())
    manifest = json.loads(
        lakefs.read_text(spark, f"{b}/snap={v}/_manifest.json")
    )
    if manifest.get("checkpoint_id") != run_id:
        return -1
    return int(manifest.get("batch_id", -1))


def ivf_index_append_stream(
    spark: SparkSession,
    vectors_dir: str,
    index_base: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>, label int",
) -> None:
    """One incremental index-maintenance run (Trigger.AvailableNow):
    every new-vector file not yet in the checkpoint is assigned to the
    existing coarse centroids and published as the next index
    snapshot. The index must already exist (publish_ivf_index) — a
    stream cannot train the quantizer, only grow the postings."""
    base = index_base.rstrip("/")
    if not lakefs.exists(spark, f"{base}/LATEST"):
        raise ValueError(
            f"{index_base} holds no published index — run "
            "publish_ivf_index first (streams append, they don't train)"
        )
    run_id = _checkpoint_identity(spark, checkpoint_dir)

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        if epoch_id <= _last_appended_epoch(spark, base, run_id):
            return  # replayed batch: already published
        append_vectors_to_index(
            spark, base, batch,
            meta={"batch_id": int(epoch_id), "checkpoint_id": run_id},
        )

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
