"""CDC apply stream: change-data-capture files → versioned parquet lake.

The end-to-end shape every warehouse ingestion needs: a stream of change
records (upserts + tombstones, with a per-key sequence) applied to a
target dataset with MERGE semantics, exactly once, atomically visible.

Composition of existing pieces — nothing bespoke:
- file-source streaming + checkpoint: each CDC file is read once;
- per-batch CDC *compaction*: latest image per key by (seq, tie-break)
  — without it a batch containing insert+update+delete for one key
  would apply in arbitrary order;
- `pipelines.merge_rows`: update/insert/delete via key anti joins
  (CDC-sized batches broadcast; the target never shuffles);
- `pipelines.publish_versioned`: the merged result becomes version N+1
  with an atomic LATEST flip — readers see old or new, never torn.

Exactly-once across crashes: the streaming checkpoint dedups INPUT
files, and each published manifest records the micro-batch epoch; on
replay (crash between publish and checkpoint commit) the epoch guard
skips re-publishing an already-applied batch, so the version history
stays one-version-per-batch instead of acquiring duplicates.

At 100 TB: versions share nothing (full rewrite per batch) — switch the
publish step to `upsert_by_partition` so each batch rewrites only the
partitions its keys touch; the merge/compaction/guard logic is
unchanged. That swap is the known trade between snapshot simplicity and
write amplification.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..pipelines import merge_rows, publish_versioned, read_version
from ..sources import lakefs


def _last_stream_epoch(
    spark: SparkSession, base: str, run_id: str, version_prefix: str
) -> int:
    """Highest epoch already published by THIS checkpoint lineage.

    The epoch guard must be scoped to a checkpoint identity: streaming
    epoch ids restart at 0 whenever the checkpoint dir is deleted or a
    fresh checkpoint is pointed at an existing target, and an unscoped
    `epoch <= last` comparison would then silently skip every new batch
    — data loss with no error. Manifests record (checkpoint_id,
    batch_id); the guard applies only where the recorded identity
    matches the running checkpoint's.

    Two sources of truth, max'd (round-9 advice: reading only the
    LATEST manifest broke as soon as any non-stream publish landed
    between the stream's publish and a crash-replay — the guard saw a
    foreign checkpoint_id, returned -1, and the replayed batch was
    appended twice):

    - EVERY version/snapshot manifest whose checkpoint_id matches.
      The manifest is written atomically with the publish itself, so
      this survives a crash at any point after the publish — including
      before the control file below lands.
    - the per-checkpoint control file
      `{base}/_stream_ckpt/{run_id}.json`, written (atomic
      replace_text) AFTER each successful publish. It survives
      vacuum_versions/vacuum_snapshots reclaiming the old version dirs
      that carried the matching manifests.

    Neither alone is crash+vacuum proof; together the failure windows
    don't overlap (vacuum cannot run between a publish and the crash
    that loses the control-file write — that window contains no other
    work).

    Scan cost is BOUNDED by the control file's recorded publish
    version (round-11 advice: an unconditional all-manifest scan per
    micro-batch was O(versions) JVM reads per batch, O(n²) over a
    delta-append stream's lifetime): publishes by one checkpoint
    lineage are totally ordered and version numbers strictly increase,
    so a manifest at version ≤ the control file's recorded version
    cannot carry a higher batch_id for this run_id than the control
    file itself — only NEWER versions (the crash window since the last
    control-file write, normally zero or one publish) are read. A
    legacy control file without the version key falls back to the full
    scan."""
    hi = -1
    known_version = -1
    ctrl = f"{base}/_stream_ckpt/{run_id}.json"
    if lakefs.exists(spark, ctrl):
        rec = json.loads(lakefs.read_text(spark, ctrl))
        hi = int(rec.get("batch_id", -1))
        known_version = int(rec.get("version", -1))
    if not lakefs.exists(spark, f"{base}/LATEST"):
        return hi
    for name in lakefs.listdir(spark, base):
        if not (
            name.startswith(version_prefix)
            and name.split("=")[1].isdigit()
        ):
            continue
        if int(name.split("=")[1]) <= known_version:
            continue  # already reflected in the control file's mark
        mpath = f"{base}/{name}/_manifest.json"
        if not lakefs.exists(spark, mpath):
            continue  # crash-orphaned partial version: no manifest yet
        manifest = json.loads(lakefs.read_text(spark, mpath))
        if manifest.get("checkpoint_id") == run_id:
            hi = max(hi, int(manifest.get("batch_id", -1)))
    return hi


def _record_stream_epoch(
    spark: SparkSession,
    base: str,
    run_id: str,
    epoch_id: int,
    version: int | None = None,
) -> None:
    """Persist the checkpoint's high-water mark in its own control file
    (vacuum-proof half of the replay guard — see _last_stream_epoch).
    `version` = the publish version that carried this epoch; recording
    it lets the guard skip every manifest at or below it on the next
    batch (the scan bound above)."""
    lakefs.mkdirs(spark, f"{base}/_stream_ckpt")
    lakefs.replace_text(
        spark,
        f"{base}/_stream_ckpt/{run_id}.json",
        json.dumps(
            {"batch_id": int(epoch_id)}
            | ({"version": int(version)} if version is not None else {})
        ),
    )


def _last_applied_epoch(spark: SparkSession, base: str, run_id: str) -> int:
    """CDC flavor of the replay guard (versions live at `v=N`)."""
    return _last_stream_epoch(spark, base, run_id, "v=")


def _checkpoint_identity(spark: SparkSession, checkpoint_dir: str) -> str:
    """Stable identity for one checkpoint lineage: a marker file inside
    the checkpoint dir, created on first use, destroyed with it. Written
    through the Hadoop FS API so any checkpoint scheme (file/hdfs/s3a)
    works."""
    marker = f"{checkpoint_dir.rstrip('/')}/_cdc_identity"
    if lakefs.exists(spark, marker):
        return lakefs.read_text(spark, marker).strip()
    import uuid

    ident = uuid.uuid4().hex
    lakefs.mkdirs(spark, checkpoint_dir.rstrip("/"))
    lakefs.write_text(spark, marker, ident)
    return ident


def compact_cdc_batch(
    batch: DataFrame, key_cols: list[str], seq_col: str = "seq"
) -> DataFrame:
    """Latest change image per key within the batch (highest seq wins;
    ties break on the tombstone so a delete at the same seq is final)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), F.desc("_deleted")
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdc_apply_stream(
    spark: SparkSession,
    updates_dir: str,
    target_base: str,
    checkpoint_dir: str,
    key_cols: list[str],
    schema: StructType,
    seq_col: str = "seq",
) -> None:
    """One incremental CDC run (Trigger.AvailableNow): apply all CDC
    files not yet in the checkpoint to the versioned target, one
    published version per micro-batch. Change rows carry `seq` (per-key
    ordering) and `_deleted` (tombstone)."""
    base = target_base.rstrip("/")
    payload_cols = [
        f.name for f in schema.fields if f.name not in (seq_col, "_deleted")
    ]
    run_id = _checkpoint_identity(spark, checkpoint_dir)

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # replay guard (crash between publish and checkpoint commit) —
        # scoped to this checkpoint's identity so a fresh checkpoint
        # (epoch ids restart at 0) is never mistaken for a replay
        if epoch_id <= _last_applied_epoch(spark, base, run_id):
            return
        latest = compact_cdc_batch(batch, key_cols, seq_col)
        upserts = latest.filter(~F.col("_deleted")).select(*payload_cols)
        deletes = latest.filter(F.col("_deleted")).select(*key_cols)
        if lakefs.exists(spark, f"{base}/LATEST"):
            target, _ = read_version(spark, base)
        else:
            target = spark.createDataFrame([], upserts.schema)
        merged = merge_rows(target, upserts, key_cols, deletes)
        v = publish_versioned(
            merged,
            base,
            meta={"batch_id": int(epoch_id), "checkpoint_id": run_id},
        )
        _record_stream_epoch(spark, base, run_id, epoch_id, version=v)

    q = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(updates_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_append_publish(
    spark: SparkSession,
    src_dir: str,
    target_base: str,
    checkpoint_dir: str,
    schema: StructType,
    stats_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Streaming ingestion into the append-chain lake: one incremental
    run (Trigger.AvailableNow) turns each micro-batch into ONE
    `publish_append` version — O(batch) write, atomic LATEST flip, and
    per-file min/max stats recorded at publish so `read_chain_pruned`
    data-skips across every ingested segment from the moment it lands.

    Exactly-once: the same (checkpoint-identity, epoch) guard as
    cdc_apply_stream — a replayed micro-batch (crash between publish
    and checkpoint commit, or a manual re-run) is recognized by its
    epoch id and skipped, so the chain never holds a duplicate segment;
    a FRESH checkpoint pointed at the same target gets a new identity
    and is NOT silently skipped.

    This is the streaming half of the lake story: batch compaction
    (`publish_versioned` full snapshot) truncates the chain the stream
    grows — the Iceberg append-commit / rewrite-commit pair on this
    manifest format.

    `partition_by` streams each micro-batch in as a HIVE-partitioned
    segment (publish_append partition-spec rules apply: mutually
    exclusive with stats_cols — directory names are the skipping index);
    chain readers compose these segments with flat ones, so a stream can
    adopt partitioning mid-chain without touching history."""
    from ..pipelines import publish_append

    base = target_base.rstrip("/")
    run_id = _checkpoint_identity(spark, checkpoint_dir)

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        if int(epoch_id) <= _last_applied_epoch(spark, base, run_id):
            return
        v = publish_append(
            batch,
            base,
            meta={"checkpoint_id": run_id, "batch_id": int(epoch_id)},
            stats_cols=stats_cols,
            partition_by=partition_by,
        )
        # control file: vacuum-proofs the mark AND bounds the guard's
        # next manifest scan to versions newer than v
        _record_stream_epoch(spark, base, run_id, int(epoch_id), version=v)

    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
