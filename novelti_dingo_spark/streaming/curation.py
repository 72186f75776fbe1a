"""Streaming corpus curation: documents arriving as files become a
curated, partitioned parquet corpus continuously — the streaming form of
`pipelines.curate_corpus` stages 1 (exact dedup) and 3 (quality gate).

Design for the 100 TB / continuous-crawl posture:
- the file source lists new files per micro-batch (at production scale:
  an object-store landing prefix or Kafka of crawl records);
- exact dedup is STATEFUL streaming dedup on the 16-byte content hash —
  state is one hash per distinct document, never the text. Bounded-state
  variant: `dropDuplicatesWithinWatermark` once records carry an event
  time (a crawl timestamp), which this corpus lacks;
- the quality gate is the same pure row-level expression set as batch
  (`operators.text.with_quality`) — code shared verbatim, the core
  batch≡stream guarantee of Structured Streaming;
- the sink is parquet partitioned by lang with a checkpoint: end-to-end
  exactly-once (file-source offsets + transactional file-sink manifest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.text import with_quality


def stream_documents(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of documents-shaped parquet landing in
    `src_dir` (one micro-batch per listing of new files)."""
    return (
        spark.readStream.schema(schemas.TABLES["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def curate_stream(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """Streaming curation transform: content-hash exact dedup (stateful
    across micro-batches) + quality gate. Returns the curated stream with
    the quality columns attached."""
    hashed = docs.withColumn("content_hash", F.md5("text"))
    deduped = hashed.dropDuplicates(["content_hash"])
    return with_quality(deduped).filter(F.col("quality") >= min_quality)


def run_curate_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.5,
) -> None:
    """Drain everything currently in `src_dir` through the curation
    stream into a lang-partitioned parquet corpus, exactly-once
    (Trigger.AvailableNow processes all available input in bounded
    micro-batches, then stops — restartable from the checkpoint)."""
    curated = curate_stream(stream_documents(spark, src_dir), min_quality)
    (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("lang")
        .trigger(availableNow=True)
        .start()
        # no timeout: AvailableNow terminates on its own once the input is
        # drained; a timed wait could return with the query still running
        # (partial output + a leaked query holding the checkpoint lock)
        .awaitTermination()
    )
