"""The BROKER-SHAPED pipeline end-to-end (round-13, closing the
round-12 verdict's #6: the two halves were pinned separately): a
REPLAYABLE offset-cursor source (sources/synthetic.py — the stand-in
for a Kafka partition: data addressable by offset, readBetweenOffsets
regenerates identical rows) emits wire-format JSON lines with injected
corruption, the SOCKET module's source-agnostic parse/dead-letter
stage (streaming/socket_source.parse_event_lines) enforces the schema,
a watermark + stateful-dedup stage follows, and every micro-batch
publishes EXACTLY-ONCE into the append-chain lake through the
(checkpoint-identity, epoch) replay guard (streaming/cdc.py). One
pipeline, network parse → watermark → exactly-once publish — crashed
mid-stream, restarted from the checkpoint, and replay-attacked, with
the final lake state value-exact against the batch truth."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import publish_append, read_version_chain
from novelti_dingo_spark.sources.synthetic import (
    read_synthetic,
    register_synthetic_source,
)
from novelti_dingo_spark.streaming.cdc import (
    _checkpoint_identity,
    _last_applied_epoch,
    _record_stream_epoch,
)
from novelti_dingo_spark.streaming.socket_source import parse_event_lines

N_ROWS = 500
CORRUPT = "event_id % 97 = 13"  # 13,110,...,498 → 6 dead letters


def _wire(stream):
    """Serialize the cursor source to one JSON line per event — the
    broker wire format — corrupting a deterministic subset so the
    dead-letter decision is exercised INSIDE the composed pipeline."""
    body = F.to_json(
        F.struct(
            "event_id",
            "user_id",
            "event_type",
            # to_json truncates timestamps to milliseconds; the wire
            # carries full microsecond fidelity as an ISO string, which
            # from_json parses back losslessly
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
                "ts"
            ),
            F.col("value").cast("string").alias("value"),
        )
    )
    return stream.select(
        F.when(F.expr(CORRUPT), F.lit("{not json")).otherwise(body).alias(
            "value"
        )
    )


def test_broker_shaped_pipeline_exactly_once(spark, tmp_path):
    register_synthetic_source(spark)
    # Spark 4.1's state-store commit validator counts the dedup state
    # commit that happens while foreachBatch MATERIALIZES the batch
    # (persist/cache block-put) as out-of-phase and fails the replayed
    # batch with CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT — but a
    # stateful stage upstream of foreachBatch REQUIRES materialization
    # before the sink's own actions (the multi-action re-execution
    # footgun). Disable the validator for this pipeline shape; the
    # exactly-once property is asserted on the OUTPUT below, not
    # assumed from the validator.
    spark.conf.set(
        "spark.sql.streaming.stateStore.commitValidation.enabled", "false"
    )
    base = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    run_id_box = {}

    def start_query(trigger_kwargs):
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rows", str(N_ROWS))
            .option("rows_per_batch", "50")
            .load()
        )
        staged = (
            parse_event_lines(_wire(stream))
            .filter(~F.col("_corrupt"))
            .drop("_corrupt", "_raw")
            # the synthetic events' timestamps scatter across a YEAR,
            # so the watermark delay must exceed that spread: on
            # restart the engine restores watermark = max(ts seen) −
            # delay, and a 1-hour delay would classify nearly every
            # replayed-and-later row as late — the stateful dedup then
            # silently drops them (measured: 399 of 500 rows swallowed)
            .withWatermark("ts", "400 days")
            .dropDuplicates(["event_id"])
        )
        run_id = _checkpoint_identity(spark, ckpt)
        run_id_box["id"] = run_id

        def apply_batch(batch, epoch_id):
            # ONE action total on the batch (publish_append's single
            # observe+write): with a STATEFUL operator upstream of
            # foreachBatch, any second action — even isEmpty()/persist
            # materialization — re-executes the dedup and re-commits
            # its state store, which Spark 4.1 rejects
            # (CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT). The emptiness
            # guard is therefore NOT an action here; the epoch guard
            # reads only lake metadata.
            if int(epoch_id) <= _last_applied_epoch(spark, base, run_id):
                return  # crash-replayed batch: already published
            v = publish_append(
                batch,
                base,
                meta={"checkpoint_id": run_id, "batch_id": int(epoch_id)},
            )
            _record_stream_epoch(
                spark, base, run_id, int(epoch_id), version=v
            )

        w = staged.writeStream.foreachBatch(apply_batch).option(
            "checkpointLocation", ckpt
        )
        if trigger_kwargs:
            w = w.trigger(**trigger_kwargs)
        return w.start(), apply_batch

    def lake_count():
        import os

        if not os.path.exists(f"{base}/LATEST"):
            return 0, 0
        df, chain = read_version_chain(spark, base)
        return df.count(), len(chain)

    # ---- run 1: slow trigger, killed mid-stream after ≥1 publish
    q1, _ = start_query({"processingTime": "1 second"})
    deadline = time.time() + 120
    while time.time() < deadline:
        n, segs = lake_count()
        if segs >= 1:
            break
        time.sleep(0.3)
    q1.stop()
    n_mid, segs_mid = lake_count()
    assert segs_mid >= 1, "no micro-batch published before the crash"

    # ---- run 2: restart from the SAME checkpoint, drain to completion
    want = (
        read_synthetic(spark, rows=N_ROWS)
        .filter(f"NOT ({CORRUPT})")
        .select(
            "event_id",
            F.col("user_id").cast("int").alias("user_id"),
            "event_type",
            "ts",
            F.col("value").cast("string").alias("value"),
        )
    )
    n_want = want.count()
    assert n_want == N_ROWS - 6
    q2, apply_batch = start_query({})
    deadline = time.time() + 180
    while time.time() < deadline:
        n, _segs = lake_count()
        if n >= n_want:
            break
        time.sleep(0.5)
    q2.stop()

    got, chain = read_version_chain(spark, base)
    assert got.count() == n_want  # nothing lost, nothing duplicated
    assert got.select("event_id").distinct().count() == n_want
    assert sorted(
        map(tuple, got.select(*want.columns).collect())
    ) == sorted(map(tuple, want.collect()))
    # every segment carries the guard identity + a distinct epoch
    batch_ids = [seg["batch_id"] for seg in chain]
    assert len(set(batch_ids)) == len(batch_ids)
    assert {seg["checkpoint_id"] for seg in chain} == {run_id_box["id"]}

    # ---- replay attack: re-deliver an ALREADY-PUBLISHED epoch (the
    # crash-between-publish-and-checkpoint-commit window, simulated
    # deterministically) — the guard must skip it, no new version
    segs_before = len(chain)
    replayed = want.limit(7)
    apply_batch(replayed, min(batch_ids))
    _, chain_after = read_version_chain(spark, base)
    assert len(chain_after) == segs_before

    # ---- restart with nothing new: checkpoint replays nothing
    q3, _ = start_query({})
    time.sleep(4)
    q3.stop()
    final, chain_final = read_version_chain(spark, base)
    assert final.count() == n_want and len(chain_final) == segs_before
