"""Structured Streaming pipeline over the events stream (SURVEY.md §2.9,
streaming forms of ST1-ST5).

The batch operators in ``operators.events_ops`` define the oracle-checked
semantics; this module runs the SAME transformations under
``spark.readStream`` — `F.window` calls are shared verbatim, sessionization
swaps the lag+cumsum idiom for the native `session_window`, dedup swaps
row_number for `dropDuplicatesWithinWatermark`.

At production scale the source is Kafka/files-on-arrival; here the file
source replays the events parquet, which is time-ordered (FIXTURES.md), so
watermark semantics behave as they would live.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events table as a stream (ts-encoding
    sniff + ns→µs conversion identical to the batch reader)."""
    import os

    from ..sources.io import events_ts_is_nanos

    # the file source requires a directory; filter to the events file
    ns = events_ts_is_nanos(os.path.join(sf_dir, "events.parquet"))
    df = (
        spark.readStream.schema(
            schemas.EVENTS_TS_NS if ns else schemas.EVENTS
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ns:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST1 streaming: tumbling 1h × event_type with late-data watermark.
    Identical `F.window` call to the batch `tumbling_1h_agg`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST2 streaming: sliding 1h/15min windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """ST3 streaming: native session windows (30-min inactivity gap) —
    the stateful twin of the batch lag+cumsum sessionizer."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def windowed_topk(
    events: DataFrame, k: int = 3, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming top-k with watermark: top-k events by value per (1h
    tumbling window × event_type), sharing `topk_struct_agg` VERBATIM
    with the oracle-checked batch query `windowed_topk_1h` — rank
    windows can't run on streams, an aggregate expression can. In
    append mode a window's top-k is emitted exactly once, when the
    watermark closes the window; a later (late) row can never revise an
    emitted top-k, and state for closed windows is dropped — memory is
    bounded by the rows of OPEN windows only."""
    from ..operators.events_ops import topk_struct_agg

    g = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(topk_struct_agg(k).alias("top"))
    )
    return (
        g.select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            F.posexplode("top").alias("pos", "t"),
        )
        .select(
            "bucket_start",
            "event_type",
            F.col("t.event_id").alias("event_id"),
            F.col("t.value").alias("value"),
            (F.col("pos") + 1).cast("long").alias("rn"),
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST5 streaming: state-bounded dedup on (user_id, event_type) — state
    for a key is dropped once the watermark passes it, so memory is bounded
    by stream rate × watermark horizon, not stream history."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append"):
    """Drain a streaming DataFrame into an in-memory table (test harness:
    processes all available input, then stops). Returns the query name to
    SELECT from."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def purchases_with_recent_click(
    events: DataFrame, horizon: str = "2 hours", how: str = "inner"
) -> DataFrame:
    """Stream-stream join: purchases matched to clicks by the same
    user within the preceding `horizon`. Both sides carry watermarks so
    state is bounded — Spark buffers each side only until the watermark
    passes the join window (the canonical bounded-state stream join).

    `how="left_outer"`: every purchase survives. A purchase with no
    matching click is held in state until the WATERMARK passes its join
    window — only then can the engine prove no matching click can still
    arrive — and is emitted null-extended (click_id = -1, click_ts_us =
    -1, matching the batch twin `interval_join_pairs_outer`'s
    coalesce). The time-interval condition is what makes the outer join
    legal in streaming: it bounds how long either side's state must
    live, so the null-extension decision is reached in bounded memory
    at any scale. Consequence to plan for: outer rows lag the data by
    up to watermark + horizon, and purchases newer than the final
    watermark stay unemitted until more data advances it
    (tests/test_streaming.py pushes a sentinel event to flush)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""p_user = c_user
                AND click_ts <= purchase_ts
                AND click_ts >= purchase_ts - INTERVAL {horizon}"""
        ),
        how,
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.coalesce(F.col("click_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(F.unix_micros("click_ts"), F.lit(-1)).alias(
            "click_ts_us"
        ),
    )


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with the (batch)
    customer dimension — the broadcast lookup every streaming pipeline
    needs. The static side is re-resolved per micro-batch, so a slowly
    refreshed dim table is picked up without restarting the query."""
    c = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    return events.join(F.broadcast(c), "user_id", "left")


def run_enrich_with_lake_dim(
    spark: SparkSession,
    src_dir: str,
    dim_base: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    join_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: list[str] | None = None,
    pin_version: int | None = None,
    after_batch=None,
) -> None:
    """Stream-static join against the VERSIONED lake dimension with
    per-micro-batch refresh: each batch re-resolves the dim's LATEST
    pointer (pipelines.read_version) and broadcast-joins it, so a dim
    publish landing BETWEEN micro-batches is picked up by the very next
    batch without restarting the query — the piece a plain static-
    DataFrame join cannot do (its file listing is frozen at plan time,
    and a versioned publish lands in a NEW v=N directory the frozen
    listing has never seen). Every output row carries `_dim_version`, so
    downstream consumers can SEE which dim snapshot enriched it — the
    auditability half of slowly-changing-dimension streaming.

    `pin_version` freezes the dim instead (reproducible runs: the
    training-data posture); `after_batch(epoch_id)` is a hook invoked
    after each batch commit (tests use it to publish a new dim version
    mid-query and prove the refresh).

    Output is written per-epoch to `out_dir/epoch=N` with overwrite —
    a replayed micro-batch (at-least-once foreachBatch) rewrites its own
    epoch directory, never duplicates. At 100 TB the dim side is a k-row
    broadcast per batch; the stream side never shuffles."""
    from ..pipelines import read_version

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            if after_batch is not None:
                after_batch(int(epoch_id))
            return
        dim, manifest = read_version(spark, dim_base, version=pin_version)
        d = dim.withColumnRenamed(dim_key, join_key)
        if dim_cols:
            d = d.select(join_key, *dim_cols)
        out = batch.join(F.broadcast(d), join_key, "left").withColumn(
            "_dim_version", F.lit(int(manifest["version"]))
        )
        out.write.mode("overwrite").parquet(
            f"{out_dir.rstrip('/')}/epoch={int(epoch_id)}"
        )
        if after_batch is not None:
            after_batch(int(epoch_id))

    q = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merge_hourly_batch(
    batch_df: DataFrame, batch_id: int, target_dir: str
) -> None:
    """Merge one micro-batch's hourly deltas into the parquet mart,
    IDEMPOTENTLY per batch_id.

    foreachBatch gives at-least-once delivery: after a crash between the
    mart write and the checkpoint commit, Structured Streaming REPLAYS the
    micro-batch with the same batch_id. A naive additive merge would
    double-count it. Every mart row therefore carries `last_batch_id` —
    the id of the last batch folded into it; the merge adds a delta only
    when `batch_id > last_batch_id`, so a replayed batch is a no-op and
    the additive merge becomes effectively exactly-once. The marker lives
    in the same parquet rows as the counts, so data and progress commit
    together (no separate marker file to tear).

    Partition hygiene: touched hours are selected with a broadcast semi
    join (no driver-side collect of partition values); only those
    partitions are read and rewritten (dynamic partition overwrite via
    upsert_by_partition)."""
    from ..pipelines import upsert_by_partition
    from ..sources import lakefs

    spark = batch_df.sparkSession
    hourly = (
        batch_df.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("hour_key", F.date_format("hour", "yyyyMMddHH"))
        .withColumn("row_key", F.concat_ws("|", "hour_key", "event_type"))
        .drop("hour")
    )
    if not lakefs.exists(spark, target_dir):
        if hourly.isEmpty():
            # an empty FIRST batch must not create the mart: a zero-row
            # write leaves a schema-less parquet dir (only _SUCCESS) that
            # poisons every later read — leave creation to the first
            # non-empty batch instead
            return
        hourly.withColumn("last_batch_id", F.lit(batch_id)).write.partitionBy(
            "hour_key"
        ).parquet(target_dir)
        return
    existing = spark.read.parquet(target_dir)
    prev = existing.join(
        F.broadcast(hourly.select("hour_key").distinct()),
        "hour_key",
        "left_semi",
    ).select(
        "row_key",
        "hour_key",
        "event_type",
        F.col("n_events").alias("p_n"),
        F.col("sum_value").alias("p_s"),
        "last_batch_id",
    )
    delta = hourly.select(
        "row_key",
        "hour_key",
        "event_type",
        F.col("n_events").alias("d_n"),
        F.col("sum_value").alias("d_s"),
    )
    j = prev.join(delta, ["row_key", "hour_key", "event_type"], "full_outer")
    # fresh = this batch's delta has not been folded into the row yet
    fresh = F.col("d_n").isNotNull() & (
        F.coalesce(F.col("last_batch_id"), F.lit(-1)) < F.lit(batch_id)
    )
    combined = j.select(
        "row_key",
        "hour_key",
        "event_type",
        F.when(fresh, F.coalesce(F.col("p_n"), F.lit(0)) + F.col("d_n"))
        .otherwise(F.col("p_n"))
        .alias("n_events"),
        F.round(
            F.when(fresh, F.coalesce(F.col("p_s"), F.lit(0.0)) + F.col("d_s"))
            .otherwise(F.col("p_s")),
            2,
        ).alias("sum_value"),
        F.when(fresh, F.lit(batch_id))
        .otherwise(F.col("last_batch_id"))
        .alias("last_batch_id"),
    )
    upsert_by_partition(
        spark, target_dir, combined, key="row_key", partition_col="hour_key"
    )


def stream_upsert_hourly_counts(
    events: DataFrame, target_dir: str, checkpoint_dir: str
):
    """foreachBatch sink: maintain an hourly-counts mart from the stream.
    Each micro-batch aggregates its slice and MERGES into the parquet
    mart via partition-surgical upsert — the streaming-refresh pattern for
    marts that downstream batch queries read directly. The merge is
    idempotent per batch_id (see merge_hourly_batch), which upgrades
    foreachBatch's at-least-once replay to effective exactly-once."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_hourly_batch(batch_df, batch_id, target_dir)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def events_per_segment_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-static join: the event stream enriched with the STATIC
    customer dimension (broadcast per micro-batch — the dimension is
    re-resolved each batch, so a slowly-refreshed dim table is picked up
    without restarting the query), aggregated per market segment in
    update mode. Batch twin: operators.extras.events_per_segment — the
    parity test pins stream ≡ batch over a full replay."""
    from ..sources.io import load_table

    ev = stream_events(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def run_enrich_inner_with_retry(
    spark: SparkSession,
    src_dir: str,
    dim_base: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    join_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: list[str] | None = None,
    max_wait_batches: int = 3,
    max_wait_event_time: str | None = None,
    raw_ts_unit: str = "us",
    after_batch=None,
) -> None:
    """INNER-join stream enrichment with LATE-ARRIVAL retry: an event
    whose dim key does not resolve yet is NOT emitted with nulls (the
    left-join answer) and NOT dropped — it parks in a pending queue and
    retries against the refreshed dim on every subsequent micro-batch,
    emitting the moment its key arrives. This is the correct semantics
    when the dim is itself fed by a pipeline that can lag the stream
    (the new-customer-signup race every CDC-fed dimension has).

    Mechanics per micro-batch:
      1. combined = new batch rows (+`_waited`=0) ∪ current pending;
      2. dim LATEST re-resolved (same versioned-lake refresh as
         run_enrich_with_lake_dim); matched rows emit to
         `out_dir/epoch=N` with `_dim_version` (which snapshot resolved
         them — the dim-version watermark) and `_waited` (how many
         batches they waited: join-latency observability for free);
      3. unmatched rows expire to `out_dir/_deadletter/epoch=N`
         (bounded state: a key that never arrives cannot grow the
         queue forever — the standard watermark-expiry tradeoff, made
         explicit). Two expiry clocks: `max_wait_batches` (processing
         time — simple, but a quiet stream ages rows slowly) or, when
         `max_wait_event_time` is set (e.g. "2 hours"), EVENT time —
         a row expires when the stream's observed event-time frontier
         (max ts across this batch's combined input, the same quantity
         a watermark tracks) has moved that far past the row's own ts.
         Event-time TTL is the production choice: replaying history
         fast ages rows exactly as the original stream did, so
         dead-letter decisions are REPLAY-STABLE;
      4. the rest republish as the next pending version — the queue is
         itself a versioned lake dataset, so state survives restarts
         via the LAKE, not the checkpoint (a checkpoint wipe loses only
         source progress, never parked rows), and `vacuum_versions`
         keeps it at 2 versions.

    Exactly-once: outputs write BEFORE the pending publish, and the
    pending manifest records the epoch; a replayed batch (at-least-once
    foreachBatch) whose epoch is already recorded is skipped wholesale,
    so neither outputs nor state double-apply. Each event therefore
    emits in EXACTLY one epoch: the first whose dim snapshot contains
    its key (eventual parity with the batch inner join — pinned by
    tests/test_stream_dim_refresh.py).

    At 100 TB: the dim and the pending queue are the small sides
    (broadcast + O(pending) republish); the stream side never shuffles.
    A pathological dim lag bounds pending at max_wait_batches x batch
    size — sized, not unbounded, state."""
    from ..pipelines import (
        publish_versioned,
        read_version,
        vacuum_versions,
    )
    from ..sources import lakefs

    pending_base = f"{checkpoint_dir.rstrip('/')}_pending"

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        have_pending = lakefs.exists(spark, f"{pending_base}/LATEST")
        if have_pending:
            pend, pmani = read_version(spark, pending_base)
            if int(pmani.get("retry_epoch", -1)) >= e:
                # replay of an already-applied epoch: outputs and state
                # are on disk (outputs write first) — skip wholesale
                if after_batch is not None:
                    after_batch(e)
                return
        else:
            pend = None
        combined = batch.withColumn("_waited", F.lit(0))
        if pend is not None:
            combined = combined.unionByName(pend)
        dim, manifest = read_version(spark, dim_base)
        d = dim.withColumnRenamed(dim_key, join_key)
        if dim_cols:
            d = d.select(join_key, *dim_cols)
        combined = combined.persist()
        try:
            matched = combined.join(F.broadcast(d), join_key).withColumn(
                "_dim_version", F.lit(int(manifest["version"]))
            )
            matched.write.mode("overwrite").parquet(
                f"{out_dir.rstrip('/')}/epoch={e}"
            )
            unmatched = combined.join(
                F.broadcast(d.select(join_key)), join_key, "left_anti"
            )
            if max_wait_event_time is not None:
                frontier = combined.agg(
                    F.max("ts").alias("_frontier")
                )
                unmatched = unmatched.join(F.broadcast(frontier))
                if dict(combined.dtypes)["ts"].startswith("timestamp"):
                    ttl = F.expr(f"INTERVAL {max_wait_event_time}")
                else:
                    # integer-typed ts carries the source's raw epoch
                    # encoding, whose unit only the CALLER knows
                    # (`raw_ts_unit`: "us" or "ns" — parquet stores
                    # either, and the sniffing the batch loader does is
                    # per-file, not available to a generic stream). The
                    # interval resolves to micros by anchoring at the
                    # epoch, then scales to the declared unit.
                    ttl_us = spark.sql(
                        "SELECT unix_micros(timestamp'1970-01-01 "
                        f"00:00:00+00:00' + INTERVAL {max_wait_event_time})"
                    ).head()[0]
                    scale = {"us": 1, "ns": 1000}[raw_ts_unit]
                    ttl = F.lit(int(ttl_us) * scale)
                expire_cond = F.col("ts") < F.col("_frontier") - ttl
            else:
                expire_cond = F.col("_waited") >= max_wait_batches
            expired = unmatched.filter(expire_cond)
            if not expired.isEmpty():
                expired.drop("_frontier").write.mode("overwrite").parquet(
                    f"{out_dir.rstrip('/')}/_deadletter/epoch={e}"
                )
            still_waiting = (
                unmatched.filter(~expire_cond)
                .withColumn("_waited", F.col("_waited") + 1)
                .drop("_frontier")
            )
            publish_versioned(
                still_waiting, pending_base, meta={"retry_epoch": e}
            )
            vacuum_versions(spark, pending_base, keep_last=2)
        finally:
            combined.unpersist()
        if after_batch is not None:
            after_batch(e)

    q = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def purchases_clicks_full_outer(
    events: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """FULL OUTER watermarked stream-stream interval join: matched
    (purchase, click) pairs in append mode, plus BOTH sides'
    null-extended remainders once the watermark proves no partner can
    still arrive — unmatched purchases (click_id = -1) AND unmatched
    clicks (purchase_id = -1), the symmetric completion of
    `purchases_with_recent_click(how="left_outer")`. The projection
    must coalesce EVERY column (either side can be the null one),
    including user_id, which exists on both. Batch twin:
    operators/interval.py interval_join_pairs_full_outer; the parity
    test replays the same files through both.

    Same bounded-state argument as the left-outer form, applied twice:
    the interval condition bounds each side's state lifetime, so both
    null-extension decisions land in bounded memory; both emission legs
    lag the data by up to watermark + horizon."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""p_user = c_user
                AND click_ts <= purchase_ts
                AND click_ts >= purchase_ts - INTERVAL {horizon}"""
        ),
        "full_outer",
    ).select(
        F.coalesce(F.col("purchase_id"), F.lit(-1)).alias("purchase_id"),
        F.coalesce(F.col("click_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        F.coalesce(F.unix_micros("purchase_ts"), F.lit(-1)).alias(
            "purchase_ts_us"
        ),
        F.coalesce(F.unix_micros("click_ts"), F.lit(-1)).alias(
            "click_ts_us"
        ),
    )
