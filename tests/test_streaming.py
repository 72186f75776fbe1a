"""Structured Streaming vs batch equivalence: the streaming pipelines must
reproduce the oracle-checked batch semantics when replaying the full
events table (SURVEY.md §2.9 batch-first strategy)."""

from __future__ import annotations

import pytest

from novelti_dingo_spark import streaming
from novelti_dingo_spark.operators.events_ops import (
    stream_dedup_first,
    tumbling_1h_agg,
    windowed_topk_1h,
)


@pytest.fixture(scope="module")
def events_stream(spark, sf_small):
    return streaming.stream_events(spark, sf_small)


def test_stream_tumbling_equals_batch(spark, sf_small, events_stream):
    agg = streaming.tumbling_counts(events_stream)
    name = streaming.run_to_memory(agg, "t_tumble", mode="complete")
    got = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_1h_agg(spark, sf_small).collect()
    }
    assert got == want


def test_stream_dedup_counts_match_batch(spark, sf_small, events_stream):
    dedup = streaming.dedup_within_watermark(events_stream)
    name = streaming.run_to_memory(dedup, "t_dedup", mode="append")
    got = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n
    want = stream_dedup_first(spark, sf_small).count()
    # within-watermark dedup over an ordered replay keeps exactly the
    # first event per key, same as the batch row_number idiom
    assert got == want


def test_stream_sessions_complete(spark, sf_small, events_stream):
    sess = streaming.session_counts(events_stream)
    name = streaming.run_to_memory(sess, "t_sess", mode="complete")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert rows
    for r in rows:
        assert r.session_end_us >= r.session_start_us
        assert r.n_events >= 1


def test_stateful_running_stats_match_batch(spark, sf_small, events_stream):
    """applyInPandasWithState final per-user aggregates == batch groupBy."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.sources import load_table
    from novelti_dingo_spark.streaming.stateful import running_user_stats

    out = running_user_stats(events_stream)
    name = streaming.run_to_memory(out, "t_stateful", mode="update")
    # update mode emits one row per user per micro-batch; the final row
    # per user is the completed aggregate
    rows = spark.sql(
        f"""SELECT user_id, n_events, sum_value, last_ts_us FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) rn FROM {name}) WHERE rn = 1"""
    ).collect()
    got = {r.user_id: (r.n_events, r.sum_value, r.last_ts_us) for r in rows}
    want = {
        r.user_id: (r.n_events, r.sum_value, r.last_ts_us)
        for r in load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max(F.unix_micros("ts")).alias("last_ts_us"),
        )
        .collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_small, events_stream):
    """Stream-stream interval join == the same join run in batch."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.sources import load_table
    from novelti_dingo_spark.streaming.events import purchases_with_recent_click

    out = purchases_with_recent_click(events_stream)
    name = streaming.run_to_memory(out, "t_ssjoin", mode="append")
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    e = load_table(spark, sf_small, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 2 HOURS")),
        ).collect()
    }
    assert got == want
    assert got, "expected at least one purchase with a recent click"


def test_stream_stream_join_matches_oracle_checked_query(
    spark, sf_small, events_stream
):
    """Full evidence chain: the streaming interval join at a 1-hour
    horizon emits exactly the tuples of the DuckDB-oracle-checked batch
    query `interval_join_pairs` — stream ≡ batch ≡ oracle."""
    from novelti_dingo_spark.operators.interval import interval_join_pairs
    from novelti_dingo_spark.streaming.events import purchases_with_recent_click

    out = purchases_with_recent_click(events_stream, horizon="1 hour")
    name = streaming.run_to_memory(out, "t_ssjoin_oracle", mode="append")
    got = {
        (r.purchase_id, r.click_id, r.user_id, r.purchase_ts_us, r.click_ts_us)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.purchase_id, r.click_id, r.user_id, r.purchase_ts_us, r.click_ts_us)
        for r in interval_join_pairs(spark, sf_small).collect()
    }
    assert got == want
    assert got, "expected at least one joined pair at the 1h horizon"


def test_stream_static_enrichment(spark, sf_small, events_stream):
    from novelti_dingo_spark.sources import load_table
    from novelti_dingo_spark.streaming.events import enrich_with_customer

    cust = load_table(spark, sf_small, "customer")
    out = enrich_with_customer(events_stream, cust)
    name = streaming.run_to_memory(out, "t_enrich", mode="append")
    rows = spark.sql(
        f"SELECT count(*) AS n, count(c_mktsegment) AS m FROM {name}"
    ).collect()[0]
    assert rows.n == 1000
    assert rows.m == 1000  # every event's user exists in customer (FK measured)


def test_pane_sliding_equals_naive_window(spark, sf_small):
    """Regression net for the pane optimization: the pane-combined sliding
    aggregate must equal the naive F.window(1h, 15m) formulation."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.operators.events_ops import sliding_1h_15m_agg
    from novelti_dingo_spark.sources import load_table

    got = {
        (r.window_start): (r.n_events, r.sum_value)
        for r in sliding_1h_15m_agg(spark, sf_small).collect()
    }
    e = load_table(spark, sf_small, "events")
    naive = (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
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
    want = {r.window_start: (r.n_events, r.sum_value) for r in naive.collect()}
    assert got == want


def test_foreachbatch_upsert_mart(spark, sf_small, tmp_path):
    """Stream -> foreachBatch -> partition-surgical mart upsert: after a
    full replay, the mart equals the batch hourly aggregate."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.operators.events_ops import tumbling_1h_agg
    from novelti_dingo_spark.sources import load_table
    from novelti_dingo_spark.streaming.events import stream_upsert_hourly_counts

    target = str(tmp_path / "hourly_mart")
    ckpt = str(tmp_path / "ckpt")
    ev = streaming.stream_events(spark, sf_small)
    q = stream_upsert_hourly_counts(ev, target, ckpt)
    q.awaitTermination()
    mart = spark.read.parquet(target)
    # partition-column inference reads hour_key back as int; normalize
    got = {
        (str(r.hour_key), r.event_type): (r.n_events, r.sum_value)
        for r in mart.collect()
    }
    want = {}
    for r in tumbling_1h_agg(spark, sf_small).collect():
        import datetime

        hk = datetime.datetime.utcfromtimestamp(r.bucket_start).strftime("%Y%m%d%H")
        want[(hk, r.event_type)] = (r.n_events, r.sum_value)
    assert got == want


def test_merge_hourly_batch_replay_idempotent(spark, sf_small, tmp_path):
    """at-least-once replay safety: re-applying the SAME batch_id is a
    no-op (last_batch_id guard); a HIGHER batch_id with the same rows
    adds — proving the guard keys on batch progress, not row content."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.sources import load_table
    from novelti_dingo_spark.streaming.events import merge_hourly_batch

    target = str(tmp_path / "mart")
    batch = load_table(spark, sf_small, "events").limit(2000)

    def snapshot():
        return {
            (str(r.hour_key), r.event_type): (r.n_events, r.sum_value)
            for r in spark.read.parquet(target).collect()
        }

    merge_hourly_batch(batch, 0, target)
    first = snapshot()
    merge_hourly_batch(batch, 0, target)  # crash-replay of batch 0
    assert snapshot() == first
    merge_hourly_batch(batch, 1, target)  # genuinely new batch
    doubled = snapshot()
    assert doubled != first
    assert all(
        doubled[k][0] == 2 * first[k][0] for k in first
    )


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """ST4 end-to-end: a 1-hour watermark must DROP late rows that arrive
    in a later micro-batch after their window closed. Three files drained
    with maxFilesPerTrigger=1 under Trigger.AvailableNow: file1 advances
    the watermark, file3 carries a late row for an already-emitted window
    — the emitted aggregate must equal the batch aggregate of the on-time
    rows only.

    Why three files, not two: Spark's LATE-DATA filter uses the watermark
    as of the PREVIOUS batch, while window eviction uses the updated one
    (verified empirically — a late row arriving exactly one batch after
    its window closes is still merged). The late row therefore arrives
    two batches after file1 so the lagged filter watermark (H10:30)
    already covers its window [H2,H3)."""
    import datetime as dt
    import os

    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()

    def hour(h, minute=0):
        return dt.datetime(2024, 1, 1, h, minute)

    # file1: one event per hour H0..H10 (on time) → wm after it: H9:30
    f1 = pd.DataFrame(
        {
            "ts": [hour(h, 30) for h in range(11)],
            "event_type": ["click"] * 11,
            "value": [1.0] * 11,
        }
    )
    # file2: on-time row at H11 → wm advances to H10:30
    f2 = pd.DataFrame(
        {"ts": [hour(11, 30)], "event_type": ["click"], "value": [1.0]}
    )
    # file3: a LATE row at H2:45 ([H2,H3) closed long ago) + on-time H12
    f3 = pd.DataFrame(
        {
            "ts": [hour(2, 45), hour(12, 30)],
            "event_type": ["click", "click"],
            "value": [100.0, 1.0],
        }
    )
    # µs timestamps: the session reads parquet NANOS as long (nanosAsLong
    # conf for the testdata), which would clash with the declared schema;
    # mtimes force the file-source processing order
    for i, f in enumerate((f1, f2, f3), 1):
        path = src / f"f{i}.parquet"
        f.assign(ts=f["ts"].astype("datetime64[us]")).to_parquet(path)
        os.utime(path, (1_900_000_000 + i * 1000,) * 2)

    ev = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = streaming.tumbling_counts(ev, watermark="1 hour")
    name = streaming.run_to_memory(agg, "t_late", mode="append")
    got = {
        r.bucket_start: (r.n_events, r.sum_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    base = int(hour(0).replace(tzinfo=dt.timezone.utc).timestamp())
    # emitted: H0..H10 (each exactly one on-time event); H11/H12 still
    # open at drain end. The late H2 row must NOT appear: the H2 window
    # stays (1, 1.0).
    want = {base + 3600 * h: (1, 1.0) for h in range(11)}
    assert got == want


def test_stream_topk_equals_batch(spark, sf_small, events_stream):
    """Streaming top-k (windowed_topk) over a full replay must equal the
    oracle-checked batch query windowed_topk_1h row-for-row — both sides
    share topk_struct_agg, so this pins the streaming plumbing (window
    grouping, explode-after-agg, rank numbering)."""
    topk = streaming.windowed_topk(events_stream)
    name = streaming.run_to_memory(topk, "t_topk", mode="complete")
    got = {
        (r.bucket_start, r.event_type, r.rn): (r.event_id, r.value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.bucket_start, r.event_type, r.rn): (r.event_id, r.value)
        for r in windowed_topk_1h(spark, sf_small).collect()
    }
    assert got == want


def test_stream_topk_watermark_finality(spark, tmp_path):
    """Append-mode streaming top-k: once the watermark closes a window its
    top-k is FINAL — a late row with a larger value (which would rank #1)
    arriving two batches later must not re-emit or revise the window.
    Same three-file replay shape as the late-drop test above."""
    import datetime as dt
    import os

    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()

    def hour(h, minute=0):
        return dt.datetime(2024, 1, 1, h, minute)

    # file1: H0..H10, two events in H2 (values 5, 3) → wm after: H9:30
    f1 = pd.DataFrame(
        {
            "ts": [hour(h, 30) for h in range(11)] + [hour(2, 40)],
            "event_id": list(range(11)) + [100],
            "event_type": ["click"] * 12,
            "value": [5.0 if h == 2 else 1.0 for h in range(11)] + [3.0],
        }
    )
    # file2: on-time H11 → wm advances to H10:30, windows <= H10 close
    f2 = pd.DataFrame(
        {
            "ts": [hour(11, 30)],
            "event_id": [200],
            "event_type": ["click"],
            "value": [1.0],
        }
    )
    # file3: LATE H2 row with value 99 (would be rank 1) + on-time H12
    f3 = pd.DataFrame(
        {
            "ts": [hour(2, 45), hour(12, 30)],
            "event_id": [300, 301],
            "event_type": ["click", "click"],
            "value": [99.0, 1.0],
        }
    )
    for i, f in enumerate((f1, f2, f3), 1):
        path = src / f"f{i}.parquet"
        f.assign(ts=f["ts"].astype("datetime64[us]")).to_parquet(path)
        os.utime(path, (1_900_000_000 + i * 1000,) * 2)

    ev = (
        spark.readStream.schema(
            "ts timestamp, event_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    topk = streaming.windowed_topk(ev, k=3, watermark="1 hour")
    name = streaming.run_to_memory(topk, "t_topk_late", mode="append")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    base = int(hour(0).replace(tzinfo=dt.timezone.utc).timestamp())
    h2 = {
        (r.rn): (r.event_id, r.value)
        for r in rows
        if r.bucket_start == base + 2 * 3600
    }
    # H2's final top-3: the on-time values (5.0, 3.0) ranked by value
    # desc — the late 99.0 row is gone, not rank 1
    assert h2 == {1: (2, 5.0), 2: (100, 3.0)}
    # every closed window emitted exactly once, no revision rows
    emitted = [
        (r.bucket_start, r.event_type, r.rn) for r in rows
    ]
    assert len(emitted) == len(set(emitted))


def test_transform_with_state_matches_batch(spark, sf_small, events_stream):
    """transformWithStateInPandas (Spark 4 stateful API) drains to the
    same per-user aggregates as the batch groupBy — and therefore agrees
    with the applyInPandasWithState operator tested above.

    This test EXECUTES the real state protocol end-to-end: the python
    worker drives the JVM state server over protobuf — served by the
    real `google.protobuf` when installed, else by the clean-room
    wire-format shim (novelti_dingo_spark.protobuf_fallback, activated
    by session.get_spark before the JVM spawned). transformWithState
    additionally requires the RocksDB state store provider; restore
    the session default afterwards so other streaming tests keep the
    HDFS-backed provider they were written against."""
    from pyspark.sql import functions as F

    from novelti_dingo_spark.protobuf_fallback import ensure_protobuf
    from novelti_dingo_spark.sources import load_table
    from novelti_dingo_spark.streaming.stateful import running_user_stats_tws

    assert ensure_protobuf() in ("real", "shim")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = running_user_stats_tws(events_stream)
        name = streaming.run_to_memory(out, "t_tws", mode="update")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    rows = spark.sql(
        f"""SELECT user_id, n_events, sum_value, last_ts_us FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) rn FROM {name}) WHERE rn = 1"""
    ).collect()
    got = {r.user_id: (r.n_events, r.sum_value, r.last_ts_us) for r in rows}
    want = {
        r.user_id: (r.n_events, r.sum_value, r.last_ts_us)
        for r in load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max(F.unix_micros("ts")).alias("last_ts_us"),
        )
        .collect()
    }
    assert got == want


def test_stateful_ewma_matches_batch_fold(spark, sf_small, events_stream):
    """running_user_ewma (constant-memory stateful) final rows must equal
    the batch unbounded fold ewma_running_final — same recurrence, same
    (ts, event_id) order, bit-identical doubles."""
    from novelti_dingo_spark.operators.timeseries import ewma_running_final
    from novelti_dingo_spark.streaming.stateful import running_user_ewma

    out = running_user_ewma(events_stream)
    name = streaming.run_to_memory(out, "t_ewma", mode="update")
    rows = spark.sql(
        f"""SELECT user_id, n_events, ewma_final FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) rn FROM {name}) WHERE rn = 1"""
    ).collect()
    got = {r.user_id: (r.n_events, r.ewma_final) for r in rows}
    want = {
        r.user_id: (r.n_events, r.ewma_final)
        for r in ewma_running_final(spark, sf_small).collect()
    }
    assert got == want


def test_stream_events_reads_ns_encoded_files(spark, tmp_path):
    """stream_events must sniff TIMESTAMP(NANOS) source files and convert
    to µs exactly like the batch reader (regression for the testdata
    encoding flip)."""
    import pandas as pd

    d = tmp_path / "nsdir"
    d.mkdir()
    base = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:07.179575", "2024-01-02 12:00:00.000001"]
            ).astype("datetime64[ns]"),
            "user_id": [1, 2],
            "event_type": ["click", "view"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    base.to_parquet(d / "events.parquet", coerce_timestamps=None)
    ev = streaming.stream_events(spark, str(d))
    name = streaming.run_to_memory(ev, "t_nsenc", mode="append")
    rows = spark.sql(f"SELECT ts FROM {name} ORDER BY ts").collect()
    assert [r.ts.isoformat() for r in rows] == [
        "2024-01-01T00:00:07.179575",
        "2024-01-02T12:00:00.000001",
    ]


def test_stream_static_join_matches_batch(spark, sf_small):
    """Stream-static dim enrichment == the batch join+agg on full replay
    (counts exact; avg to 6dp like the oracle canonicalization)."""
    from novelti_dingo_spark.operators.extras import events_per_segment
    from novelti_dingo_spark.streaming.events import events_per_segment_stream

    out = events_per_segment_stream(spark, sf_small)
    name = streaming.run_to_memory(out, "t_ss_dim", mode="complete")
    got = {
        r.c_mktsegment: (r.n_events, r.avg_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        r.c_mktsegment: (r.n_events, r.avg_value)
        for r in events_per_segment(spark, sf_small)
        .select("c_mktsegment", "n_events", "avg_value")
        .collect()
    }
    assert got == want


def test_stateful_rolling_median_matches_batch_window(
    spark, sf_small, events_stream
):
    """rolling_user_median (bounded-buffer stateful stream) must emit,
    for every event of the filtered users, the SAME rolling median the
    batch percentile-window query computes — interpolation reproduced
    exactly, so raw doubles compare equal."""
    from novelti_dingo_spark.operators.timeseries import (
        rolling_median_value,
    )
    from novelti_dingo_spark.streaming.stateful import rolling_user_median

    from pyspark.sql import functions as F2

    out = rolling_user_median(
        events_stream.filter(F2.col("user_id") < 30)
    )
    name = streaming.run_to_memory(out, "t_rollmed", mode="append")
    got = {
        r.event_id: (r.user_id, r.value, round(r.rolling_med, 6))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        r.event_id: (r.user_id, r.value, r.rolling_med)
        for r in rolling_median_value(spark, sf_small).collect()
    }
    assert got == want and len(want) > 0


def test_stateful_sessionize_ttl_eviction(spark, tmp_path):
    """Sessionization with EVENT-TIME TTL: a session closes either when
    a later in-stream event exceeds the gap (user A) or when the
    WATERMARK passes last_event + gap with no further data (user B —
    pure timeout eviction, the timer/TTL mechanism). Open sessions are
    never emitted (append finality)."""
    import datetime as dt
    import os

    import pandas as pd

    from novelti_dingo_spark.streaming.stateful import sessionize_stateful

    src = tmp_path / "src"
    src.mkdir()

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    def us(h, m):
        return int(
            t(h, m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )

    # f1: A has 2 events 10:00/10:10 (one session); B has 1 at 10:05
    f1 = pd.DataFrame(
        {
            "ts": [t(10, 0), t(10, 10), t(10, 5)],
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 2],
            "value": [1.0, 2.0, 5.0],
        }
    )
    # f2: A again at 12:00 — gap > 30min closes A's first session inline
    # and advances the watermark past B.last + gap (10:35)
    f2 = pd.DataFrame(
        {
            "ts": [t(12, 0)],
            "event_id": [4],
            "user_id": [1],
            "value": [3.0],
        }
    )
    # f3: unrelated user C — its batch fires B's pending timeout
    f3 = pd.DataFrame(
        {
            "ts": [t(13, 0)],
            "event_id": [5],
            "user_id": [3],
            "value": [7.0],
        }
    )
    for i, f in enumerate((f1, f2, f3), 1):
        path = src / f"f{i}.parquet"
        f.assign(ts=f["ts"].astype("datetime64[us]")).to_parquet(str(path))
        os.utime(path, (1_900_000_000 + i * 1000,) * 2)

    ev = spark.readStream.schema(
        "ts timestamp, event_id long, user_id long, value double"
    ).option("maxFilesPerTrigger", "1").parquet(str(src))
    out = sessionize_stateful(ev, watermark="15 minutes")
    name = streaming.run_to_memory(out, "t_sess_ttl", mode="append")
    got = {
        (r.user_id, r.session_start_us): (
            r.session_end_us,
            r.n_events,
            r.sum_value,
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (1, us(10, 0)): (us(10, 10), 2, 3.0),  # closed by in-stream gap
        (2, us(10, 5)): (us(10, 5), 1, 5.0),   # closed by TTL timeout
        # A's 12:00 session: f3 advances the watermark to 12:45, past its
        # 12:30 TTL — Spark's final no-data batch fires the timer
        (1, us(12, 0)): (us(12, 0), 1, 3.0),
    }
    # C's 13:00 session is still open (TTL 13:30 > final wm): NOT emitted
    assert got == want


def test_stateful_sessionize_matches_batch_closed_sessions(
    spark, sf_small, events_stream
):
    """Full-replay parity: every session the TTL-stateful stream emits
    must equal the batch sessionization's row for it, and the emitted
    set must be exactly the CLOSABLE sessions — all non-final sessions
    (closed inline by the next event) plus final sessions whose
    end + gap fell behind the final watermark (closed by timer)."""
    from novelti_dingo_spark.operators.events_ops import sessionize_30min
    from novelti_dingo_spark.streaming.stateful import sessionize_stateful

    out = sessionize_stateful(events_stream, watermark="15 minutes")
    name = streaming.run_to_memory(out, "t_sess_parity", mode="append")
    got = {
        (r.user_id, r.session_start_us): (
            r.session_end_us,
            r.n_events,
            round(r.sum_value, 2),
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    batch = sessionize_30min(spark, sf_small).collect()
    gap_us = 30 * 60 * 1_000_000
    wm_us = max(r.session_end_us for r in batch) - 15 * 60 * 1_000_000
    last_start = {}
    for r in batch:
        last_start[r.user_id] = max(
            last_start.get(r.user_id, 0), r.session_start_us
        )
    want = {}
    for r in batch:
        is_final = r.session_start_us == last_start[r.user_id]
        if not is_final or r.session_end_us + gap_us < wm_us:
            want[(r.user_id, r.session_start_us)] = (
                r.session_end_us,
                r.n_events,
                r.sum_value,
            )
    assert got == want and len(want) > 0


def _with_rocksdb_provider(spark):
    """Context manager: transformWithState requires the RocksDB state
    store provider; restore the session default afterwards."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        key = "spark.sql.streaming.stateStore.providerClass"
        old = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            yield
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)

    return cm()


def test_timer_tws_sessionize_multibatch_replay(spark, tmp_path):
    """Event-time TIMERS via transformWithState (registerTimer /
    handleExpiredTimer): the same three-file replay as the legacy
    EventTimeTimeout test — one session closes by in-stream gap, one
    purely by timer expiry when an unrelated batch advances the
    watermark, and the still-open final session is withheld."""
    import datetime as dt
    import os

    import pandas as pd

    from novelti_dingo_spark.protobuf_fallback import ensure_protobuf
    from novelti_dingo_spark.streaming.stateful import sessionize_timer_tws

    assert ensure_protobuf() in ("real", "shim")
    src = tmp_path / "src"
    src.mkdir()

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    def us(h, m):
        return int(
            t(h, m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )

    f1 = pd.DataFrame(
        {
            "ts": [t(10, 0), t(10, 10), t(10, 5)],
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 2],
            "value": [1.0, 2.0, 5.0],
        }
    )
    f2 = pd.DataFrame(
        {"ts": [t(12, 0)], "event_id": [4], "user_id": [1], "value": [3.0]}
    )
    f3 = pd.DataFrame(
        {"ts": [t(13, 0)], "event_id": [5], "user_id": [3], "value": [7.0]}
    )
    for i, f in enumerate((f1, f2, f3), 1):
        path = src / f"f{i}.parquet"
        f.assign(ts=f["ts"].astype("datetime64[us]")).to_parquet(str(path))
        os.utime(path, (1_900_000_000 + i * 1000,) * 2)

    ev = spark.readStream.schema(
        "ts timestamp, event_id long, user_id long, value double"
    ).option("maxFilesPerTrigger", "1").parquet(str(src))
    with _with_rocksdb_provider(spark):
        out = sessionize_timer_tws(ev, watermark="15 minutes")
        name = streaming.run_to_memory(out, "t_sess_timer", mode="append")
    got = {
        (r.user_id, r.session_start_us): (
            r.session_end_us,
            r.n_events,
            r.sum_value,
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (1, us(10, 0)): (us(10, 10), 2, 3.0),  # closed by in-stream gap
        (2, us(10, 5)): (us(10, 5), 1, 5.0),   # closed by timer expiry
        (1, us(12, 0)): (us(12, 0), 1, 3.0),   # timer fired by f3's wm
    }
    # C's 13:00 session is still open (timer 13:30 > final wm): withheld
    assert got == want


def test_timer_tws_sessionize_matches_batch_closed_sessions(
    spark, sf_small, events_stream
):
    """Full-replay parity for the timer-based processor: emitted rows
    must equal the legacy TTL operator's contract — every non-final
    session (closed inline) plus final sessions whose end + gap fell
    behind the final watermark (closed by handleExpiredTimer), each
    byte-equal to the batch sessionize_30min row."""
    from novelti_dingo_spark.operators.events_ops import sessionize_30min
    from novelti_dingo_spark.protobuf_fallback import ensure_protobuf
    from novelti_dingo_spark.streaming.stateful import sessionize_timer_tws

    assert ensure_protobuf() in ("real", "shim")
    with _with_rocksdb_provider(spark):
        out = sessionize_timer_tws(events_stream, watermark="15 minutes")
        name = streaming.run_to_memory(out, "t_sess_timer_parity", mode="append")
    got = {
        (r.user_id, r.session_start_us): (
            r.session_end_us,
            r.n_events,
            round(r.sum_value, 2),
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    batch = sessionize_30min(spark, sf_small).collect()
    gap_us = 30 * 60 * 1_000_000
    wm_us = max(r.session_end_us for r in batch) - 15 * 60 * 1_000_000
    last_start = {}
    for r in batch:
        last_start[r.user_id] = max(
            last_start.get(r.user_id, 0), r.session_start_us
        )
    want = {}
    for r in batch:
        is_final = r.session_start_us == last_start[r.user_id]
        if not is_final or r.session_end_us + gap_us < wm_us:
            want[(r.user_id, r.session_start_us)] = (
                r.session_end_us,
                r.n_events,
                r.sum_value,
            )
    assert got == want and len(want) > 0


def test_stream_stream_left_outer_join_matches_batch(spark, sf_small, tmp_path):
    """ST9 left-outer: the watermarked LEFT OUTER stream-stream interval
    join emits matched pairs in append mode AND null-extends every
    unmatched purchase once the watermark passes its join window —
    exactly the rows of the DuckDB-oracle-checked batch twin
    `interval_join_pairs_outer`. The real events replay in two
    time-ordered files; far-future sentinel batches then push the
    watermark past every purchase so the outer state fully flushes
    (without them, purchases near the stream's end would stay pending —
    the documented emission lag of streaming outer joins).

    Two sentinel subtleties, both measured here: (a) each watermark is
    computed AFTER the event-type filter, so a sentinel must be a real
    click AND a real purchase — any other type never reaches either
    withWatermark and the joint watermark (min of the two sides) stays
    put; (b) the watermark a batch advances takes effect a batch later,
    so the flush needs multiple sentinel batches."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from novelti_dingo_spark.operators.interval import interval_join_pairs_outer
    from novelti_dingo_spark.streaming.events import purchases_with_recent_click

    src = tmp_path / "src"
    src.mkdir()
    pdf = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    mid = len(pdf) // 2
    SENTINEL_ID = 1_000_000_000

    def sentinel(days, n):
        s = pd.concat([pdf.iloc[[-1]]] * 2, ignore_index=True)
        s["ts"] = s["ts"] + pd.Timedelta(days=days)
        s["event_type"] = ["click", "purchase"]
        s["event_id"] = [SENTINEL_ID + 2 * n, SENTINEL_ID + 2 * n + 1]
        return s

    parts = (
        pdf.iloc[:mid],
        pdf.iloc[mid:],
        sentinel(30, 0),
        sentinel(31, 1),
        sentinel(32, 2),
    )
    for i, part in enumerate(parts, 1):
        path = src / f"f{i}.parquet"
        # the Timedelta addition silently promotes ts to ns — re-pin µs
        # (the session reads parquet NANOS as long, clashing with the
        # declared timestamp schema)
        part.assign(ts=part["ts"].astype("datetime64[us]")).to_parquet(
            path, index=False
        )
        os.utime(path, (1_900_000_000 + i * 1000,) * 2)
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = purchases_with_recent_click(ev, horizon="1 hour", how="left_outer")
    name = streaming.run_to_memory(out, "t_ssjoin_outer", mode="append")
    got = {
        (r.purchase_id, r.click_id, r.user_id, r.purchase_ts_us, r.click_ts_us)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.purchase_id < SENTINEL_ID  # drop the sentinels' own rows
    }
    want = {
        (r.purchase_id, r.click_id, r.user_id, r.purchase_ts_us, r.click_ts_us)
        for r in interval_join_pairs_outer(spark, sf_small).collect()
    }
    assert got == want
    outer_rows = {t for t in got if t[1] == -1}
    assert outer_rows, "expected null-extended purchases in the result"
    assert len(got) > len(outer_rows), "expected matched pairs too"


def test_stateful_holt_matches_batch_fold(spark, sf_small, events_stream):
    """running_user_holt (constant-memory two-variable state) final rows
    must equal the batch fold holt_running_final — same recurrence,
    same (ts, event_id) order, bit-identical doubles."""
    from novelti_dingo_spark.operators.timeseries import holt_running_final
    from novelti_dingo_spark.streaming.stateful import running_user_holt

    out = running_user_holt(events_stream)
    name = streaming.run_to_memory(out, "t_holt", mode="update")
    rows = spark.sql(
        f"""SELECT user_id, n_events, level, trend FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) rn FROM {name}) WHERE rn = 1"""
    ).collect()
    got = {r.user_id: (r.n_events, r.level, r.trend) for r in rows}
    want = {
        r.user_id: (r.n_events, r.level, r.trend)
        for r in holt_running_final(spark, sf_small).collect()
    }
    assert got == want


def test_stream_stream_full_outer_join_matches_batch(
    spark, sf_small, tmp_path
):
    """ST9 full outer: BOTH sides null-extend on watermark expiry —
    unmatched purchases AND unmatched clicks — matching the batch twin
    interval_join_pairs_full_outer row for row. Same two-file replay +
    sentinel flush protocol as the left-outer test (sentinels must be
    click+purchase pairs so both per-side watermarks advance)."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from novelti_dingo_spark.operators.interval import (
        interval_join_pairs_full_outer,
    )
    from novelti_dingo_spark.streaming.events import (
        purchases_clicks_full_outer,
    )

    src = tmp_path / "src"
    src.mkdir()
    pdf = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    mid = len(pdf) // 2
    SENTINEL_ID = 1_000_000_000

    def sentinel(days, n):
        s = pd.concat([pdf.iloc[[-1]]] * 2, ignore_index=True)
        s["ts"] = s["ts"] + pd.Timedelta(days=days)
        s["event_type"] = ["click", "purchase"]
        s["event_id"] = [SENTINEL_ID + 2 * n, SENTINEL_ID + 2 * n + 1]
        return s

    parts = (
        pdf.iloc[:mid],
        pdf.iloc[mid:],
        sentinel(30, 0),
        sentinel(31, 1),
        sentinel(32, 2),
    )
    for i, part in enumerate(parts, 1):
        path = src / f"f{i}.parquet"
        part.assign(ts=part["ts"].astype("datetime64[us]")).to_parquet(
            path, index=False
        )
        os.utime(path, (1_900_000_000 + i * 1000,) * 2)
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = purchases_clicks_full_outer(ev, horizon="1 hour")
    name = streaming.run_to_memory(out, "t_ssjoin_full", mode="append")
    got = {
        (r.purchase_id, r.click_id, r.user_id, r.purchase_ts_us, r.click_ts_us)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.purchase_id < SENTINEL_ID and r.click_id < SENTINEL_ID
    }
    want = {
        (r.purchase_id, r.click_id, r.user_id, r.purchase_ts_us, r.click_ts_us)
        for r in interval_join_pairs_full_outer(spark, sf_small).collect()
    }
    assert got == want
    null_p = {t for t in got if t[1] == -1}
    null_c = {t for t in got if t[0] == -1}
    assert null_p and null_c, "expected null extension on BOTH sides"
    assert len(got) > len(null_p) + len(null_c), "expected matches too"


def test_tws_liststate_topk_matches_batch(spark, sf_small, events_stream):
    """transformWithState LISTSTATE: the streaming per-user top-3
    (O(k) state) must equal the batch window top-3 — exercises the
    ListState protocol legs (AppendList/Get/Put) through the live
    state server, beyond the ValueState the stats test covers."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from novelti_dingo_spark.protobuf_fallback import ensure_protobuf
    from novelti_dingo_spark.sources import load_table
    from novelti_dingo_spark.streaming.stateful import topk_per_user_tws

    assert ensure_protobuf() in ("real", "shim")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = topk_per_user_tws(events_stream)
        name = streaming.run_to_memory(out, "t_tws_topk", mode="update")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    # final emission per user = rows carrying that user's max n_seen
    rows = spark.sql(
        f"""SELECT user_id, rank, value, event_id FROM (
              SELECT *, max(n_seen) OVER (PARTITION BY user_id) AS mx
              FROM {name}) WHERE n_seen = mx"""
    ).collect()
    got = {
        (r.user_id, r.rank): (r.value, r.event_id) for r in rows
    }
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    want = {
        (r.user_id, r.rn): (r.value, r.event_id)
        for r in load_table(spark, sf_small, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    assert got == want
