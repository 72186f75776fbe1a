"""Custom Python DataSource connector (sources/synthetic.py): partition
parallelism, filter pushdown, determinism across layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from novelti_dingo_spark.sources.synthetic import (
    EVENT_TYPES,
    read_synthetic,
)


def test_count_schema_partitions(spark):
    df = read_synthetic(spark, rows=5000, partitions=8)
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 8
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
    ]
    # ids are a complete 0..N-1 range, no dupes across partitions
    agg = df.agg(
        F.count_distinct("event_id").alias("d"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).head()
    assert (agg.d, agg.lo, agg.hi) == (5000, 0, 4999)


def test_deterministic_across_partitionings(spark):
    canon = lambda df: sorted(  # noqa: E731
        (r.event_id, r.event_type, r.user_id, r.value)
        for r in df.collect()
    )
    a = canon(read_synthetic(spark, rows=2000, partitions=7))
    b = canon(read_synthetic(spark, rows=2000, partitions=2))
    assert a == b
    # different seed → different data
    c = canon(read_synthetic(spark, rows=2000, partitions=2, seed=9))
    assert a != c


def test_filter_pushdown_correct_and_scanned(spark):
    # pushed filters must return exactly what a post-filter would
    unfiltered = read_synthetic(spark, rows=4000).collect()
    expect = sorted(
        r.event_id
        for r in unfiltered
        if r.event_type == "purchase" and 100 <= r.event_id < 3000
    )
    pushed = read_synthetic(spark, rows=4000).filter(
        (F.col("event_type") == "purchase")
        & (F.col("event_id") >= 100)
        & (F.col("event_id") < 3000)
    )
    got = sorted(r.event_id for r in pushed.collect())
    assert got == expect and len(got) > 0
    # the plan carries no post-scan Filter: the source handled everything
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "Filter" not in plan.replace("RuntimeFilters: []", "")


def test_event_type_domain(spark):
    vals = {
        r.event_type
        for r in read_synthetic(spark, rows=1000)
        .select("event_type")
        .distinct()
        .collect()
    }
    assert vals == set(EVENT_TYPES)


def test_stream_reader_batch_parity(spark, tmp_path):
    """Streaming drain of the synthetic source (AvailableNow over the
    offset cursor) produces exactly the batch rows — the replayable-
    cursor property a custom streaming connector must have."""
    from novelti_dingo_spark.sources.synthetic import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 600)
        .option("rows_per_batch", 250)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # Trigger.AvailableNow treats a SimpleDataSourceStreamReader's single
    # read() as "everything available", so drain with the default
    # as-fast-as-possible trigger and stop once the cursor is exhausted
    import time

    deadline = time.time() + 120
    while (
        spark.table("synth_stream").count() < 600 and time.time() < deadline
    ):
        time.sleep(0.5)
    q.stop()
    got = sorted(
        (r.event_id, r.event_type, r.user_id, r.value)
        for r in spark.table("synth_stream").collect()
    )
    want = sorted(
        (r.event_id, r.event_type, r.user_id, r.value)
        for r in read_synthetic(spark, rows=600).collect()
    )
    assert got == want and len(got) == 600
