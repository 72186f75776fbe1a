"""SparkSession factory with scale-aware defaults.

Local test posture: one reused session, small shuffle-partition count
(testdata is ≤ 600k rows — overhead, not throughput, is the risk).
Cluster posture (100 TB): the same code relies on AQE to coalesce/split
partitions at runtime; only the static `shuffle.partitions` seed differs
and is configurable via env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "novelti-dingo-spark") -> SparkSession:
    # must precede JVM creation: python workers inherit PYTHONPATH via
    # the JVM, and transformWithState's state protocol needs a protobuf
    # runtime in the WORKER (no-op when the real package is installed)
    from .protobuf_fallback import ensure_protobuf

    ensure_protobuf()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_DINGO_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DINGO_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # the console progress bar shares the terminal with harness
        # output; round-6 verdict traced truncated BENCH JSON lines to
        # it (the driver parses bench.py stdout) — keep it off.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.warehouse.dir", "/tmp/ndspark-warehouse")
        # events.ts is TIMESTAMP(NANOS) in parquet, which Spark's reader
        # rejects as TimestampType; read it as epoch-ns LongType instead
        # (sources/io.py converts to a µs TimestampType column on load).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # write timestamps as TIMESTAMP_MICROS, not legacy INT96: INT96
        # is deprecated and carries NO min/max footer statistics, which
        # breaks data skipping (pipelines.read_version_pruned) and
        # row-group pruning in every modern reader.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    return builder.getOrCreate()
