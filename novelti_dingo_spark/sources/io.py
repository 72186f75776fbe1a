"""Sources and sinks (SURVEY.md §2.1: S1-S4).

S1 parquet scan with pinned schema — the hot path. Column pruning and
predicate pushdown are preserved by expressing reads declaratively
(`spark.read.schema(...).parquet(...)`): Catalyst pushes filters into the
vectorized parquet reader (visible as PushedFilters in `.explain`).

S2 csv/json ingest with FAILFAST so schema drift is a loud error; ORC
read/write (read_orc/write_orc, oracle-checked end-to-end by
orc_ingest_agg). Avro is NOT shipped: it needs the external
org.apache.spark:spark-avro package, which this environment cannot
install — on a cluster, add `--packages org.apache.spark:spark-avro_2.13:<spark-version>`
and `spark.read.format("avro")` composes with everything here (same
DataFrame surface; no engine code depends on the source format).
S3 partitioned parquet sink.
S4 table registry mirroring the driver's ten DuckDB views.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .. import schemas

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any caller-provided SparkSession safe for this engine's
    queries (the driver passes its OWN session to entry()/queries(), built
    without our session.py defaults):

    - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS), which Spark's
      reader otherwise hard-rejects (PARQUET_TYPE_ILLEGAL);
    - UTC session timezone: date_format/unix_timestamp canonicalizations
      must not shift with the host timezone.

    - TIMESTAMP_MICROS output: legacy INT96 timestamps carry no footer
      min/max statistics, which silently disables data skipping
      (pipelines.read_version_pruned) and row-group pruning.

    All are runtime-settable SQL confs (verified); idempotent."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )


_TS_IS_NANOS_CACHE: dict[str, bool] = {}


def events_ts_is_nanos(path: str) -> bool:
    """Footer-sniff whether events.ts is TIMESTAMP(NANOS) at this path.

    Testdata generations have flipped between timestamp[ns] and
    timestamp[us]; reading ns files needs the nanosAsLong long schema +
    explicit ns→µs conversion, while pinning that schema onto a µs file
    silently yields epoch-µs values mislabeled as ns (1000× off). One
    driver-side footer read per path (cached) — O(KB), plan-time only.
    `path` may be a single file or a directory (first *.parquet sniffed —
    a stream source dir is homogeneous by contract)."""
    if path not in _TS_IS_NANOS_CACHE:
        import glob

        f = path
        if os.path.isdir(f):
            cands = sorted(glob.glob(os.path.join(f, "*.parquet")))
            if not cands:
                # empty dir (e.g. a stream source before its first file):
                # do NOT cache — files arriving later must be re-sniffed,
                # else ns-encoded arrivals get pinned to the µs schema
                # and every ts reads 1000× off.
                return False
            f = cands[0]
        import pyarrow.parquet as pq

        t = pq.read_schema(f).field("ts").type
        _TS_IS_NANOS_CACHE[path] = getattr(t, "unit", None) == "ns"
    return _TS_IS_NANOS_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: read one test table with its pinned schema (schema drift → error)."""
    ensure_session_confs(spark)
    schema = schemas.TABLES.get(name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and events_ts_is_nanos(path):
        # ts stored as TIMESTAMP(NANOS) → read as epoch-ns long
        # (schemas.EVENTS_TS_NS), surface as µs TimestampType to queries.
        # integer div — float /1000 loses µs precision at epoch-ns magnitude
        df = spark.read.schema(schemas.EVENTS_TS_NS).parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition to defaultParallelism when the source is
    NARROWER (round-14, guide §2.5 input skew / §6 input split size): a
    sub-`openCostInBytes` parquet file is ONE scan partition (and a
    single row group cannot split), so zero-shuffle per-row stages —
    HOF folds, explodes, hash chains, broadcast-join probes — serialize
    on a single core no matter the cluster width. One narrow
    repartition restores fan-out; when the scan is already at least as
    wide as defaultParallelism this is a no-op, so nothing is tuned to
    the local core count. Apply ONLY where downstream aggregation is
    order-insensitive (counts, min/max, exact ints/decimals, per-row
    outputs): round-robin placement changes partial-aggregation order,
    which would drift float sums at ulp level.

    Identity under `no_barriers()` (like barrier()): the plan audits
    pin each operator's SEMANTIC shuffle structure; widen's fan-out
    repartition is execution shaping, not algorithm, and would
    otherwise appear once per subtree instantiation."""
    from ..barrier import _ENABLED as _barriers_on

    if not _barriers_on:
        return df
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def keyed_widen(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition by `cols` to defaultParallelism ahead of a
    grouped-map (round-14, guide §2.5/§4.3): the groupBy's own shuffle
    is AQE-owned, and AQE coalesces a bench-scale relation (a few MB)
    down to one or two reduce partitions — serializing a
    one-python-call-per-group applyInPandas stage on a single worker
    regardless of cluster width. An explicit `repartition(n, cols)` is
    a REPARTITION_BY_NUM exchange, which AQE never coalesces, and it
    satisfies the grouped-map's required hash distribution, so Spark
    inserts NO second exchange — same shuffle count, restored fan-out
    (measured 5.7x on grouped_normalize: 4994 -> 877 ms warm, rows
    identical). n = defaultParallelism, the same scale-adaptive width
    widen() uses — nothing tuned to the local core count.

    Group contents are unchanged (all rows of a key hash to one
    partition either way), so per-group float math is unaffected.

    Identity under `no_barriers()` (like widen()): execution shaping,
    not algorithm — plan audits pin the semantic shuffle structure."""
    from ..barrier import _ENABLED as _barriers_on

    if not _barriers_on:
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)


def fixture_tag(sf_dir: str) -> str:
    """Cache tag for derived /tmp fixture roots (lake fixtures, inverted
    indexes, ORC/Avro copies): the sf_dir basename PLUS an 8-hex digest
    of the source files' identities (name, mtime_ns, size). A testdata
    dir REGENERATED in place stops matching its old digest, so every
    fixture built from it rebuilds under a fresh root instead of
    serving stale bytes (round-7 advice: caches were keyed on bare
    path existence). Local-path concern only — a cluster deployment
    keys derived state on catalog table versions instead."""
    import hashlib

    base = sf_dir.rstrip("/")
    ents = []
    try:
        for name in sorted(os.listdir(base)):
            st = os.stat(os.path.join(base, name))
            ents.append(f"{name}:{st.st_mtime_ns}:{st.st_size}")
    except OSError:
        ents.append("missing")
    digest = hashlib.md5(";".join(ents).encode()).hexdigest()[:8]
    return f"{os.path.basename(base)}-{digest}"


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """S4: register all ten tables as temp views (mirrors the oracle views)."""
    out: dict[str, DataFrame] = {}
    for name in schemas.TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_csv(spark: SparkSession, path: str, schema: StructType, **options) -> DataFrame:
    """S2: schema'd CSV ingest, FAILFAST (bad rows are errors, not nulls)."""
    opts = {"header": "true", "mode": "FAILFAST", **options}
    return spark.read.options(**opts).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType, **options) -> DataFrame:
    """S2: schema'd JSON-lines ingest, FAILFAST."""
    opts = {"mode": "FAILFAST", **options}
    return spark.read.options(**opts).schema(schema).json(path)


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine_dir: str | None = None,
    **options,
) -> DataFrame:
    """S2 (lenient path): JSON-lines ingest that SPLITS instead of failing
    — well-formed rows come back typed, malformed lines land in a
    quarantine sink (as raw text, for later repair/replay) rather than
    aborting a 100 TB job for one bad byte like FAILFAST, or silently
    nulling fields like bare PERMISSIVE.

    PERMISSIVE mode with `columnNameOfCorruptRecord` tags unparseable
    lines in one pass; the two output legs share the scan. Quarantine
    rows are written as text (one raw line each) so nothing about the
    malformation is lost."""
    corrupt = "_corrupt_record"
    from pyspark.sql.types import StringType, StructField

    # fresh StructType — StructType.add mutates in place, and the caller's
    # schema (often a shared module constant) must not grow a corrupt col
    full = StructType(list(schema.fields) + [StructField(corrupt, StringType())])
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt, **options}
    df = spark.read.options(**opts).schema(full).json(path)
    # Spark requires cache/materialization before filtering on the
    # corrupt-record column (it is populated at parse time, not re-derivable)
    df = df.cache()
    bad = df.filter(F.col(corrupt).isNotNull()).select(corrupt)
    if quarantine_dir is not None and bad.limit(1).count() > 0:
        bad.write.mode("append").text(quarantine_dir)
    return df.filter(F.col(corrupt).isNull()).drop(corrupt)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S3: (optionally partitioned) parquet sink.

    At 100 TB, `partition_by` low-cardinality columns gives partition
    pruning on downstream reads; never partition by a high-cardinality key
    (small-files explosion).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """S2: ORC ingest (columnar alternative to parquet; same pushdown and
    pruning properties through the vectorized ORC reader)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S3: ORC sink, optionally partitioned."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """S2/L6: raw-file ingest via the built-in `binaryFile` source —
    (path, modificationTime, length, content) rows, one per file. This
    is how image/audio/video assets enter the engine BEFORE they are
    packed into parquet binary columns (multimodal.multimodal_pack is
    the downstream step): the source lists files in parallel, never
    reads a file twice, and `pathGlobFilter` prunes at listing time so
    non-matching files cost zero I/O. At 100 TB of small files the
    listing itself is the bottleneck — production runs should compact
    into parquet early (this reader feeding multimodal_pack IS that
    compaction) and set spark.sql.files.maxPartitionBytes so many small
    files coalesce into one task."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_parquet_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> tuple[DataFrame, list[str]]:
    """Parquet ingest that survives corrupt files LOUDLY: every file's
    footer is validated first (pyarrow metadata read — O(KB) per file,
    control-plane only); unreadable files are returned by name for
    quarantine/alerting instead of being silently skipped (the failure
    mode of `spark.sql.files.ignoreCorruptFiles`, which drops data with
    no record of what it dropped). The returned DataFrame reads only the
    validated files, with the pinned schema when given.

    At 100 TB footer validation parallelizes trivially (it is the same
    metadata pass manifest-stats collection does) and the corrupt list
    feeds the same repair/replay loop as the csv/json quarantine
    (read_json_quarantine). For object stores, run the probe through a
    distributed map over file names instead of the local glob."""
    import glob as _glob

    import pyarrow.parquet as pq

    local = path[len("file:"):] if path.startswith("file:") else path
    files = sorted(_glob.glob(os.path.join(local, "*.parquet")))
    good, bad = [], []
    for f in files:
        try:
            pq.ParquetFile(f).metadata  # footer parse = validity probe
            good.append(f)
        except Exception:
            bad.append(os.path.basename(f))
    if not good:
        empty = spark.createDataFrame(
            [], schema if schema is not None else StructType([])
        )
        return empty, bad
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*good), bad
