"""End-to-end ETL pipelines (BASELINE.json category: ETL/pipeline —
"Spark batch ingestion + DataFrame transforms").

Two production shapes:

- `build_order_mart`: batch mart build — ingest the raw star schema,
  denormalize facts against broadcast dims, derive calendar partitions,
  write a partitioned parquet mart plus a daily rollup. Downstream
  readers get partition pruning on (year) and column pruning for free.

- `incremental_events_ingest`: checkpointed incremental file ingestion
  (Structured Streaming file source + Trigger.AvailableNow): each run
  processes only files not yet recorded in the checkpoint, writes an
  append-only parquet sink exactly once per input file, then stops. The
  idempotent re-run contract a scheduled 100 TB ingest job needs —
  rerunning after a crash neither drops nor duplicates data.
"""

from __future__ import annotations

import os
import pathlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import schemas
from .sources.io import ensure_session_confs, load_table


def build_order_mart(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Denormalized order-line mart + daily revenue rollup.

    Returns {dataset_name: path}. Facts shuffle once (lineitem↔orders on
    the natural key); all dims ride along as broadcasts. The mart is
    partitioned by order year — low cardinality (7), aligned with the
    dominant filter in the workload's queries."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    mart = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            "l_returnflag",
            "o_custkey",
            "c_mktsegment",
            "n_name",
            "r_name",
            F.to_date("o_orderdate").alias("order_date"),
            F.year("o_orderdate").alias("order_year"),
        )
    )
    mart_path = os.path.join(out_dir, "order_mart")
    mart.write.mode("overwrite").partitionBy("order_year").parquet(mart_path)

    daily = (
        spark.read.parquet(mart_path)
        .groupBy("order_date", "r_name")
        .agg(
            F.round(F.sum("net_price"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    daily_path = os.path.join(out_dir, "daily_revenue")
    daily.write.mode("overwrite").parquet(daily_path)
    return {"order_mart": mart_path, "daily_revenue": daily_path}


def incremental_events_ingest(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """One incremental run: pick up files in `src_dir` not yet in the
    checkpoint, normalize (ns→µs ts, JSON props parsed, hour bucket for
    downstream pruning), append to the parquet sink, stop. Exactly-once
    per input file via the streaming checkpoint + sink transaction log."""
    ensure_session_confs(spark)
    from .sources.io import events_ts_is_nanos

    ns = events_ts_is_nanos(src_dir)
    events = (
        spark.readStream.schema(
            schemas.EVENTS_TS_NS if ns else schemas.EVENTS
        )
        .option("pathGlobFilter", "*.parquet")
        .parquet(src_dir)
    )
    if ns:
        events = events.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    events = (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .withColumn("event_hour", F.date_trunc("hour", "ts"))
        .drop("props")
    )
    q = (
        events.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_mb: int = 256,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    roughly `target_mb` each (the chronic operational task of any
    file-based lake — streaming sinks and fine-grained partitioning leave
    thousands of KB-sized files whose per-file open/footer cost dominates
    scans).

    File count is computed from the dataset's on-disk size (one
    getContentSummary call through the Hadoop FileSystem API — works on
    hdfs://, s3a://, gs:// as well as file://, no local-path assumption),
    then the data is round-robin repartitioned (even output sizes, no
    skew by key) and rewritten. Returns the output file count. At 100 TB
    run per partition directory, not whole-dataset."""
    from .sources import lakefs

    ensure_session_confs(spark)
    df = spark.read.parquet(in_dir)
    total_bytes = lakefs.du_bytes(spark, in_dir)
    n_files = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return n_files


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.5,
    lang_fractions: dict[str, float] | None = None,
) -> dict[str, int]:
    """End-to-end training-corpus curation — the pipeline this engine
    exists for, chaining the §2.10 operators:

      1. exact dedup        keep min doc_id per identical text (hash-grouped)
      2. near-dup removal   MinHash-LSH candidate pairs, exact-Jaccard
                            verified → connected components → one
                            canonical survivor per cluster
      3. quality filter     heuristic score >= min_quality
      4. stratified sample  per-language fractions (class balancing)
      5. publish            curated parquet partitioned by lang + a stats row

    Returns stage-by-stage row counts (the curation funnel), collected
    with the Observation API: each stage is instrumented with an observed
    count, so ALL funnel metrics ride the single publish action — no
    per-stage count() jobs re-executing the pipeline prefix (at 100 TB
    each of those would be a full re-scan).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from .operators.dedup import connected_components, minhash_lsh_pairs
    from .operators.text import doc_quality_score
    from .sources.io import load_table

    ensure_session_confs(spark)
    obs = {name: Observation(name) for name in
           ("raw", "after_exact_dedup", "after_neardup", "after_quality",
            "published")}

    def observed(df, stage):
        return df.observe(obs[stage], F.count(F.lit(1)).alias("n"))

    docs = observed(load_table(spark, sf_dir, "documents"), "raw")

    # 1. exact dedup (16-byte shuffle keys, never the text)
    survivors = (
        docs.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .drop("_h")
    )
    docs = observed(docs.join(survivors, "doc_id", "left_semi"),
                    "after_exact_dedup")

    # 2. near-dup removal: verified pairs → connected components → keep
    # one canonical doc per CLUSTER (near-dup is non-transitive; dropping
    # "the higher id of each pair" over-deletes on chains A~B~C with A!~C)
    pairs = minhash_lsh_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    clusters = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    docs = observed(docs.join(losers, "doc_id", "left_anti"), "after_neardup")

    # 3. quality gate
    quality = doc_quality_score(spark, sf_dir).select("doc_id", "quality")
    docs = observed(
        docs.join(quality, "doc_id").filter(F.col("quality") >= min_quality),
        "after_quality",
    )

    # 4. language stratification (default: keep everything)
    if lang_fractions:
        langs = [r.lang for r in docs.select("lang").distinct().collect()]
        fr = {lang: lang_fractions.get(lang, 1.0) for lang in langs}
        docs = docs.sampleBy("lang", fr, seed=42)
    docs = observed(docs, "published")

    docs.write.mode("overwrite").partitionBy("lang").parquet(out_dir)
    return {name: int(o.get["n"]) for name, o in obs.items()}


def release_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    base_dir: str,
    min_quality: float = 0.5,
    pack_budget: int = 256,
) -> dict:
    """The capstone composition — curated corpus → packed training
    shards → one VERSIONED, stats-bearing, audited release:

      1. `curate_corpus` runs the full funnel (exact dedup → near-dup
         clusters → quality gate) into a staging dir, funnel counts
         riding the single write via Observation;
      2. the curated docs get token counts and a per-source sequence-
         packing bin id (running-sum window — the pack_sequences shape);
      3. `publish_versioned` commits the release with per-file doc_id
         min/max stats (data skipping for downstream readers) and a
         manifest that embeds the curation funnel, the trained
         language-quality MODEL CARD (logreg_quality_train), and token
         totals — everything an auditor needs to reproduce or reject
         the release, pinned to an immutable version number.

    Returns the release manifest. At 100 TB each stage keeps its own
    documented scale shape; the composition adds no new shuffles beyond
    the staging write/read boundary (which also truncates lineage for
    the second phase — deliberate, same role as localCheckpoint)."""
    import os as _os

    from .operators.logreg import logreg_quality_train

    base = base_dir.rstrip("/")
    staging = f"{base}/_staging"
    funnel = curate_corpus(
        spark, sf_dir, staging, min_quality=min_quality
    )
    docs = spark.read.parquet(staging)
    d = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        "text",
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / pack_budget
        ),
    )
    card = logreg_quality_train(spark, sf_dir).head().asDict()
    totals = packed.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("source", "bin_id").alias("n_bins"),
    ).head()
    version = publish_versioned(
        packed,
        f"{base}/corpus",
        meta={
            "funnel": funnel,
            "model_card": card,
            "total_tokens": int(totals["total_tokens"]),
            "n_bins": int(totals["n_bins"]),
            "pack_budget": pack_budget,
            "min_quality": min_quality,
        },
        stats_cols=["doc_id"],
    )
    _, manifest = read_version(spark, f"{base}/corpus", version)
    return manifest


def upsert_by_partition(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
) -> int:
    """Parquet-lake upsert without a table format: rewrite ONLY the
    partitions containing updated keys (dynamic partition overwrite).

    Mechanics: find the affected partition values from the updates, read
    just those partitions from the target (partition pruning), anti-join
    out the updated keys, union the new rows, and write back with
    partitionOverwriteMode=dynamic so untouched partitions are left
    byte-identical. At 100 TB the rewrite cost is proportional to the
    touched partitions, not the table. Returns #partitions rewritten.

    Scale/safety posture:
    - Touched partitions are selected with a broadcast LEFT SEMI join on
      the updates' distinct partition values — never a driver-side
      `collect()` of the partition list, so a high-cardinality partition
      column can't blow up the driver. Dynamic partition pruning pushes
      the semi join into the scan on partitioned parquet.
    - The merged rows are STAGED to a sibling directory first, then the
      target is dynamic-partition-overwritten FROM the staging copy.
      Without staging, the job would lazily read `target_dir` while
      overwriting it — a crash mid-commit could lose the touched
      partitions. Staging costs one extra write of the touched
      partitions only; a crash before the final write leaves the target
      byte-identical.

    (A table format — Delta/Iceberg — adds ACID + concurrent writers on
    top; this is the engine-level primitive underneath.)"""
    _refuse_shallow_write(spark, target_dir, "upsert_by_partition")
    import uuid

    from .sources import lakefs

    ensure_session_confs(spark)
    touched = updates.select(partition_col).distinct()
    target = spark.read.parquet(target_dir).join(
        F.broadcast(touched), partition_col, "left_semi"
    )
    keep = target.join(updates.select(key), key, "left_anti")
    merged = keep.unionByName(updates)

    staging = f"{target_dir.rstrip('/')}__staging_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        merged.write.partitionBy(partition_col).parquet(staging)
        # partition count from the staging directory listing — a metadata
        # op on `partition_col=value` dirs, not a collect()
        n_parts = sum(
            1 for c in lakefs.listdir(spark, staging)
            if c.startswith(f"{partition_col}=")
        )
        if n_parts == 0:
            # empty updates (e.g. a replayed/empty micro-batch): staging
            # holds only _SUCCESS and reading it would throw
            # UNABLE_TO_INFER_SCHEMA — the correct merge is a no-op
            return 0
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # re-reading staging re-infers the partition column's type from the
        # directory names and reorders it last — pin both to merged's schema
        part_type = merged.schema[partition_col].dataType
        staged = spark.read.parquet(staging).withColumn(
            partition_col, F.col(partition_col).cast(part_type)
        )
        (
            staged.select(*merged.columns)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        lakefs.delete(spark, staging)
    return n_parts


def scd2_build(
    spark: SparkSession,
    snapshots: DataFrame,
    key: str,
    change_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a history of snapshots
    into validity intervals. Consecutive identical snapshots merge; each
    change opens a new interval; the current row has valid_to = NULL.

    One shuffle (window over the key); change detection is lag-compare on
    the tracked columns."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_col)
    changed = F.lit(False)
    for c in change_cols:
        changed = changed | ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    changed = changed | F.lag(F.col(ts_col)).over(w).isNull()  # first row
    versions = snapshots.withColumn("_chg", changed).filter(F.col("_chg"))
    w2 = Window.partitionBy(key).orderBy(ts_col)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .drop("_chg", ts_col)
    )


def _json_scalar(v):
    """JSON-safe projection of a parquet statistics value: numerics and
    strings pass through; timestamps become UTC-naive
    'YYYY-MM-DD HH:MM:SS[.ffffff]' text and dates 'YYYY-MM-DD', both
    lexicographically ordered == chronologically ordered, so pruning
    comparisons on the serialized form remain correct."""
    import datetime as _dt

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def _footer_file_stats(
    spark: SparkSession, out: str, stats_cols: list[str]
) -> list[dict] | None:
    """Per-file min/max for `stats_cols`, read from parquet FOOTERS —
    row-group statistics the writer already computed, so collecting them
    is O(files) metadata I/O with no data scan (exactly how Iceberg/Delta
    populate their manifests). Returns None when the files are not
    reachable via a local filesystem path (scheme'd object-store URIs in
    this container) — the caller falls back to a one-pass Spark scan."""
    import glob

    import pyarrow.parquet as pq

    local = out
    if local.startswith("file:"):
        local = local[len("file:") :]
    if "://" in local:
        return None
    files = sorted(glob.glob(os.path.join(local, "*.parquet")))
    if not files:
        return None
    stats = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        entry: dict = {
            "name": os.path.basename(f),
            "rows": md.num_rows,
        }
        mins: dict = {c: None for c in stats_cols}
        maxs: dict = {c: None for c in stats_cols}
        nulls: dict = {c: 0 for c in stats_cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in mins or col.statistics is None:
                    continue
                st = col.statistics
                if st.null_count is not None:
                    nulls[name] += st.null_count
                if not st.has_min_max:
                    continue
                if mins[name] is None or st.min < mins[name]:
                    mins[name] = st.min
                if maxs[name] is None or st.max > maxs[name]:
                    maxs[name] = st.max
        entry["min"] = {c: _json_scalar(mins[c]) for c in stats_cols}
        entry["max"] = {c: _json_scalar(maxs[c]) for c in stats_cols}
        entry["nulls"] = dict(nulls)
        stats.append(entry)
    return stats


def _scan_file_stats(
    spark: SparkSession, out: str, stats_cols: list[str]
) -> list[dict]:
    """Fallback stats collection via one Spark pass grouped by
    input_file_name() — used when footers aren't locally readable. The
    aggregate output is O(files), driver-side by design."""
    df = spark.read.parquet(out)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    rows = (
        df.select(F.input_file_name().alias("__file"), *stats_cols)
        .groupBy("__file")
        .agg(*aggs)
        .collect()
    )
    stats = []
    for r in sorted(rows, key=lambda r: r["__file"]):
        stats.append(
            {
                "name": os.path.basename(r["__file"]),
                "rows": r["__rows"],
                "min": {c: _json_scalar(r[f"__min_{c}"]) for c in stats_cols},
                "max": {c: _json_scalar(r[f"__max_{c}"]) for c in stats_cols},
            }
        )
    return stats


def publish_checked(
    df: DataFrame,
    base_dir: str,
    constraints: list[tuple[str, str, object]],
    on_violation: str = "fail",
    quarantine_dir: str | None = None,
    expectations: list[tuple[str, str, object]] | None = None,
    expectations_action: str = "fail",
    **publish_kwargs,
) -> tuple[int, dict]:
    """Constraint-enforced publish (the Delta `CHECK` / `NOT NULL`
    contract, plus unique keys): rows are validated against every
    declared constraint in ONE scan and either the publish aborts
    (`on_violation="fail"`) or violating rows divert to a quarantine
    dataset with a `_violations` column naming every constraint each row
    broke (`on_violation="quarantine"`) — the clean rows publish
    normally and the manifest records the audit (checked constraints +
    per-constraint violation counts), so a reader can SEE the contract
    a version was admitted under.

    `constraints` entries are (name, kind, spec):
      ("positive_value", "check",    F.col("value") >= 0)        # row predicate
      ("ts_present",     "not_null", ["ts", "user_id"])          # columns
      ("pk",             "unique",   ["event_id"])               # key columns
      ("valid_user",     "fk",       ("user_id", cust, "c_custkey"))
                                     # (fk col, parent df, parent key)

    Plan shape: check/not_null are pure row expressions fused into the
    scan; `unique` adds one window count over the key (the unavoidable
    shuffle — dedup needs global visibility of the key); `fk` is a
    broadcast left join against the parent's DISTINCT keys (standard
    SQL semantics: a NULL fk is not a violation — declare not_null too
    if it should be). At 100 TB dims are broadcastable by design; an
    unbroadcastable parent means the fk check is a shuffle semi-join —
    swap the hint, the flag logic is unchanged. Violation counts come
    from ONE aggregate over the flagged frame; quarantine writes the
    flagged split before the clean publish so a crash between the two
    leaves LATEST untouched (publish's pointer-flip atomicity is
    preserved). Returns (version, audit dict).

    `expectations` are DATASET-level assertions (the Great-Expectations
    shape) — rates and cardinalities, not row flags, so nothing is
    quarantined for them; they GATE the publish instead:
      ("ts_mostly_set", "rate_max", (F.col("ts").isNull(), 0.01))
                        # fraction of rows matching expr must be <= 1%
      ("users_present", "ndv_min",  ("user_id", 50))
                        # exact distinct count must be >= 50
    They ride the SAME single aggregate as the violation counts (zero
    extra passes). A failed expectation aborts the publish
    (`expectations_action="fail"`) or publishes anyway with the measured
    values recorded (`"record"`); either way the manifest carries
    {value, threshold, pass} per expectation, so downstream readers see
    the measured quality of what they consume."""
    flags = []
    markers = []
    src = df
    for i, (name, kind, spec) in enumerate(constraints):
        if kind == "check":
            flags.append(F.when(~spec, F.lit(name)))
        elif kind == "not_null":
            cond = None
            for c in spec:
                n = F.col(c).isNull()
                cond = n if cond is None else (cond | n)
            flags.append(F.when(cond, F.lit(name)))
        elif kind == "unique":
            w = Window.partitionBy(*spec)
            flags.append(F.when(F.count(F.lit(1)).over(w) > 1, F.lit(name)))
        elif kind == "fk":
            fk_col, parent, pk = spec
            marker = f"_fk_{i}"
            keys = parent.select(
                F.col(pk).alias(marker)
            ).distinct()
            src = src.join(
                F.broadcast(keys), F.col(fk_col) == F.col(marker), "left"
            )
            markers.append(marker)
            flags.append(
                F.when(
                    F.col(marker).isNull() & F.col(fk_col).isNotNull(),
                    F.lit(name),
                )
            )
        else:
            raise ValueError(f"constraint {name!r}: unknown kind {kind!r}")
    # persist: the flagged frame feeds up to three actions (audit
    # counts, quarantine write, clean publish) — without it each action
    # recomputes the source, so a non-replay-deterministic input could
    # be counted as a violation yet land in the clean publish. Persist
    # pins one evaluation; it also keeps enforcement at ~one scan as
    # documented instead of three.
    flagged = (
        src.withColumn("_violations", F.array_compact(F.array(*flags)))
        .drop(*markers)
        .persist()
    )
    try:
        return _finish_publish_checked(
            df, flagged, base_dir, constraints, on_violation,
            quarantine_dir, expectations, expectations_action,
            publish_kwargs,
        )
    finally:
        flagged.unpersist()


def _finish_publish_checked(
    df, flagged, base_dir, constraints, on_violation, quarantine_dir,
    expectations, expectations_action, publish_kwargs,
):
    exp_aggs = []
    for name, kind, spec in expectations or []:
        if kind == "rate_max":
            cond, _thr = spec
            exp_aggs.append(F.avg(cond.cast("double")).alias(f"_exp_{name}"))
        elif kind == "ndv_min":
            col, _thr = spec
            exp_aggs.append(F.count_distinct(F.col(col)).alias(f"_exp_{name}"))
        else:
            raise ValueError(f"expectation {name!r}: unknown kind {kind!r}")
    counts_row = flagged.agg(
        *[
            F.sum(
                F.array_contains("_violations", name).cast("long")
            ).alias(name)
            for name, _, _ in constraints
        ],
        F.sum((F.size("_violations") > 0).cast("long")).alias("_rows"),
        *exp_aggs,
    ).head()
    audit = {
        "checked": [name for name, _, _ in constraints],
        "violations": {
            name: int(counts_row[name] or 0) for name, _, _ in constraints
        },
        "rows_quarantined": int(counts_row["_rows"] or 0),
    }
    if expectations:
        exp_audit = {}
        failed = []
        for name, kind, spec in expectations:
            thr = spec[1]
            val = counts_row[f"_exp_{name}"]
            val = 0 if val is None else (
                float(val) if kind == "rate_max" else int(val)
            )
            ok = val <= thr if kind == "rate_max" else val >= thr
            exp_audit[name] = {"value": val, "threshold": thr, "pass": ok}
            if not ok:
                failed.append(name)
        audit["expectations"] = exp_audit
        if failed and expectations_action == "fail":
            raise ValueError(
                f"publish to {base_dir} rejected: expectations failed "
                f"{ {n: exp_audit[n] for n in failed} }"
            )
        if expectations_action not in ("fail", "record"):
            raise ValueError(
                f"expectations_action must be fail|record: "
                f"{expectations_action!r}"
            )
    bad_rows = audit["rows_quarantined"]
    if on_violation == "fail":
        if bad_rows:
            raise ValueError(
                f"publish to {base_dir} rejected: {bad_rows} rows violate "
                f"constraints {audit['violations']}"
            )
        clean = df
    elif on_violation == "quarantine":
        if quarantine_dir is None:
            quarantine_dir = f"{base_dir.rstrip('/')}_quarantine"
        if bad_rows:
            flagged.filter(F.size("_violations") > 0).write.mode(
                "append"
            ).parquet(quarantine_dir)
        clean = flagged.filter(F.size("_violations") == 0).drop("_violations")
    else:
        raise ValueError(f"on_violation must be fail|quarantine: {on_violation!r}")
    meta = dict(publish_kwargs.pop("meta", None) or {})
    meta["constraints"] = audit
    v = publish_versioned(clean, base_dir, meta=meta, **publish_kwargs)
    return v, audit


# Hidden-partitioning transforms (Iceberg-style): partition data by a
# DERIVED value of a source column without the column ever entering the
# table schema — readers keep filtering on the raw column and the format
# maps raw-range predicates to partition-directory bounds. Range-prunable
# kinds are order-preserving; `bucket` serves point lookups only.
_TRANSFORM_RANGE_KINDS = {"day", "month", "hour", "truncate"}


def _transform_expr(schema, spec: dict):
    """(derived column name, Column expr) for a partition-transform
    spec {"source", "kind", and "n" (bucket) / "width" (truncate)}.
    The derived name embeds kind+source so a chain can evolve between
    transforms without directory-name collisions."""
    from pyspark.sql.types import NumericType, StringType

    src, kind = spec["source"], spec["kind"]
    name = f"_hp_{kind}_{src}"
    col = F.col(src)
    if kind == "day":
        return name, F.date_format(col, "yyyy-MM-dd")
    if kind == "month":
        return name, F.date_format(col, "yyyy-MM")
    if kind == "hour":
        return name, F.date_format(col, "yyyy-MM-dd-HH")
    if kind == "bucket":
        return name, F.pmod(F.xxhash64(col), F.lit(int(spec["n"]))).cast(
            "int"
        )
    if kind == "truncate":
        w = int(spec["width"])
        dt = schema[src].dataType
        if isinstance(dt, StringType):
            return name, F.substring(col, 1, w)
        if isinstance(dt, NumericType):
            return name, (F.floor(col / w) * w).cast("long")
        raise ValueError(
            f"truncate transform needs a string or numeric source, got "
            f"{dt.simpleString()} for {src!r}"
        )
    raise ValueError(f"unknown partition transform kind {kind!r}")


def _transform_bounds(spec: dict, lo, hi):
    """Map a raw-column range [lo, hi] (serialized domain: ISO strings
    for timestamps, numerics natively) to the transform's partition-value
    bounds — the driver-side mirror of _transform_expr, conservative by
    construction because every range-prunable transform is monotone."""
    kind = spec["kind"]
    if kind == "day":
        return str(lo)[:10], str(hi)[:10]
    if kind == "month":
        return str(lo)[:7], str(hi)[:7]
    if kind == "hour":
        norm = lambda s: str(s).replace("T", "-").replace(" ", "-")[:13]  # noqa: E731
        return norm(lo), norm(hi)
    if kind == "truncate":
        w = int(spec["width"])
        if isinstance(lo, str):
            return lo[:w], hi[:w]
        return (int(lo) // w) * w, (int(hi) // w) * w
    raise ValueError(f"transform kind {kind!r} is not range-prunable")


def publish_versioned(
    df: DataFrame,
    base_dir: str,
    meta: dict | None = None,
    partition_by: list[str] | None = None,
    published_ts: str | None = None,
    stats_cols: list[str] | None = None,
    ndv_cols: list[str] | None = None,
    staged: bool = False,
    partition_transform: dict | None = None,
) -> int:
    """Versioned dataset publish: write to `base_dir/v=N/` (N = next
    version), then flip the `base_dir/LATEST` pointer to it, and drop a
    manifest.json (row count via Observation — no extra job — plus caller
    metadata). Readers either pin a version (reproducible training runs)
    or follow LATEST; an interrupted publish never corrupts the previous
    version because LATEST flips only after the write completes.

    `stats_cols` opts into DATA SKIPPING: per-file min/max for those
    columns is read from the parquet footers (no data scan) and recorded
    in the manifest as `file_stats`; `read_version_pruned` then skips
    files whose [min, max] cannot intersect a query range — the
    Iceberg/Delta manifest-pruning pattern on this manifest format. At
    100 TB the stats are O(files) metadata, and pruning happens on the
    driver BEFORE any scan task is scheduled. Incompatible with
    `partition_by` (use partition pruning for partitioned layouts —
    Catalyst already does it from the directory structure).

    All control-file and listing I/O goes through the Hadoop FileSystem
    API (sources/lakefs.py), so the same code is correct on hdfs:// and
    object stores, not just local paths. The pointer flip is
    write-tmp-then-rename-with-OVERWRITE (lakefs.replace_text): atomic on
    HDFS/local via FileContext, a single last-write-wins PUT on S3/GCS —
    readers see the old or the new pointer, never a missing or torn
    one."""
    _refuse_shallow_write(df.sparkSession, base_dir, "publish_versioned")
    import json

    from pyspark.sql import Observation

    from .sources import lakefs

    if stats_cols and partition_by:
        raise ValueError(
            "stats_cols requires partition_by=None — partitioned layouts "
            "get directory-based partition pruning instead"
        )
    write_df = df
    if partition_transform:
        # HIDDEN PARTITIONING (Iceberg partition transforms): the layout
        # is hive-partitioned on a DERIVED column, but the table schema
        # (and every reader's view) stays the raw columns — the manifest
        # records the spec so range reads on the SOURCE column prune
        # directories through the transform
        if partition_by:
            raise ValueError(
                "partition_transform and partition_by are mutually "
                "exclusive — a transform IS the partition spec"
            )
        if stats_cols:
            raise ValueError(
                "stats_cols and partition_transform are mutually "
                "exclusive — the transform directories are the skipping "
                "index"
            )
        hp_name, hp_expr = _transform_expr(df.schema, partition_transform)
        write_df = df.withColumn(hp_name, hp_expr)
        partition_by = [hp_name]
    spark = df.sparkSession
    lakefs.mkdirs(spark, base_dir)
    existing = [
        int(name.split("=")[1])
        for name in lakefs.listdir(spark, base_dir)
        if name.startswith("v=") and name.split("=")[1].isdigit()
    ]
    version = max(existing, default=0) + 1
    base = base_dir.rstrip("/")
    out = f"{base}/v={version}"
    obs = Observation(f"publish_v{version}")
    # NDV/null column stats ride the SAME Observation as the row count,
    # so they are free with the write (no second scan) — the table-level
    # cardinality card a join planner or DQ monitor reads from the
    # manifest (per-file min/max serves pruning; this serves estimation)
    obs_aggs = [F.count(F.lit(1)).alias("n")]
    for c in ndv_cols or []:
        obs_aggs.append(F.approx_count_distinct(c).alias(f"ndv_{c}"))
        obs_aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")
        )
    instrumented = write_df.observe(obs, *obs_aggs)
    writer = instrumented.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out)
    if published_ts is None:
        from datetime import datetime, timezone

        published_ts = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    observed = obs.get
    manifest = {
        "version": version,
        "rows": int(observed["n"]),
        "schema": df.schema.simpleString(),
        "schema_json": df.schema.json(),
        "published_ts": published_ts,
        **(meta or {}),
    }
    if partition_by:
        # recorded so chain readers plan this snapshot under its hive
        # layout (same key publish_append uses for spec evolution)
        manifest["partition_by"] = partition_by
    if partition_transform:
        manifest["partition_transform"] = {
            **partition_transform, "col": partition_by[0],
        }
    if ndv_cols:
        manifest["column_stats"] = {
            c: {
                "ndv": int(observed[f"ndv_{c}"]),
                "nulls": int(observed[f"nulls_{c}"]),
            }
            for c in ndv_cols
        }
    if stats_cols:
        stats = _footer_file_stats(spark, out, stats_cols)
        if stats is None:
            stats = _scan_file_stats(spark, out, stats_cols)
        manifest["file_stats"] = {"columns": stats_cols, "files": stats}
    if staged:
        # write-audit-publish: the version directory and manifest exist,
        # but LATEST does not move — followers cannot see the data until
        # promote_staged flips the pointer. STAGED marks the candidate,
        # and the LATEST observed NOW is recorded so promotion can
        # detect a moved main (the lost-update check)
        manifest["staged"] = True
        if lakefs.exists(spark, f"{base}/LATEST"):
            manifest["staged_base"] = int(
                lakefs.read_text(spark, f"{base}/LATEST").strip()
            )
    # underscore prefix: Spark data-source listing ignores it (like _SUCCESS)
    lakefs.write_text(spark, f"{out}/_manifest.json", json.dumps(manifest))
    lakefs.replace_text(
        spark, f"{base}/{'STAGED' if staged else 'LATEST'}", str(version)
    )
    return version


def publish_staged(df: DataFrame, base_dir: str, **publish_kwargs) -> int:
    """WRITE step of write-audit-publish (the Iceberg/Nessie staging-
    branch pattern): materialize a candidate version WITHOUT moving
    LATEST. Readers following LATEST cannot see it; `read_staged` /
    `audit_staged` inspect the exact bytes that would serve; then
    `promote_staged` flips LATEST atomically (no rewrite — promotion is
    a pointer move) or `abort_staged` discards the candidate.

    This complements `publish_checked`, which validates the SOURCE
    frame in the same job as the write: WAP audits the WRITTEN FILES —
    the right gate when audits are expensive, run out-of-band by a
    different system, need human sign-off, or when the source is
    non-replayable so the write must happen exactly once regardless of
    the audit outcome. Re-staging before promotion simply moves STAGED;
    the superseded candidate becomes an unreferenced version that
    `vacuum_versions` reclaims."""
    return publish_versioned(df, base_dir, staged=True, **publish_kwargs)


def read_staged(spark: SparkSession, base_dir: str):
    """(DataFrame, manifest) of the current staged candidate."""
    from .sources import lakefs

    base = base_dir.rstrip("/")
    if not lakefs.exists(spark, f"{base}/STAGED"):
        raise FileNotFoundError(f"no staged version under {base_dir}")
    v = int(lakefs.read_text(spark, f"{base}/STAGED").strip())
    return read_version(spark, base_dir, v)


def audit_staged(
    spark: SparkSession,
    base_dir: str,
    constraints: list[tuple[str, str, object]] | None = None,
    expectations: list[tuple[str, str, object]] | None = None,
) -> dict:
    """AUDIT step of write-audit-publish: evaluate row constraints and
    dataset expectations against the STAGED FILES (one aggregate job
    over the candidate — what you audit is byte-identical to what will
    serve), and record the result in the staged manifest so promotion
    can be gated on it.

    `constraints` rows use publish_checked's vocabulary restricted to
    post-write checks: ("name", "check", Column_predicate),
    ("name", "not_null", [cols]), ("name", "unique", [key_cols]) —
    unique is counted as rows-minus-distinct-keys via one aggregate,
    no window shuffle. `expectations` are publish_checked's rate_max /
    ndv_min, unchanged. Returns the audit dict (also persisted):
    {"constraints": {name: violation_count}, "expectations": {...},
    "pass": bool}."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    df, manifest = read_staged(spark, base_dir)
    aggs = []
    for name, kind, spec in constraints or []:
        if kind == "check":
            aggs.append(F.sum((~spec).cast("long")).alias(f"_c_{name}"))
        elif kind == "not_null":
            cond = None
            for c in spec:
                n = F.col(c).isNull()
                cond = n if cond is None else (cond | n)
            aggs.append(F.sum(cond.cast("long")).alias(f"_c_{name}"))
        elif kind == "unique":
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(F.struct(*[F.col(c) for c in spec]))
                ).alias(f"_c_{name}")
            )
        else:
            raise ValueError(f"constraint {name!r}: unknown kind {kind!r}")
    for name, kind, spec in expectations or []:
        if kind == "rate_max":
            cond, _thr = spec
            aggs.append(F.avg(cond.cast("double")).alias(f"_e_{name}"))
        elif kind == "ndv_min":
            col, _thr = spec
            aggs.append(F.count_distinct(F.col(col)).alias(f"_e_{name}"))
        else:
            raise ValueError(f"expectation {name!r}: unknown kind {kind!r}")
    row = df.agg(*aggs).head() if aggs else {}
    audit: dict = {"constraints": {}, "expectations": {}, "pass": True}
    for name, kind, spec in constraints or []:
        n = int(row[f"_c_{name}"] or 0)
        audit["constraints"][name] = n
        if n:
            audit["pass"] = False
    for name, kind, spec in expectations or []:
        thr = spec[1]
        val = row[f"_e_{name}"]
        val = 0 if val is None else (
            float(val) if kind == "rate_max" else int(val)
        )
        ok = val <= thr if kind == "rate_max" else val >= thr
        audit["expectations"][name] = {
            "value": val, "threshold": thr, "pass": ok,
        }
        if not ok:
            audit["pass"] = False
    manifest["wap_audit"] = audit
    lakefs.replace_text(
        spark,
        f"{base}/v={manifest['version']}/_manifest.json",
        json.dumps(manifest),
    )
    return audit


def promote_staged(
    spark: SparkSession,
    base_dir: str,
    require_audit_pass: bool = True,
    allow_moved_base: bool = False,
) -> int:
    """PUBLISH step of write-audit-publish: flip LATEST to the staged
    version — a pointer move, no data rewrite — and retire the STAGED
    marker. With `require_audit_pass` (default) promotion refuses a
    candidate whose manifest carries no passing `audit_staged` record:
    un-audited data cannot reach followers by accident. Promotion also
    refuses when LATEST has MOVED since the candidate was staged (the
    candidate is a full snapshot: flipping to it would silently discard
    whatever landed in between — the lost-update anomaly); pass
    `allow_moved_base=True` to overwrite deliberately. The audit
    record stays in the manifest after promotion (the admission
    evidence readers can inspect), only the `staged` flag is cleared."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    df, manifest = read_staged(spark, base_dir)
    v = int(manifest["version"])
    if not allow_moved_base and "staged_base" in manifest:
        current = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
        if current != int(manifest["staged_base"]):
            raise ValueError(
                f"refusing to promote v={v} of {base_dir}: LATEST moved "
                f"v={manifest['staged_base']} -> v={current} since the "
                "candidate was staged — promoting would discard that "
                "commit; re-stage from the current LATEST or pass "
                "allow_moved_base=True to overwrite deliberately"
            )
    if require_audit_pass:
        audit = manifest.get("wap_audit")
        if not audit or not audit.get("pass"):
            raise ValueError(
                f"refusing to promote v={v} of {base_dir}: "
                + (
                    "audit failed "
                    + json.dumps(audit["constraints"] | {
                        k: a for k, a in audit["expectations"].items()
                        if not a["pass"]
                    })
                    if audit
                    else "no audit_staged record (run audit_staged first, "
                    "or pass require_audit_pass=False)"
                )
            )
    manifest.pop("staged", None)
    lakefs.replace_text(
        spark, f"{base}/v={v}/_manifest.json", json.dumps(manifest)
    )
    lakefs.replace_text(spark, f"{base}/LATEST", str(v))
    lakefs.delete(spark, f"{base}/STAGED")
    return v


def abort_staged(spark: SparkSession, base_dir: str) -> int:
    """Discard the staged candidate: delete its version directory and
    the STAGED marker. LATEST (and every published version) is
    untouched — aborting WAP is free and total."""
    from .sources import lakefs

    base = base_dir.rstrip("/")
    _, manifest = read_staged(spark, base_dir)
    v = int(manifest["version"])
    lakefs.delete(spark, f"{base}/v={v}")
    lakefs.delete(spark, f"{base}/STAGED")
    return v


def publish_append(
    df: DataFrame,
    base_dir: str,
    meta: dict | None = None,
    published_ts: str | None = None,
    stats_cols: list[str] | None = None,
    evolve: str = "none",
    partition_by: list[str] | None = None,
    renames: dict[str, str] | None = None,
    drops: list[str] | None = None,
    branch: str | None = None,
    partition_transform: dict | None = None,
) -> int:
    """Incremental APPEND publish: write only `df`'s rows into the new
    version directory and record `parent` = the previous version in the
    manifest — the new snapshot is (parent chain) + (this batch), so an
    append costs O(batch), never O(table). This is the Iceberg/Delta
    append-commit shape on this manifest format (a full-snapshot
    `publish_versioned` is the rewrite/compaction commit; the two
    compose — a compaction publishes a full snapshot with parent=None,
    truncating the chain).

    Readers: `read_version_chain` resolves the chain; `read_chain_pruned`
    additionally applies min-max data skipping across EVERY segment's
    file_stats. The LATEST flip is the same atomic pointer rename, so an
    interrupted append never corrupts the prior snapshot.

    SCHEMA EVOLUTION (`evolve`): the first lake mutation a real user
    makes is adding a column. `evolve="none"` (default) pins the chain
    schema — an append whose columns or types differ from the chain
    head fails loudly before any write. `evolve="additive"` allows the
    new segment to carry a typed SUPERSET of the head schema: every
    existing column must keep its exact name and type (a type change is
    always an error — that is a rewrite, not an append), new columns are
    recorded in the manifest as `added_columns`. Chain readers then
    derive the union schema from the manifests alone and NULL-backfill
    the new columns for pre-evolution segments — the Iceberg
    schema-from-manifest pattern, with zero footer I/O at read planning
    time.

    RENAME and TYPE-WIDENING evolution (the next lake mutations a real
    user makes): `renames` maps each NEW column name in `df` to the OLD
    chain-head name it replaces — renames must be DECLARED because a
    rename is indistinguishable from drop+add at the schema level
    (Iceberg solves this with field ids; this manifest format records
    the mapping instead). A column may also WIDEN to an exact-value
    supertype (int->bigint, float->double — _WIDEN_OK) in the same
    append. Both require `evolve="additive"`. Chain readers resolve
    names newest-wins (old segments' columns alias to the head name,
    composing across chained renames) and cast old segments up to the
    widened type; `read_chain_pruned` translates pruning columns to
    each segment's local name, so file stats recorded under the OLD
    name keep skipping after the rename.

    DROP evolution: `drops` lists chain-head columns this append
    retires — a LOGICAL drop: the manifest records it, every chain
    reader projects the column away (old segments included), and no
    file is rewritten; compaction later makes it physical. A name that
    was ever dropped or renamed-away cannot be RE-ADDED on the same
    chain (old segments still carry data under it, which would
    resurface) — compact first, which truncates the history.

    PARTITION-SPEC EVOLUTION (`partition_by`): a segment may carry a
    hive partition layout (`v=N/col=value/part-*.parquet`) while earlier
    segments are flat — the Iceberg partition-evolution rule that a spec
    change applies to NEW data only, old files are never rewritten. The
    manifest records the spec; chain readers plan each segment under its
    OWN layout (per-segment scans unioned), so partition pruning applies
    to partitioned segments and file-stat pruning to flat ones in the
    same read. `stats_cols` is rejected alongside `partition_by`: the
    partition key IS the skipping index for such a segment (directory
    pruning), and per-file footer stats inside hive dirs would double-
    track the same bound."""
    _refuse_shallow_write(df.sparkSession, base_dir, "publish_append")
    import json

    from .sources import lakefs

    spark = df.sparkSession
    write_df = df
    if partition_transform:
        # hidden partitioning on an append segment — partition-spec
        # evolution composes: earlier segments may be flat, raw-hive,
        # or a different transform; chain readers plan each under its
        # own spec and range reads prune through each spec's mapping
        if partition_by:
            raise ValueError(
                "partition_transform and partition_by are mutually "
                "exclusive — a transform IS the partition spec"
            )
        if stats_cols:
            raise ValueError(
                "stats_cols and partition_transform are mutually "
                "exclusive — the transform directories are the skipping "
                "index"
            )
        hp_name, hp_expr = _transform_expr(df.schema, partition_transform)
        write_df = df.withColumn(hp_name, hp_expr)
        partition_by = [hp_name]
    elif partition_by:
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(
                f"partition_by columns {missing} not in dataframe schema"
            )
        if len(partition_by) > 1:
            raise ValueError(
                "append segments support a single partition column — the "
                "chain readers' directory pruning and file accounting are "
                "single-level; nest the second key into the value (e.g. "
                "y_m) or keep it a stats_cols range on a flat segment"
            )
        if stats_cols:
            raise ValueError(
                "stats_cols and partition_by are mutually exclusive on an "
                "append segment — the partition directories are the "
                "skipping index for a partitioned segment"
            )
    lakefs.mkdirs(spark, base_dir)
    base = base_dir.rstrip("/")
    existing = [
        int(name.split("=")[1])
        for name in lakefs.listdir(spark, base)
        if name.startswith("v=") and name.split("=")[1].isdigit()
    ]
    version = max(existing, default=0) + 1
    if branch is not None:
        # BRANCH append: the chain parent is the branch head, and the
        # branch pointer (not LATEST) advances — main's readers never
        # see branch segments. Version numbers stay globally unique.
        parent = branch_head(spark, base, branch)
    elif lakefs.exists(spark, f"{base}/LATEST"):
        # parent from the POINTER, not max(existing): with branches or
        # a WAP candidate in flight, the highest version number may be
        # another line of history — chaining off it would leak
        # unpromoted/branch data into main
        parent = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    else:
        # no LATEST: no published line exists yet, so any version on
        # disk is an unpromoted WAP candidate (publish_staged on a
        # fresh base) or an aborted/superseded one awaiting vacuum.
        # Chaining off max(existing) would hang main onto un-audited
        # staged bytes the moment this append flips LATEST — the exact
        # leak WAP exists to prevent. Refuse while a candidate is
        # pending; otherwise start a fresh line.
        if lakefs.exists(spark, f"{base}/STAGED"):
            raise ValueError(
                f"{base} has a STAGED candidate but no published "
                "LATEST — appending would make un-audited staged data "
                "readable from main; promote_staged/abort_staged the "
                "candidate first, or publish a base snapshot with "
                "publish_versioned"
            )
        parent = None
    added_columns: list[str] = []
    widened_columns: dict[str, list[str]] = {}
    if (renames or drops) and parent is None:
        raise ValueError(
            "renames/drops need an existing chain to evolve from"
        )
    if parent is not None:
        parent_manifest = json.loads(
            lakefs.read_text(spark, f"{base}/v={parent}/_manifest.json")
        )
        if _mor_record(parent_manifest):
            raise ValueError(
                f"v={parent} at {base} is a merge-on-read delete layer — "
                "an append segment's chain walk would bypass its vector "
                "and resurface deleted rows; materialize_mor first"
            )
        head_schema = _manifest_schema(parent_manifest)
        added_columns, widened_columns = _check_additive_evolution(
            head_schema, df.schema, renames, drops
        )
        if (
            added_columns or widened_columns or renames or drops
        ) and evolve != "additive":
            raise ValueError(
                f"append evolves the chain at {base} (adds "
                f"{added_columns}, widens {list(widened_columns)}, "
                f"renames {dict(renames or {})}, drops "
                f"{list(drops or [])}) but evolve='none' pins "
                "the schema — pass evolve='additive'"
            )
        if added_columns:
            # a historically dropped / renamed-away name must not come
            # back: older segments still carry data under it, and the
            # chain readers would resurface those values as the new
            # column's. Compaction truncates history and frees the name.
            retired: set[str] = set()
            for m in _resolve_chain(spark, base, parent):
                retired |= set(m.get("dropped_columns") or [])
                retired |= set((m.get("renamed_columns") or {}).values())
            clashes = sorted(set(added_columns) & retired)
            if clashes:
                raise ValueError(
                    f"cannot re-add retired column(s) {clashes} on the "
                    f"chain at {base} — older segments still carry data "
                    "under that name; compact_chain first"
                )
    out = f"{base}/v={version}"
    from pyspark.sql import Observation

    obs = Observation(f"append_v{version}")
    writer = write_df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "errorifexists"
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out)
    if published_ts is None:
        from datetime import datetime, timezone

        published_ts = datetime.now(timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%fZ"
        )
    manifest = {
        "version": version,
        "parent": parent,
        "append": True,
        "rows": int(obs.get["n"]),
        "schema": df.schema.simpleString(),
        "schema_json": df.schema.json(),
        "published_ts": published_ts,
        **(meta or {}),
    }
    if added_columns:
        manifest["added_columns"] = added_columns
    if widened_columns:
        manifest["widened_columns"] = widened_columns
    if renames:
        manifest["renamed_columns"] = dict(renames)
    if drops:
        manifest["dropped_columns"] = list(drops)
    if partition_by:
        manifest["partition_by"] = partition_by
    if partition_transform:
        manifest["partition_transform"] = {
            **partition_transform, "col": partition_by[0],
        }
    if stats_cols:
        stats = _footer_file_stats(spark, out, stats_cols)
        if stats is None:
            stats = _scan_file_stats(spark, out, stats_cols)
        manifest["file_stats"] = {"columns": stats_cols, "files": stats}
    lakefs.write_text(spark, f"{out}/_manifest.json", json.dumps(manifest))
    lakefs.replace_text(
        spark,
        _branch_file(base, branch) if branch is not None
        else f"{base}/LATEST",
        str(version),
    )
    return version


def publish_bucketed(
    df: DataFrame,
    base_dir: str,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    meta: dict | None = None,
) -> int:
    """Versioned publish with a BUCKETED layout: the data lands in
    `base_dir/v=N/` hash-bucketed (and bucket-sorted) on `key`, and the
    manifest records the bucket spec alongside the schema. Two datasets
    published with the same `key` domain and bucket count join
    co-located: the dominant shuffle of every recurring published-data
    join (fact-to-fact on the mart key) is paid ONCE at publish time,
    then every downstream join/agg on that key runs with zero
    `Exchange hashpartitioning` (SortMergeJoin over pre-sorted buckets —
    tests/test_lake_bucketed.py pins the plan).

    Spark's bucket metadata lives in a catalog, not in parquet footers,
    so the publish writes through `saveAsTable` with an explicit
    external `path`; `read_bucketed` re-declares the table from the
    manifest (`CREATE TABLE ... CLUSTERED BY ... LOCATION`) when the
    session catalog doesn't know it yet — the layout is therefore
    durable in the lake, not hostage to one metastore's lifetime.

    At 100 TB pick `n_buckets` so one bucket of the larger side fits an
    executor core's working set (thousands of buckets, not 8); both
    sides of a recurring join MUST agree on the count or Spark falls
    back to shuffling the mismatched side."""
    import json

    from .sources import lakefs

    spark = df.sparkSession
    lakefs.mkdirs(spark, base_dir)
    base = base_dir.rstrip("/")
    existing = [
        int(name.split("=")[1])
        for name in lakefs.listdir(spark, base)
        if name.startswith("v=") and name.split("=")[1].isdigit()
    ]
    version = max(existing, default=0) + 1
    out = f"{base}/v={version}"
    tbl = f"{table}_v{version}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    from pyspark.sql import Observation

    obs = Observation(f"bucketed_v{version}")
    (
        df.observe(obs, F.count(F.lit(1)).alias("n"))
        .write.mode("errorifexists")
        .bucketBy(n_buckets, key)
        .sortBy(*(sort_cols or [key]))
        .option("path", out)
        .saveAsTable(tbl)
    )
    from datetime import datetime, timezone

    manifest = {
        "version": version,
        "rows": int(obs.get["n"]),
        "schema": df.schema.simpleString(),
        "schema_json": df.schema.json(),
        "table": tbl,
        "bucket": {
            "key": key,
            "n_buckets": n_buckets,
            "sort_cols": sort_cols or [key],
        },
        "published_ts": datetime.now(timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%fZ"
        ),
        **(meta or {}),
    }
    lakefs.write_text(spark, f"{out}/_manifest.json", json.dumps(manifest))
    lakefs.replace_text(spark, f"{base}/LATEST", str(version))
    return version


def read_bucketed(
    spark: SparkSession, base_dir: str, version: int | None = None
):
    """Read a `publish_bucketed` version WITH its bucket layout intact:
    resolves the manifest, and when the session catalog has no entry for
    the recorded table (fresh JVM / different metastore), re-declares an
    external bucketed table over the version directory from the
    manifest's schema + bucket spec — bucket-aware planning (no Exchange
    on the bucket key) is restored from lake metadata alone. Returns
    (DataFrame, manifest)."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    if version is None:
        version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    out = f"{base}/v={version}"
    manifest = json.loads(lakefs.read_text(spark, f"{out}/_manifest.json"))
    tbl = manifest["table"]
    if not spark.catalog.tableExists(tbl):
        schema = _manifest_schema(manifest)
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        b = manifest["bucket"]
        sort = ", ".join(f"`{c}`" for c in b["sort_cols"])
        spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING parquet "
            f"CLUSTERED BY (`{b['key']}`) SORTED BY ({sort}) "
            f"INTO {b['n_buckets']} BUCKETS LOCATION '{out}'"
        )
    return spark.table(tbl), manifest


def build_file_index(
    spark: SparkSession,
    base_dir: str,
    col: str,
    version: int | None = None,
) -> int:
    """Secondary file index for POINT lookups on a column the layout is
    NOT clustered by: one pass over the version computes the distinct
    (value, file) pairs and stores them as parquet under
    `v=N/_index_<col>/` (underscore prefix: invisible to normal data
    reads), recording the index in the manifest. Min-max stats answer
    range windows on the CLUSTERED column; this answers `col = value`
    on any other column by naming exactly the files that contain the
    value — the Hive bucket-pruning / Iceberg-Puffin role.

    Cost model at 100 TB: the build is one shuffle of (value, fileId)
    pairs — O(data) once, amortized over every subsequent lookup; the
    index size is O(distinct values × files containing them), itself a
    columnar table that can be range-clustered and pruned. Returns the
    number of index rows written."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    if version is None:
        version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    out = f"{base}/v={version}"
    pre = json.loads(lakefs.read_text(spark, f"{out}/_manifest.json"))
    if pre.get("partition_by"):
        raise ValueError(
            f"v={version} is hive-partitioned on {pre['partition_by']} — "
            "the flat file index does not span partition directories; "
            "point lookups on the partition key prune directories "
            "instead, and compact_chain flattens the layout if a "
            "secondary index on another column is needed"
        )
    if _mor_record(pre):
        raise ValueError(
            f"v={version} is a merge-on-read delete layer (no data "
            "files of its own, and an index over the parent's files "
            "would resurface deleted rows) — materialize_mor first"
        )
    idx_dir = f"{out}/_index_{col}"
    idx = (
        spark.read.parquet(out)
        .select(
            F.col(col).alias("value"),
            F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).alias("file"),
        )
        .distinct()
    )
    idx.write.mode("overwrite").parquet(idx_dir)
    n = spark.read.parquet(idx_dir).count()
    mpath = f"{out}/_manifest.json"
    manifest = json.loads(lakefs.read_text(spark, mpath))
    indexes = set(manifest.get("indexes", []))
    indexes.add(col)
    manifest["indexes"] = sorted(indexes)
    lakefs.replace_text(spark, mpath, json.dumps(manifest))
    return n


def read_point_lookup(
    spark: SparkSession,
    base_dir: str,
    col: str,
    value,
    version: int | None = None,
):
    """Point lookup through a secondary file index (build_file_index):
    resolve which files contain `value` (an index probe — driver-side,
    O(files-per-value) result), read only those, and apply the exact
    row filter. Returns (DataFrame, n_files_total, n_files_read).

    The index is authoritative for the version it was built on
    (versions are immutable), so a value absent from the index reads
    ZERO files — unlike min-max pruning there is no conservative
    fallback to pay."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    if version is None:
        version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    out = f"{base}/v={version}"
    manifest = json.loads(
        lakefs.read_text(spark, f"{out}/_manifest.json")
    )
    if col not in manifest.get("indexes", []):
        raise ValueError(
            f"no file index for column {col!r} in version {version} — "
            "run build_file_index first"
        )
    files = [
        r.file
        for r in spark.read.parquet(f"{out}/_index_{col}")
        .filter(F.col("value") == F.lit(value))
        .select("file")
        .collect()
    ]
    total = len(lakefs_list_parquet(spark, out))
    if not files:
        df = spark.read.parquet(out).filter(F.lit(False))
        return df, total, 0
    df = spark.read.parquet(*[f"{out}/{f}" for f in files]).filter(
        F.col(col) == F.lit(value)
    )
    return df, total, len(files)


def read_point_lookup_chain(
    spark: SparkSession,
    base_dir: str,
    col: str,
    value,
    version: int | None = None,
):
    """Point lookup across an APPEND CHAIN: probe each segment's file
    index (build_file_index per segment — run it after each append, or
    let compact_chain consolidate) and read only the files that contain
    the value, across every segment. Segments without an index fall back
    to reading all their files with the filter (conservative, loud in
    the returned counts). Returns (DataFrame, n_files_total,
    n_files_read)."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    chain = _resolve_chain(spark, base, version)
    if _mor_record(chain[0]):
        # point lookup through a MOR head: probe the physical chain,
        # then subtract the vectors (a deleted key must come back as
        # zero rows, not as its parent-version ghost)
        data_v, _ = _mor_layers(spark, base, chain[0])
        df, total, n_read = read_point_lookup_chain(
            spark, base_dir, col, value, version=data_v
        )
        return _apply_mor(spark, df, base, chain[0]), total, n_read
    schema = _chain_merged_schema(chain)
    aliases = _chain_aliases(chain)
    evolved = _chain_evolved(chain)
    pred = F.col(col) == F.lit(value)
    total = 0
    n_read = 0
    paths = []
    branches = []
    for m in chain:
        vdir = f"{base}/v={m['version']}"
        # indexes and partition dirs carry the SEGMENT-LOCAL column name
        seg_col = aliases[m["version"]].get(col, col)
        pb = m.get("partition_by") or []
        if len(pb) > 1:
            n = _count_parquet_recursive(spark, vdir)
            total += n
            n_read += n
            branches.append(
                _segment_read(
                    spark, base, m, schema,
                    aliases=aliases[m["version"]],
                )
            )
            continue
        if pb:
            # partition-evolved segment: equality on the partition key
            # prunes to exactly one directory; other columns read the
            # whole segment (conservative, counted honestly)
            dirs = _partition_dirs(spark, vdir, pb[0])
            total += sum(n for _, _, n in dirs)
            if seg_col == pb[0]:
                keep = [
                    (d, n) for d, v, n in dirs if _pv_eq(d, v, value)
                ]
            else:
                keep = [(d, n) for d, _, n in dirs]
            n_read += sum(n for _, n in keep)
            if keep:
                branches.append(
                    _segment_read(
                        spark, base, m, schema,
                        sub_paths=[f"{vdir}/{d}" for d, _ in keep],
                        aliases=aliases[m["version"]],
                    )
                )
            continue
        seg_files = lakefs_list_parquet(spark, vdir)
        total += len(seg_files)
        if seg_col in m.get("indexes", []):
            hits = [
                r.file
                for r in spark.read.parquet(f"{vdir}/_index_{seg_col}")
                .filter(F.col("value") == F.lit(value))
                .select("file")
                .collect()
            ]
            kept = [f"{vdir}/{f}" for f in hits]
        else:
            kept = [f"{vdir}/{f}" for f in seg_files]
        if evolved:
            n_read += len(kept)
            if kept:
                branches.append(
                    _segment_read(
                        spark, base, m, schema, sub_paths=kept,
                        aliases=aliases[m["version"]],
                    )
                )
        else:
            paths.extend(kept)
    n_read += len(paths)
    if paths:
        branches.insert(0, spark.read.schema(schema).parquet(*paths))
    if not branches:
        df, _ = read_version_chain(spark, base_dir, version)
        return df.filter(F.lit(False)), total, 0
    return _union_all(branches).filter(pred), total, n_read


def maybe_compact(
    spark: SparkSession,
    base_dir: str,
    max_segments: int = 8,
    min_avg_file_mb: float = 8.0,
    **compact_kwargs,
) -> int | None:
    """Policy-driven OPTIMIZE: compact the chain only when the metadata
    says it is due — chain longer than `max_segments` (read planning and
    pruning degrade with segment count) or mean data-file size below
    `min_avg_file_mb` (the small-files tax: per-file open/footer cost
    dominates sub-MB files). The decision is O(chain) driver-side
    listing — no data I/O when nothing is due, which is the common case
    a scheduler hits every cycle. Returns the new version when a
    compaction ran, else None. Thresholds at 100 TB: segments in the
    tens, target file size 128 MB-1 GB; the defaults here suit the test
    corpus."""
    from .sources import lakefs

    base = base_dir.rstrip("/")
    chain = _resolve_chain(spark, base, None)
    n_files = 0
    n_bytes = 0
    for m in chain:
        vdir = f"{base}/v={m['version']}"
        n_files += _count_parquet_recursive(spark, vdir)
        n_bytes += lakefs.du_bytes(spark, vdir)
    avg_mb = (n_bytes / n_files / 1e6) if n_files else 0.0
    if len(chain) <= max_segments and avg_mb >= min_avg_file_mb:
        return None
    return compact_chain(spark, base_dir, **compact_kwargs)


def compact_chain(
    spark: SparkSession,
    base_dir: str,
    stats_cols: list[str] | None = None,
    index_cols: list[str] | None = None,
    cluster_by: str | None = None,
    zorder_by: list[str] | None = None,
    n_files: int = 8,
) -> int:
    """Chain compaction: read the LATEST append chain, publish it back
    as ONE full snapshot (optionally range-clustered on `cluster_by`,
    or Z-ORDER clustered on several columns via `zorder_by` — the
    Delta/Iceberg OPTIMIZE ZORDER BY shape, layout.morton_key), re-
    generating file stats and secondary indexes in the same commit.
    Subsequent appends start a fresh chain from the compacted base;
    vacuum can then reclaim the old segments once they fall out of the
    keep window.

    `cluster_by` gives ONE column tight per-file ranges; `zorder_by`
    trades a few rank bits per column so EVERY listed column gets a
    narrow per-file span — pick it when the read pattern filters on
    more than one key, and pair it with stats_cols over the same
    columns so the manifest min-max actually captures the spans
    (tests/test_lake_zorder_compact.py measures the pruning on both
    dimensions). Returns the new version number.

    This is the rewrite-commit half of the append/compact pair: the
    stream grows the chain in O(batch) commits, compaction periodically
    pays one O(table) rewrite to restore clustering (data skipping
    degrades as appends interleave ranges) and to consolidate per-
    segment indexes into one."""
    _refuse_shallow_write(spark, base_dir, "compact_chain")
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    df, chain = read_version_chain(spark, base_dir)
    if zorder_by:
        from .layout import morton_key

        df = (
            df.withColumn("_zkey", morton_key(df, zorder_by))
            .repartitionByRange(n_files, "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey")
        )
    elif cluster_by:
        df = df.repartitionByRange(n_files, cluster_by)
    v = publish_versioned(
        df,
        base_dir,
        meta={"compacted_from": [m["version"] for m in chain]},
        stats_cols=stats_cols,
    )
    for col in index_cols or []:
        build_file_index(spark, base_dir, col, version=v)
    return v


def _manifest_schema(m: dict):
    """StructType recorded in a manifest: `schema_json` (exact, written
    by this code) preferred; older manifests fall back to parsing the
    human-readable `schema` simpleString (struct<name:type,...> is valid
    DDL). Control-plane only — never touches a data file."""
    import json as _json

    from pyspark.sql.types import DataType, StructType

    if "schema_json" in m:
        return StructType.fromJson(_json.loads(m["schema_json"]))
    return DataType.fromDDL(m["schema"])


# exact-value type widenings an append may introduce (Delta/Iceberg
# type-widening rule): every int fits a bigint, every float32 is exactly
# representable as float64. int->double is NOT here (loses 2^53+ ints),
# nor any narrowing — those are rewrites.
_WIDEN_OK = {("int", "bigint"), ("smallint", "int"), ("smallint", "bigint"),
             ("float", "double")}


def _is_widening(old_type, new_type) -> bool:
    return (old_type.simpleString(), new_type.simpleString()) in _WIDEN_OK


def _check_additive_evolution(
    parent,
    child,
    renames: dict[str, str] | None = None,
    drops: list[str] | None = None,
) -> tuple[list[str], dict[str, list[str]]]:
    """Validate that `child` schema is a legal APPEND evolution of
    `parent`: every parent column present in child — under the same
    name or a DECLARED rename (`renames` maps new -> old; undeclared
    renames are indistinguishable from drop+add and rejected) — with
    the identical type or an exact-value WIDENING (_WIDEN_OK).
    Nullability aside: parquet NULL-backfill makes everything nullable
    on read anyway. A column may also be DROPPED when declared in
    `drops` (a logical drop: the manifest records it, readers project
    it away everywhere, no file is rewritten). Returns (added_columns,
    widened {new_name: [from, to]}). Raises ValueError on an undeclared
    missing column, a non-widening type change, or an ill-formed
    rename/drop — those are rewrites (compaction commits), never
    appends."""
    renames = renames or {}
    drops = drops or []
    child_types = {f.name: f.dataType for f in child.fields}
    parent_types = {f.name: f.dataType for f in parent.fields}
    problems = []
    for d in drops:
        if d not in parent_types:
            problems.append(f"drop target {d!r} not in chain head")
        if d in child_types:
            problems.append(
                f"drop target {d!r} still present in append schema"
            )
        if d in renames.values() or d in renames:
            problems.append(f"column {d!r} both renamed and dropped")
    for new, old in renames.items():
        if old not in parent_types:
            problems.append(f"rename source {old!r} not in chain head")
        if new not in child_types:
            problems.append(f"rename target {new!r} not in append schema")
        if old in child_types:
            problems.append(
                f"rename source {old!r} still present in append schema"
            )
    old_to_new = {old: new for new, old in renames.items()}
    widened: dict[str, list[str]] = {}
    for f in parent.fields:
        if f.name in drops:
            continue
        name = old_to_new.get(f.name, f.name)
        if name not in child_types:
            if f.name not in old_to_new:
                # declared-rename misfires are already reported above
                problems.append(
                    f"column {f.name!r} dropped (declare it in drops=[...] "
                    "to drop logically)"
                )
            continue
        ct = child_types[name]
        if ct != f.dataType:
            if _is_widening(f.dataType, ct):
                widened[name] = [
                    f.dataType.simpleString(), ct.simpleString()
                ]
            else:
                problems.append(
                    f"column {f.name!r} type changed "
                    f"{f.dataType.simpleString()} -> "
                    f"{ct.simpleString()} (not an exact-value widening)"
                )
    if problems:
        raise ValueError(
            "non-additive schema evolution on append chain: "
            + "; ".join(problems)
        )
    covered = {old_to_new.get(f.name, f.name) for f in parent.fields}
    added = [f.name for f in child.fields if f.name not in covered]
    return added, widened


def _chain_aliases(chain) -> dict[int, dict[str, str]]:
    """Per-segment column-name translation for a (possibly renamed)
    chain: {version: {current_name: name_in_that_segment}} — only
    non-identity entries are recorded. Renames recorded on a segment
    apply to every OLDER segment and COMPOSE across chained renames
    (a→b at v3, b→c at v5 resolves v2's `a` to `c`): walking
    newest-first, each rename folds through any newer mapping of its
    target. O(chain) driver work, like the schema merge."""
    alias: dict[str, str] = {}  # historical name -> current (head) name
    out: dict[int, dict[str, str]] = {}
    for m in chain:  # newest first
        seg: dict[str, str] = {}
        for f in _manifest_schema(m).fields:
            cur = alias.get(f.name, f.name)
            if cur != f.name:
                seg[cur] = f.name
        out[m["version"]] = seg
        # renames INTRODUCED by this segment affect only older ones —
        # folded in after mapping this segment's own (new-named) columns
        for new, old in (m.get("renamed_columns") or {}).items():
            alias[old] = alias.get(new, new)
    return out


def _chain_evolved(chain) -> bool:
    """True when any segment introduced a rename or widening — the flat
    single-scan fast path is then invalid (schema-on-read by NAME would
    null-fill renamed columns and type-clash widened ones); readers
    plan per-segment branches instead."""
    return any(
        m.get("renamed_columns") or m.get("widened_columns") for m in chain
    )


def _chain_merged_schema(chain):
    """Union schema of an append chain from its MANIFESTS (newest
    first): resolves RENAMES to the head's (newest) names via
    _chain_aliases, accepts exact-value WIDENINGS (merged type = the
    newer, wider one; anything else raises — a rewrite, not an append),
    then returns a StructType in head-segment column order with any
    pre-evolution-only columns appended. All fields are forced
    nullable — pre-evolution segments NULL-backfill evolved columns.
    O(chain) driver work, zero data/footer I/O: this is why chain reads
    stay control-plane-cheap at 100 TB (a mergeSchema footer merge
    would be O(files) tasks instead)."""
    from pyspark.sql.types import StructField, StructType

    aliases = _chain_aliases(chain)
    # logically dropped names (recorded at drop time in that point's
    # current name space, which later renames can never touch — a
    # dropped column has no newer occurrences to rename)
    dropped: set[str] = set()
    for m in chain:
        dropped |= set(m.get("dropped_columns") or [])
    types: dict[str, object] = {}
    order: list[str] = []
    for m in chain:  # newest first: head wins names, types, order
        seg_alias = aliases[m["version"]]
        local_to_cur = {v: k for k, v in seg_alias.items()}
        for f in _manifest_schema(m).fields:
            cur = local_to_cur.get(f.name, f.name)
            if cur in dropped:
                continue
            if cur in types:
                if types[cur] != f.dataType and not _is_widening(
                    f.dataType, types[cur]
                ):
                    raise ValueError(
                        f"append chain segment v={m['version']} has "
                        f"column {cur!r} as "
                        f"{f.dataType.simpleString()} but the chain "
                        f"resolves it as "
                        f"{types[cur].simpleString()} — non-widening "
                        "type changes require a compaction rewrite"
                    )
            else:
                types[cur] = f.dataType
                order.append(cur)
    return StructType(
        [StructField(n, types[n], True) for n in order]
    )


def _segment_read(
    spark: SparkSession,
    base: str,
    m: dict,
    merged,
    sub_paths: list[str] | None = None,
    aliases: dict[str, str] | None = None,
):
    """One chain segment planned under its OWN layout and normalized to
    the merged chain schema: missing columns NULL-backfilled, RENAMED
    columns read under their segment-local name and aliased to the head
    name (`aliases` = this segment's {current: local} from
    _chain_aliases), narrower pre-widening types CAST up, column order
    unified — so segments union cleanly. For a hive-partitioned segment
    the pinned schema still names the partition columns — Spark derives
    them from the directory names (basePath keeps that working when
    `sub_paths` narrows the read to pruned partition dirs)."""
    from pyspark.sql.types import StructField, StructType

    vdir = f"{base}/v={m['version']}"
    seg = _manifest_schema(m)
    pinned = StructType(
        [StructField(f.name, f.dataType, True) for f in seg.fields]
    )
    reader = spark.read.schema(pinned)
    if m.get("partition_by"):
        reader = reader.option("basePath", vdir)
    df = reader.parquet(*(sub_paths if sub_paths is not None else [vdir]))
    seg_types = {f.name: f.dataType for f in seg.fields}
    aliases = aliases or {}
    cols = []
    for f in merged.fields:
        local = aliases.get(f.name, f.name)
        if local in seg_types:
            c = F.col(local)
            if seg_types[local] != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _union_all(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _hive_value(raw: str):
    """Decode a hive `col=value` directory value for pruning compare:
    numeric strings compare as numbers, everything else as strings."""
    try:
        return int(raw)
    except ValueError:
        try:
            return float(raw)
        except ValueError:
            return raw


def _pv_eq(dirname: str, decoded, value) -> bool:
    """Conservative equality test for a hive partition directory against
    a point-lookup value: true when the numerically-decoded value OR the
    raw directory string matches — a string column holding '007' decodes
    to int 7 and would otherwise never equal the probe string '007',
    silently pruning rows that exist."""
    raw = dirname.split("=", 1)[1]
    return decoded == value or raw == str(value)


def _pv_in_range(v, lo, hi) -> bool:
    """Conservative range test for a decoded hive partition value: an
    incomparable value (null sentinel __HIVE_DEFAULT_PARTITION__, or a
    type mismatch with the probe bounds) is INCLUDED — pruning may only
    skip what provably cannot match."""
    try:
        return lo <= v <= hi
    except TypeError:
        return True


def _count_parquet_recursive(spark: SparkSession, vdir: str) -> int:
    """Data-file count under a version dir, any partition depth —
    driver-side listing for honest pruning accounting."""
    from .sources import lakefs

    n = 0
    stack = [vdir]
    while stack:
        d = stack.pop()
        for name in lakefs.listdir(spark, d):
            if name.startswith(("_", ".")):
                continue
            if name.endswith(".parquet"):
                n += 1
            else:
                stack.append(f"{d}/{name}")
    return n


def _partition_dirs(spark: SparkSession, vdir: str, key: str):
    """[(dirname, decoded value, n_files)] for a hive-partitioned
    segment — driver-side listing, O(partition dirs)."""
    from .sources import lakefs

    out = []
    for name in lakefs.listdir(spark, vdir):
        if not name.startswith(f"{key}="):
            continue
        n = len(lakefs_list_parquet(spark, f"{vdir}/{name}"))
        out.append((name, _hive_value(name.split("=", 1)[1]), n))
    return out


def _resolve_chain(spark: SparkSession, base: str, version: int | None):
    """Manifest chain for a version (newest first): follow `parent`
    links until a full snapshot (no `append` flag / no parent). O(chain)
    control-plane reads."""
    import json

    from .sources import lakefs

    if version is None:
        version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    chain = []
    v: int | None = version
    while v is not None:
        m = json.loads(
            lakefs.read_text(spark, f"{base}/v={v}/_manifest.json")
        )
        chain.append(m)
        v = m.get("parent") if m.get("append") else None
    return chain


def read_version_chain(
    spark: SparkSession, base_dir: str, version: int | None = None
):
    """Read a snapshot that may be the head of an append chain: the
    union of every segment back to the last full publish. Returns
    (DataFrame, list of manifests newest-first).

    The read schema is PINNED from the manifests (`_chain_merged_schema`)
    rather than inferred from file footers: on a schema-evolved chain
    (publish_append evolve="additive") pre-evolution segments come back
    with NULL for the added columns, type drift across segments fails
    loudly at plan time, and — unlike option("mergeSchema") — no footer
    merge job runs: schema resolution is O(chain) manifest reads on the
    driver.

    On a PARTITION-EVOLVED chain (publish_append partition_by=...), a
    single multi-path scan cannot plan mixed hive/flat layouts, so each
    segment gets its own scan under its own layout and the branches
    union — filters on a segment's partition key become PartitionFilters
    in that branch, flat branches keep ordinary pushdown. The flat
    single-scan fast path is preserved for unevolved chains."""
    base = base_dir.rstrip("/")
    # shallow clone: resolve to the source base at the pinned version
    base, version = _follow_shallow(spark, base, version)
    chain = _resolve_chain(spark, base, version)
    if _mor_record(chain[0]):
        # MOR head over a chain (or snapshot): resolve the physical
        # ancestor's chain, then subtract the vectors
        data_v, _ = _mor_layers(spark, base, chain[0])
        df, inner = read_version_chain(spark, base, data_v)
        return _apply_mor(spark, df, base, chain[0]), [chain[0], *inner]
    schema = _chain_merged_schema(chain)
    if any(m.get("partition_by") for m in chain) or _chain_evolved(chain):
        aliases = _chain_aliases(chain)
        return (
            _union_all(
                [
                    _segment_read(
                        spark, base, m, schema,
                        aliases=aliases[m["version"]],
                    )
                    for m in chain
                ]
            ),
            chain,
        )
    paths = [f"{base}/v={m['version']}" for m in chain]
    return spark.read.schema(schema).parquet(*paths), chain


def read_chain_pruned(
    spark: SparkSession,
    base_dir: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
):
    """Data-skipping read over an append chain: min-max pruning applied
    to every segment's file_stats (a segment without stats contributes
    all its files, conservatively). Returns (DataFrame, n_files_total,
    n_files_read) — the chain-wide generalization of
    `read_version_pruned`.

    Partition-evolved segments skip by DIRECTORY instead: when `col` is
    the segment's partition key, `col=value` directory names are pruned
    against [lo, hi] on the driver (the hive analogue of footer min-max;
    same accounting in the returned file counts), and other columns fall
    back to reading the whole segment with the filter pushed down."""
    base = base_dir.rstrip("/")
    base, version = _follow_shallow(spark, base, version)
    chain = _resolve_chain(spark, base, version)
    if _mor_record(chain[0]):
        # pruned read through a MOR head: prune the physical chain,
        # then subtract the vectors (deletes only narrow true ranges,
        # so every skip decision stays conservative)
        data_v, _ = _mor_layers(spark, base, chain[0])
        df, total, n_read = read_chain_pruned(
            spark, base, col, lo, hi, version=data_v
        )
        return _apply_mor(spark, df, base, chain[0]), total, n_read
    schema = _chain_merged_schema(chain)
    aliases = _chain_aliases(chain)
    evolved = _chain_evolved(chain)
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    paths = []
    branches = []
    total = 0
    n_read = 0
    for m in chain:
        vdir = f"{base}/v={m['version']}"
        # pruning metadata (file stats, partition dirs, indexes) was
        # written under the column's SEGMENT-LOCAL name — translate
        # through the rename map so old stats keep skipping
        seg_col = aliases[m["version"]].get(col, col)
        pb = m.get("partition_by") or []
        if len(pb) > 1:
            # multi-level hive spec (publish_versioned allows it): the
            # single-level dir accounting below would under-count —
            # read the whole segment conservatively
            n = _count_parquet_recursive(spark, vdir)
            total += n
            n_read += n
            branches.append(
                _segment_read(
                    spark, base, m, schema,
                    aliases=aliases[m["version"]],
                )
            )
            continue
        if pb:
            dirs = _partition_dirs(spark, vdir, pb[0])
            total += sum(n for _, _, n in dirs)
            pt = m.get("partition_transform")
            if (
                pt
                and pt["source"] == seg_col
                and pt["kind"] in _TRANSFORM_RANGE_KINDS
            ):
                # hidden partitioning: translate the RAW-column range
                # through the (monotone) transform into partition-value
                # bounds — the reader never names the derived column
                plo, phi = _transform_bounds(pt, lo, hi)
                keep = [
                    (d, n)
                    for d, v, n in dirs
                    if _pv_in_range(v, plo, phi)
                ]
            elif seg_col == pb[0]:
                keep = [
                    (d, n)
                    for d, v, n in dirs
                    if _pv_in_range(v, lo, hi)
                ]
            else:
                keep = [(d, n) for d, _, n in dirs]
            n_read += sum(n for _, n in keep)
            if keep:
                branches.append(
                    _segment_read(
                        spark, base, m, schema,
                        sub_paths=[f"{vdir}/{d}" for d, _ in keep],
                        aliases=aliases[m["version"]],
                    )
                )
            continue
        fs = m.get("file_stats")
        if not fs or seg_col not in fs["columns"]:
            seg_files = [
                f"{vdir}/{name}"
                for name in lakefs_list_parquet(spark, vdir)
            ]
            total += len(seg_files)
            kept = seg_files
        else:
            total += len(fs["files"])
            kept = []
            for f in fs["files"]:
                fmin = f["min"].get(seg_col)
                fmax = f["max"].get(seg_col)
                if (
                    fmin is None
                    or fmax is None
                    or (fmax >= lo and fmin <= hi)
                ):
                    kept.append(f"{vdir}/{f['name']}")
        if evolved:
            # renamed/widened chains cannot share one flat scan — the
            # merged schema's names/types would misread old files
            n_read += len(kept)
            if kept:
                branches.append(
                    _segment_read(
                        spark, base, m, schema, sub_paths=kept,
                        aliases=aliases[m["version"]],
                    )
                )
        else:
            paths.extend(kept)
    n_read += len(paths)
    if paths:
        flat = spark.read.schema(schema).parquet(*paths)
        branches.insert(0, flat)
    if not branches:
        df, _ = read_version_chain(spark, base_dir, version)
        return df.filter(F.lit(False)), total, 0
    return _union_all(branches).filter(pred), total, n_read


def read_bucket_lookup(
    spark: SparkSession,
    base_dir: str,
    col: str,
    value,
    version: int | None = None,
):
    """Point lookup through HIDDEN bucket partitioning: a segment
    published with partition_transform {"kind": "bucket", "n": N} on
    `col` stores each row under `_hp_bucket_col=hash(col) % N` — the
    lookup recomputes the bucket for `value` (same JVM xxhash64, cast to
    the segment's column type, so widening evolution can't skew it) and
    reads exactly ONE of N directories. Chain-aware: transform segments
    prune to their bucket, other segments read whole with the filter
    pushed down (conservative). Returns (DataFrame, n_files_total,
    n_files_read) — the same accounting contract as read_point_lookup,
    but needing no secondary index build: the layout IS the index.

    At 100 TB with N=1024 the lookup touches 0.1% of the data before
    any row filter runs, for free at publish time — the hash-layout
    counterpart of footer-stats pruning (ranges) and file indexes
    (arbitrary point columns)."""
    base = base_dir.rstrip("/")
    chain = _resolve_chain(spark, base, version)
    if _mor_record(chain[0]):
        data_v, _ = _mor_layers(spark, base, chain[0])
        df, total, n_read = read_bucket_lookup(
            spark, base_dir, col, value, version=data_v
        )
        return _apply_mor(spark, df, base, chain[0]), total, n_read
    schema = _chain_merged_schema(chain)
    aliases = _chain_aliases(chain)
    branches = []
    total = 0
    n_read = 0
    for m in chain:
        vdir = f"{base}/v={m['version']}"
        seg_col = aliases[m["version"]].get(col, col)
        pt = m.get("partition_transform")
        pb = m.get("partition_by") or []
        if pt and pt["kind"] == "bucket" and pt["source"] == seg_col:
            dirs = _partition_dirs(spark, vdir, pb[0])
            total += sum(n for _, _, n in dirs)
            dtype = _manifest_schema(m)[seg_col].dataType
            bucket = (
                spark.range(1)
                .select(
                    F.pmod(
                        F.xxhash64(F.lit(value).cast(dtype)),
                        F.lit(int(pt["n"])),
                    ).cast("int").alias("b")
                )
                .collect()[0]["b"]
            )
            keep = [(d, n) for d, v, n in dirs if _pv_eq(d, v, bucket)]
            n_read += sum(n for _, n in keep)
            if keep:
                branches.append(
                    _segment_read(
                        spark, base, m, schema,
                        sub_paths=[f"{vdir}/{d}" for d, _ in keep],
                        aliases=aliases[m["version"]],
                    )
                )
            continue
        n = _count_parquet_recursive(spark, vdir)
        total += n
        n_read += n
        branches.append(
            _segment_read(
                spark, base, m, schema, aliases=aliases[m["version"]],
            )
        )
    pred = F.col(col) == F.lit(value)
    if not branches:
        df, _ = read_version_chain(spark, base_dir, version)
        return df.filter(F.lit(False)), total, 0
    return _union_all(branches).filter(pred), total, n_read


def lakefs_list_parquet(spark: SparkSession, vdir: str) -> list[str]:
    """Data files of one version directory (underscore control files
    excluded), via the Hadoop FS API."""
    from .sources import lakefs

    return sorted(
        n
        for n in lakefs.listdir(spark, vdir)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


def vacuum_versions(
    spark: SparkSession,
    base_dir: str,
    keep_last: int = 2,
    keep_since: str | None = None,
) -> list[int]:
    """Retention for the versioned lake: delete all but the newest
    `keep_last` versions, never the one LATEST points to (a pinned-older
    LATEST — e.g. after a rollback — is protected even if it falls
    outside the keep window). Returns the deleted version numbers.

    `keep_since` adds TIME-BASED retention (the production policy —
    "keep 7 days of time travel"): every version whose manifest
    `published_ts` is >= the given ISO-8601 UTC timestamp is also kept,
    as is any version without a readable timestamp (conservative). The
    two policies compose as a union; the CALLER computes the cutoff
    from its own clock, so retention decisions are reproducible and
    testable.

    Deletion order is oldest-first and the LATEST pointer is never
    touched, so a crash mid-vacuum leaves a smaller but fully consistent
    store — every surviving version is complete, LATEST still resolves.
    All I/O via the Hadoop FileSystem API (object-store safe)."""
    import json as _ts_json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    versions = sorted(
        int(name.split("=")[1])
        for name in lakefs.listdir(spark, base)
        if name.startswith("v=") and name.split("=")[1].isdigit()
    )
    pinned = None
    if lakefs.exists(spark, f"{base}/LATEST"):
        pinned = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    if pinned is not None:
        keep.add(pinned)
    if keep_since is not None:
        for v in versions:
            try:
                m = _ts_json.loads(
                    lakefs.read_text(spark, f"{base}/v={v}/_manifest.json")
                )
                ts = m.get("published_ts")
            except Exception:
                ts = None
            if ts is None or ts >= keep_since:
                keep.add(v)
    # an un-promoted WAP candidate is live state, not garbage — only
    # abort_staged (or re-staging, which orphans it) may release it
    if lakefs.exists(spark, f"{base}/STAGED"):
        keep.add(int(lakefs.read_text(spark, f"{base}/STAGED").strip()))
    # named branch heads are live state too (their ancestors follow via
    # the worklist expansion below); delete_branch releases them
    for name in lakefs.listdir(spark, base):
        if name.startswith("BRANCH_"):
            keep.add(int(lakefs.read_text(spark, f"{base}/{name}").strip()))
    # versions pinned by live SHALLOW-clone refs (the _refs ledger) are
    # read dependencies of other datasets — reclaiming them would break
    # every clone mid-read; release_shallow_clone frees them
    keep |= _ref_pinned_versions(spark, base)
    # append chains: a kept head needs every ancestor segment back to
    # its full snapshot — expand the keep set over parent links so
    # vacuum never orphans a chain (read_version_chain of any keeper
    # stays resolvable). MOR delete layers likewise keep the ancestor
    # that physically wrote their data files (and every intermediate
    # layer, whose delete vectors the resolution still reads). A MOR
    # parent can itself be an append head (vector over a chain), so the
    # expansion is a WORKLIST over both link kinds, not one pass.
    import json as _json

    todo = list(keep)
    seen: set[int] = set()
    while todo:
        v = todo.pop()
        if v in seen:
            continue
        seen.add(v)
        for m in _resolve_chain(spark, base, v):
            keep.add(m["version"])
            if _mor_record(m):
                pv = int(_mor_record(m)["parent"])
                keep.add(pv)
                if pv not in seen:
                    todo.append(pv)
    deleted = []
    for v in versions:
        if v not in keep:
            lakefs.delete(spark, f"{base}/v={v}")
            deleted.append(v)
    return deleted


def read_version(spark: SparkSession, base_dir: str, version: int | None = None):
    """Read a pinned dataset version, or LATEST when version is None.
    Returns (DataFrame, manifest dict). A merge-on-read version
    (delete_rows_mor) resolves transparently: the scan targets the
    ancestor that physically wrote the data files, minus every MOR
    layer's keys (broadcast anti joins)."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    base, version = _follow_shallow(spark, base, version)
    if version is None:
        version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    out = f"{base}/v={version}"
    manifest = json.loads(lakefs.read_text(spark, f"{out}/_manifest.json"))
    if _mor_record(manifest):
        data_v, _ = _mor_layers(spark, base, manifest)
        dm = json.loads(
            lakefs.read_text(spark, f"{base}/v={data_v}/_manifest.json")
        )
        if dm.get("append"):
            # vector over an append chain: resolve the chain, then
            # subtract — read_version_chain handles evolution branches
            df, _ = read_version_chain(spark, base, data_v)
        else:
            df = spark.read.parquet(f"{base}/v={data_v}")
            if dm.get("partition_transform"):
                df = df.drop(dm["partition_transform"]["col"])
        return _apply_mor(spark, df, base, manifest), manifest
    df = spark.read.parquet(out)
    if manifest.get("partition_transform"):
        # hidden partitioning: the derived layout column is format
        # metadata, never part of the table the reader sees
        df = df.drop(manifest["partition_transform"]["col"])
    return df, manifest


def read_version_pruned(
    spark: SparkSession,
    base_dir: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
):
    """Data-skipping read: like `read_version`, but uses the manifest's
    per-file min/max (`publish_versioned(stats_cols=...)`) to SKIP files
    whose [min, max] range cannot intersect [lo, hi] before any task is
    scheduled. The surviving files still get the row-level filter (file
    stats only bound, they don't select), so the result is exactly
    `read_version(...).filter(lo <= col <= hi)`.

    Returns (DataFrame, n_files_total, n_files_read). Pruning compares
    in the manifest's serialized domain: numerics natively, dates and
    timestamps as ISO strings (lexicographic == chronological), so pass
    `lo`/`hi` in that same form. Files with missing stats are kept
    (never silently dropped — same conservative rule as Iceberg).

    At 100 TB: the manifest is O(files) JSON on the control plane;
    pruning is a driver-side list comprehension, and the scan that
    follows reads only surviving files — for a range-clustered layout
    (repartitionByRange or Z-order before publish) that is the
    difference between touching 10^5 files and touching the handful
    that overlap the query window."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    if version is None:
        version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    out = f"{base}/v={version}"
    manifest = json.loads(lakefs.read_text(spark, f"{out}/_manifest.json"))
    fs = manifest.get("file_stats")
    if not fs or col not in fs["columns"]:
        raise ValueError(
            f"no file_stats for column {col!r} in version {version} — "
            "publish with stats_cols to enable data skipping"
        )
    # MOR layer: data files live in the writing ancestor; the carried
    # file_stats stay valid (deletes only narrow the true ranges) and
    # the delete vectors apply after the pruned scan
    data_dir = out
    if _mor_record(manifest):
        data_v, _ = _mor_layers(spark, base, manifest)
        data_dir = f"{base}/v={data_v}"
    files = fs["files"]
    survivors = []
    for f in files:
        fmin = f["min"].get(col)
        fmax = f["max"].get(col)
        if fmin is None or fmax is None:
            survivors.append(f)  # unknown range: must read
        elif fmax >= lo and fmin <= hi:
            survivors.append(f)
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if not survivors:
        df = spark.read.parquet(data_dir).filter(F.lit(False))
    else:
        df = spark.read.parquet(
            *[f"{data_dir}/{f['name']}" for f in survivors]
        ).filter(pred)
    if _mor_record(manifest):
        df = _apply_mor(spark, df, base, manifest)
    return df, len(files), len(survivors)


def read_as_of(spark: SparkSession, base_dir: str, ts: str):
    """Time travel: read the newest version whose manifest `published_ts`
    is <= `ts` (ISO-8601 UTC strings compare lexicographically, which is
    why publish stamps that format). Returns (DataFrame, manifest).

    Resolution is an O(versions) manifest scan — control-plane metadata,
    a few KB per version, never data files; the same walk an Iceberg
    snapshot-as-of-timestamp lookup does over its metadata log. Versions
    deleted by vacuum_versions no longer resolve: time travel reaches
    only retained history, and callers pinning training runs should pin
    the version NUMBER (reproducible forever via keep-list) rather than
    a timestamp. Raises LookupError when `ts` predates all retained
    versions — never silently serves a newer dataset.

    CHAIN-AWARE: when the resolved version is an append segment, the
    returned DataFrame is the full chain snapshot AT that version
    (read_version_chain), not the segment's delta alone — so append
    chains and schema/partition evolution all time-travel correctly.
    The returned manifest is the resolved head segment's."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    best: tuple[str, int] | None = None
    for name in lakefs.listdir(spark, base):
        if not (name.startswith("v=") and name.split("=")[1].isdigit()):
            continue
        v = int(name.split("=")[1])
        m = json.loads(lakefs.read_text(spark, f"{base}/v={v}/_manifest.json"))
        pts = m.get("published_ts")
        if pts is not None and pts <= ts and (best is None or (pts, v) > best):
            best = (pts, v)
    if best is None:
        raise LookupError(
            f"no version of {base_dir} published at or before {ts!r}"
        )
    df, chain = read_version_chain(spark, base_dir, version=best[1])
    return df, chain[0]


def update_rows_cow(
    spark: SparkSession,
    base_dir: str,
    col: str,
    values: list,
    assignments: dict,
) -> tuple[int, int, int]:
    """Surgical row UPDATE via copy-on-write — the anonymize-in-place
    half of the GDPR pair (delete_rows_cow is the erasure half, same
    targeting machinery): rows whose `col` is in `values` get each
    assignment column replaced by its expression; only files that can
    contain matches are rewritten, the rest byte-copy. Assignment
    expressions may reference the row's own columns (e.g.
    {"user_id": F.lit(-1), "value": F.round("value", 0)}).

    Returns (new_version, n_files_rewritten, n_files_copied)."""
    return _rewrite_rows_cow(
        spark, base_dir, col, values, assignments=assignments
    )


def delete_rows_cow(
    spark: SparkSession,
    base_dir: str,
    col: str,
    values: list,
) -> tuple[int, int, int]:
    """Surgical row deletion (the GDPR / right-to-be-forgotten path) via
    COPY-ON-WRITE: only the files that can CONTAIN the doomed keys are
    decoded, filtered, and rewritten; every other file is byte-copied
    into the new version untouched (Hadoop FileUtil copy — no
    decode/re-encode, no shuffle). File targeting prefers the exact
    secondary file index (`build_file_index`) when `col` is indexed,
    else falls back to manifest min-max file stats, else conservatively
    rewrites everything. The result is a NEW version with a manifest
    `deleted` record and an atomic LATEST flip — prior versions keep the
    rows (time travel is the retention ledger until vacuum reclaims
    them; run vacuum_versions to make the erasure physical).

    At 100 TB this is the difference between rewriting a table and
    rewriting the handful of files a user's rows live in: O(matched
    files) decode + O(files) cheap copies. Operates on FULL snapshots
    only — an append chain has no single file set to target; compact
    first (the returned error says so). A MERGE-ON-READ head (equality
    or positional vector stack) is legal: the stack is folded and the
    delete applied in ONE fused rewrite commit (compaction-marked, so
    stream subscribers are not re-flooded) — one table rewrite instead
    of materialize_mor followed by a second COW pass.

    Returns (new_version, n_files_rewritten, n_files_copied)."""
    return _rewrite_rows_cow(spark, base_dir, col, values, assignments=None)


def _rewrite_rows_cow(
    spark: SparkSession,
    base_dir: str,
    col: str,
    values: list,
    assignments: dict | None,
) -> tuple[int, int, int]:
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    src = f"{base}/v={version}"
    manifest = json.loads(lakefs.read_text(spark, f"{src}/_manifest.json"))
    if manifest.get("append"):
        raise ValueError(
            f"v={version} at {base} is an append-chain head — compact_chain "
            "first so the delete has one file set to target"
        )
    if _mor_record(manifest):
        # COW over a MOR head: the vector commit holds no files of its
        # own, so a surgical per-file rewrite has nothing to target —
        # instead FOLD the whole stack and apply the mutation in one
        # rewrite commit (materialize_mor + the delete/update fused, so
        # the caller pays one table rewrite, not two). The commit is
        # compaction-marked: its rows were already emitted to stream
        # subscribers as the segments the stack resolved to, so the
        # lake streaming source must not re-flood on it.
        resolved, _ = read_version(spark, base_dir)
        vals = set(values)
        if assignments is None:
            out_df = resolved.filter(~F.col(col).isin(list(vals)))
        else:
            hit = F.col(col).isin(list(vals))
            out_df = resolved.select(
                *[
                    F.when(hit, assignments[f.name])
                    .otherwise(F.col(f.name))
                    .cast(f.dataType)
                    .alias(f.name)
                    if f.name in assignments
                    else F.col(f.name)
                    for f in resolved.schema.fields
                ]
            )
        folded = [version]
        mm = manifest
        while _mor_record(mm):
            pv = int(_mor_record(mm)["parent"])
            folded.append(pv)
            mm = json.loads(
                lakefs.read_text(spark, f"{base}/v={pv}/_manifest.json")
            )
        record = {
            "col": col,
            "n_values": len(vals),
            "from_version": version,
            "folded_mor": True,
        }
        meta = {"compacted_from": sorted(folded)}
        if assignments is None:
            meta["deleted"] = record
        else:
            meta["updated"] = {**record, "columns": sorted(assignments)}
        stats_cols = (manifest.get("file_stats") or {}).get("columns")
        new_v = publish_versioned(
            out_df, base_dir, meta=meta, stats_cols=stats_cols
        )
        n_files = len(
            lakefs_list_parquet(spark, f"{base}/v={new_v}")
        )
        return new_v, n_files, 0
    if manifest.get("partition_by"):
        raise ValueError(
            "delete_rows_cow targets flat snapshots; compact the "
            "partitioned version first"
        )
    files = lakefs_list_parquet(spark, src)
    vals = set(values)
    targets: set[str] = set()
    if col in manifest.get("indexes", []):
        rows = (
            spark.read.parquet(f"{src}/_index_{col}")
            .filter(F.col("value").isin(list(vals)))
            .select("file")
            .collect()
        )
        targets = {r.file for r in rows}
    elif (
        manifest.get("file_stats")
        and col in manifest["file_stats"]["columns"]
    ):
        for f in manifest["file_stats"]["files"]:
            fmin = f["min"].get(col)
            fmax = f["max"].get(col)
            if fmin is None or fmax is None or any(
                fmin <= v <= fmax for v in vals
            ):
                targets.add(f["name"])
    else:
        targets = set(files)
    new_version = version + 1
    out = f"{base}/v={new_version}"
    schema = _manifest_schema(manifest)
    rewritten_rows = 0
    if targets:
        src_df = spark.read.schema(schema).parquet(
            *[f"{src}/{f}" for f in sorted(targets)]
        )
        if assignments is None:
            kept = src_df.filter(~F.col(col).isin(list(vals)))
        else:
            hit = F.col(col).isin(list(vals))
            kept = src_df.select(
                *[
                    F.when(hit, assignments[f.name])
                    .otherwise(F.col(f.name))
                    .cast(f.dataType)
                    .alias(f.name)
                    if f.name in assignments
                    else F.col(f.name)
                    for f in schema.fields
                ]
            )
        from pyspark.sql import Observation

        obs = Observation(f"rewrite_v{new_version}")
        kept.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "errorifexists"
        ).parquet(out)
        rewritten_rows = int(obs.get["n"])
    else:
        lakefs.mkdirs(spark, out)
    copied = [f for f in files if f not in targets]
    for f in copied:
        lakefs.copy(spark, f"{src}/{f}", f"{out}/{f}")
    # FRESH manifest, not a copy of the old one: inheriting published_ts
    # would make read_as_of resolve timestamps BEFORE the rewrite to the
    # post-rewrite version (ties break to the higher version), and stale
    # compacted_from / column_stats would describe data this version no
    # longer is. Only the schema carries over — it is unchanged by a
    # delete and type-preserved by an update.
    from datetime import datetime, timezone

    record = {
        "col": col,
        "n_values": len(vals),
        "from_version": version,
        "files_rewritten": len(targets),
        "files_copied": len(copied),
    }
    new_manifest = {
        "version": new_version,
        "parent": None,
        "schema": manifest["schema"],
        "published_ts": datetime.now(timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%fZ"
        ),
    }
    if "schema_json" in manifest:
        new_manifest["schema_json"] = manifest["schema_json"]
    if assignments is None:
        new_manifest["deleted"] = record
    else:
        new_manifest["updated"] = {
            **record,
            "columns": sorted(assignments),
        }
    stats_cols = (manifest.get("file_stats") or {}).get("columns")
    if stats_cols:
        stats = _footer_file_stats(spark, out, stats_cols)
        if stats is None:
            stats = _scan_file_stats(spark, out, stats_cols)
        new_manifest["file_stats"] = {"columns": stats_cols, "files": stats}
    if "rows" in manifest:
        # rows in untouched files are unchanged; re-derive the total
        new_manifest["rows"] = rewritten_rows + _count_rows_quick(
            spark, out, schema, copied
        )
    lakefs.write_text(spark, f"{out}/_manifest.json", json.dumps(new_manifest))
    lakefs.replace_text(spark, f"{base}/LATEST", str(new_version))
    return new_version, len(targets), len(copied)


def _count_rows_quick(spark, out, schema, copied_files):
    """Row count of the copied (untouched) files from parquet footers —
    metadata-only, no data scan."""
    if not copied_files:
        return 0
    return (
        spark.read.schema(schema)
        .parquet(*[f"{out}/{f}" for f in copied_files])
        .count()
    )


def publish_snapshot(
    dfs: dict[str, DataFrame],
    base_dir: str,
    meta: dict | None = None,
    partition_by: dict[str, list[str]] | None = None,
    meta_late=None,
) -> int:
    """Atomic MULTI-table publish: write every table under
    `base_dir/snap=N/<table>/`, then flip one `LATEST` pointer for the
    whole set. Readers following LATEST always see a consistent snapshot
    — mutually-consistent fact+dim tables, never fact@N joined with
    dim@N-1 (the cross-table anomaly single-table versioning can't
    prevent). A crash after any number of table writes but before the
    flip leaves LATEST on the previous snapshot; the orphaned partial
    snapshot is invisible and reclaimed by vacuum_snapshots.

    Same I/O discipline as publish_versioned: Hadoop FileSystem API
    throughout, per-table row counts via Observation (no recount jobs),
    pointer flip via write-tmp-then-atomic-rename.

    `meta_late` (a zero-arg callable returning a dict) is evaluated
    AFTER every table write and merged into the manifest: the hook for
    statistics that only exist once the write action has run — i.e.
    Observation results attached to the published DataFrames, which let
    a corpus-wide statistic ride the write instead of costing a second
    evaluation of the same plan (the publish-side twin of the
    merge_into audit-count idiom)."""
    import json

    from pyspark.sql import Observation

    from .sources import lakefs

    if not dfs:
        raise ValueError("publish_snapshot needs at least one table")
    spark = next(iter(dfs.values())).sparkSession
    lakefs.mkdirs(spark, base_dir)
    base = base_dir.rstrip("/")
    existing = [
        int(name.split("=")[1])
        for name in lakefs.listdir(spark, base)
        if name.startswith("snap=") and name.split("=")[1].isdigit()
    ]
    version = max(existing, default=0) + 1
    out = f"{base}/snap={version}"
    counts: dict[str, int] = {}
    for name, df in dfs.items():
        obs = Observation(f"snap{version}_{name}")
        w = df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "errorifexists"
        )
        # optional hive-style layout per table (e.g. ANN postings
        # partitioned by cell id so probes prune to their cells)
        cols = (partition_by or {}).get(name)
        if cols:
            w = w.partitionBy(*cols)
        w.parquet(f"{out}/{name}")
        counts[name] = int(obs.get["n"])
    manifest = {
        "snapshot": version,
        "tables": {
            name: {"rows": counts[name], "schema": df.schema.simpleString()}
            for name, df in dfs.items()
        },
        # recorded so chain compaction can republish with the same
        # physical layout without the caller re-supplying it
        **({"partitioned": partition_by} if partition_by else {}),
        **(meta or {}),
        **(meta_late() if meta_late is not None else {}),
    }
    lakefs.write_text(spark, f"{out}/_manifest.json", json.dumps(manifest))
    lakefs.replace_text(spark, f"{base}/LATEST", str(version))
    return version


def publish_snapshot_delta(
    dfs: dict[str, DataFrame],
    base_dir: str,
    meta: dict | None = None,
    partition_by: dict[str, list[str]] | None = None,
) -> int:
    """APPEND-shaped snapshot commit: publish only the DELTA tables of
    this batch and record `delta_parent` = the current LATEST, forming
    a chain the reader resolves with `read_snapshot_chain`. This is the
    O(batch) counterpart to publish_snapshot's O(all-tables) rewrite —
    the difference between re-writing a 100 TB index per streamed
    micro-batch and writing the batch's few MB (same trade the
    versioned lake's publish_append makes vs publish_versioned, lifted
    to multi-table snapshots).

    Chain rules (enforced by the reader and vacuum):
    - a delta snapshot carries a SUBSET of the full snapshot's tables;
      resolution unions each delta table down the chain and takes the
      remaining tables from the nearest FULL ancestor;
    - `vacuum_snapshots` pins every delta_parent ancestor of a kept
      snapshot — a delta is unreadable without its chain;
    - `compact_snapshot_chain` folds the chain back into one full
      snapshot when it grows long (O(chain) manifest reads per serve
      call is the cost being bounded).

    The manifest records `chain_len` (parent's + 1; a full snapshot is
    0), maintained with ONE parent-manifest read per publish — so an
    auto-compaction policy (streaming/ann_index.py `compact_every`) can
    test the chain length without walking the chain (the O(n²)-over-a-
    stream's-lifetime shape the round-11 replay-guard fix removed)."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    if not lakefs.exists(spark_of(dfs), f"{base}/LATEST"):
        raise ValueError(
            f"{base_dir} holds no published snapshot — a delta needs a "
            "full parent (publish_snapshot first)"
        )
    parent = int(
        lakefs.read_text(spark_of(dfs), f"{base}/LATEST").strip()
    )
    parent_manifest = json.loads(
        lakefs.read_text(spark_of(dfs), f"{base}/snap={parent}/_manifest.json")
    )
    return publish_snapshot(
        dfs,
        base_dir,
        meta={
            "delta_parent": parent,
            "chain_len": int(parent_manifest.get("chain_len", 0)) + 1,
            **(meta or {}),
        },
        partition_by=partition_by,
    )


def spark_of(dfs: dict[str, DataFrame]):
    """The SparkSession behind a non-empty {name: DataFrame} dict."""
    if not dfs:
        raise ValueError("need at least one table")
    return next(iter(dfs.values())).sparkSession


def read_snapshot_chain(
    spark: SparkSession, base_dir: str, version: int | None = None
):
    """Read a snapshot RESOLVING its delta chain: returns
    ({table: DataFrame}, head_manifest). Tables present in delta
    snapshots union down the chain (head first — order is irrelevant to
    the union) until the nearest full ancestor supplies every remaining
    table. A plain full snapshot resolves to itself, so this is a
    drop-in superset of read_snapshot for any consumer that must accept
    both layouts. Partition-pruning survives resolution: the union is a
    union of parquet scans, each of which prunes on its own hive
    partitions."""
    tables, head = read_snapshot(spark, base_dir, version)
    cur_tables, cur_manifest = tables, head
    resolved = dict(tables)
    seen = {int(head["snapshot"])}
    while cur_manifest.get("delta_parent") is not None:
        parent = int(cur_manifest["delta_parent"])
        if parent in seen:
            raise ValueError(
                f"snapshot delta chain at {base_dir} has a cycle at "
                f"v={parent}"
            )
        seen.add(parent)
        cur_tables, cur_manifest = read_snapshot(spark, base_dir, parent)
        for name, df in cur_tables.items():
            if name in resolved:
                resolved[name] = resolved[name].unionByName(df)
            else:
                resolved[name] = df
    return resolved, head


def compact_snapshot_chain(
    spark: SparkSession, base_dir: str, meta: dict | None = None
) -> int:
    """Fold the LATEST delta chain into one FULL snapshot: chain-
    resolved tables republished under the layout recorded in the
    manifests (`partitioned`), after which the old chain is vacuumable
    and readers pay zero chain walks. The compaction analogue of
    compact_chain for the versioned lake."""
    tables, head = read_snapshot_chain(spark, base_dir)
    # layout + format flags come from the manifests: the head's meta
    # minus chain bookkeeping, layout from the nearest recorded one
    carried = {
        k: v
        for k, v in head.items()
        if k not in ("snapshot", "tables", "delta_parent", "chain_len",
                     "partitioned", "appended", "batch_id", "checkpoint_id")
    }
    part = head.get("partitioned")
    if part is None:
        cur = head
        while cur.get("delta_parent") is not None and part is None:
            _, cur = read_snapshot(spark, base_dir, int(cur["delta_parent"]))
            part = cur.get("partitioned")
    return publish_snapshot(
        tables,
        base_dir,
        meta={**carried, "compacted_chain": True, **(meta or {})},
        partition_by=part,
    )


def read_snapshot(
    spark: SparkSession, base_dir: str, version: int | None = None
):
    """Read a full snapshot (or LATEST): returns ({table: DataFrame},
    manifest). Every returned table is from the SAME snapshot."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    if version is None:
        version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    out = f"{base}/snap={version}"
    manifest = json.loads(lakefs.read_text(spark, f"{out}/_manifest.json"))
    tables = {
        name: spark.read.parquet(f"{out}/{name}")
        for name in manifest["tables"]
    }
    return tables, manifest


def vacuum_snapshots(
    spark: SparkSession, base_dir: str, keep_last: int = 2
) -> list[int]:
    """Reclaim old and orphaned (crash-abandoned, never-pointed-to)
    snapshots; same retention + LATEST-pin rules as vacuum_versions.
    Delta chains (publish_snapshot_delta): every `delta_parent`
    ancestor of a kept snapshot is kept too — a delta is unreadable
    without its chain, so retention counts CHAINS, not snapshots."""
    import json as _json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    versions = sorted(
        int(name.split("=")[1])
        for name in lakefs.listdir(spark, base)
        if name.startswith("snap=") and name.split("=")[1].isdigit()
    )
    pinned = None
    if lakefs.exists(spark, f"{base}/LATEST"):
        pinned = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    if pinned is not None:
        keep.add(pinned)
    # expand: walk delta_parent chains out of every kept snapshot
    todo = list(keep)
    while todo:
        v = todo.pop()
        mpath = f"{base}/snap={v}/_manifest.json"
        if not lakefs.exists(spark, mpath):
            continue  # crash-orphaned partial snapshot
        m = _json.loads(lakefs.read_text(spark, mpath))
        parent = m.get("delta_parent")
        if parent is not None and int(parent) not in keep:
            keep.add(int(parent))
            todo.append(int(parent))
    deleted = []
    for v in versions:
        if v not in keep:
            lakefs.delete(spark, f"{base}/snap={v}")
            deleted.append(v)
    return deleted


def merge_rows(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Row-level MERGE semantics (the MERGE INTO shape, as a pure
    transformation over immutable inputs):

    - matched keys        → the update row replaces the target row
    - unmatched updates   → inserted
    - keys in `deletes`   → removed (whether or not also updated)

    Composition: target ▷anti updates ▷anti deletes ∪ (updates ▷anti
    deletes). Every leg is a key-equi anti join: with a CDC-sized update
    batch both anti joins broadcast, so the full target never shuffles —
    feed the result to `upsert_by_partition` (or dynamic partition
    overwrite) to make the rewrite proportional to touched partitions
    rather than the table. Updates must be key-unique (CDC compaction:
    keep the latest image per key BEFORE merging — one row_number pass).

    Deterministic and format-agnostic: no table-format dependency, works
    on anything a DataFrame can read; snapshot isolation comes from the
    staged-write publish in `publish_versioned`/`publish_snapshot`."""
    from pyspark.sql import functions as F2

    upd = F2.broadcast(updates.select(*key_cols).distinct())
    kept = target.join(upd, key_cols, "left_anti")
    merged = kept.unionByName(updates)
    if deletes is not None:
        dels = F2.broadcast(deletes.select(*key_cols).distinct())
        merged = merged.join(dels, key_cols, "left_anti")
    return merged


def merge_into(
    spark: SparkSession,
    base_dir: str,
    source: DataFrame,
    key_cols: list[str],
    *,
    when_matched_update: dict[str, str] | None = None,
    when_matched_update_cond: str | None = None,
    when_matched_delete_cond: str | None = None,
    when_not_matched_insert: bool = True,
    when_not_matched_cond: str | None = None,
    **publish_kwargs,
) -> tuple[int, dict]:
    """Conditional MERGE INTO against the versioned lake — the full
    Delta/Iceberg clause vocabulary as one verb:

    - WHEN MATCHED AND <when_matched_delete_cond> THEN DELETE
    - WHEN MATCHED AND <when_matched_update_cond> THEN UPDATE SET
      <when_matched_update> (dict of target column -> SQL expression;
      expressions reference `t.<col>` and `s.<col>`)
    - WHEN NOT MATCHED AND <when_not_matched_cond> THEN INSERT *
      (gated by `when_not_matched_insert`)

    Clause order is the SQL standard's: the delete condition is
    evaluated before the update condition; a matched row satisfying
    neither stays unchanged; an unmatched source row failing the
    insert condition is discarded. Conditions are SQL strings over the
    aliases `t` (target) and `s` (source), so e.g.
    ``when_matched_update_cond="s.o_totalprice > t.o_totalprice"``.

    Ambiguity guard: a target row matching MULTIPLE source rows makes
    the result order-dependent, so (like Delta) the merge refuses if
    the source carries duplicate keys — one aggregate, checked before
    any write.

    Cost class: this verb RESOLVES the current table state (full
    snapshot, MOR stack, or append chain) and publishes the merged
    result as a new full-snapshot version — O(table) write, the
    snapshot-rewrite cost class (SCALE.md). Its value is the exact
    clause semantics; when the mutation is small, prefer the O(keys) /
    O(partition) verbs that already exist: delete_rows_mor /
    update_rows_cow / upsert_by_partition / the CDC apply stream.
    Stream subscribers should follow rewrites through the change feed
    (`lake_change_feed`), not the append stream — an append-only
    stream cannot express updates (same contract as the COW paths).

    Returns (new_version, counts) with counts =
    {"updated": n, "deleted": n, "inserted": n, "kept": n}."""
    import json as _json

    from functools import reduce as _reduce

    from .sources import lakefs

    base = base_dir.rstrip("/")
    head_v = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    head_m = _json.loads(
        lakefs.read_text(spark, f"{base}/v={head_v}/_manifest.json")
    )
    if head_m.get("append"):
        target, _ = read_version_chain(spark, base, head_v)
    else:
        target, _ = read_version(spark, base, head_v)
    if sorted(source.columns) != sorted(target.columns):
        raise ValueError(
            "merge_into requires the source schema to match the target "
            f"({sorted(target.columns)}); got {sorted(source.columns)} — "
            "project/rename first (INSERT * semantics)"
        )
    dup = (
        source.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "merge_into source has duplicate keys on "
            f"{key_cols} — the matched-clause result would be "
            "order-dependent; compact the source to one row per key "
            "first (latest-image row_number, as in the CDC apply path)"
        )
    t = target.withColumn("__t", F.lit(1)).alias("t")
    s = source.withColumn("__s", F.lit(1)).alias("s")
    on = _reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols],
    )
    j = t.join(s, on, "full_outer")
    is_m = F.col("__t").isNotNull() & F.col("__s").isNotNull()
    del_c = (
        F.expr(when_matched_delete_cond)
        if when_matched_delete_cond
        else F.lit(False)
    )
    upd_c = (
        F.expr(when_matched_update_cond)
        if when_matched_update_cond
        else F.lit(True)
    ) & F.lit(when_matched_update is not None)
    ins_c = (
        F.expr(when_not_matched_cond)
        if when_not_matched_cond
        else F.lit(True)
    ) & F.lit(when_not_matched_insert)
    action = (
        F.when(is_m & del_c, F.lit("D"))
        .when(is_m & upd_c, F.lit("U"))
        .when(is_m, F.lit("K"))
        .when(F.col("__s").isNotNull() & ins_c, F.lit("I"))
        .when(F.col("__s").isNotNull(), F.lit("X"))
        .otherwise(F.lit("K"))
    )
    assignments = when_matched_update or {}
    out_cols = []
    for f in target.schema.fields:
        c = f.name
        if c == "__t":
            continue
        upd_expr = (
            F.expr(assignments[c]) if c in assignments else F.col(f"t.{c}")
        )
        out_cols.append(
            F.when(F.col("__action") == "U", upd_expr)
            .when(F.col("__action") == "I", F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .cast(f.dataType)
            .alias(c)
        )
    acted = j.withColumn("__action", action)
    # The audit counts ride the WRITE job via Observation, so the
    # full-outer merge join is evaluated exactly ONCE (round-9 verdict:
    # a groupBy().collect() pre-pass re-evaluated the un-persisted join
    # a second time inside publish_versioned — doubling the O(table)
    # cost of every MERGE, the verb where it hurts most). CollectMetrics
    # is a pushdown barrier, so the downstream D/X filter cannot reach
    # below the metrics node and skew the counts (pinned in
    # tests/test_merge_into.py). The counts are only known after the
    # write, so the manifest carries the merge PROVENANCE
    # (from_version, keys); the full count audit is in the return value.
    from pyspark.sql import Observation

    obs = Observation(f"merge_v{head_v}")
    acted = acted.observe(
        obs,
        *[
            F.sum(
                F.when(F.col("__action") == code, 1).otherwise(0)
            ).alias(name)
            for code, name in (
                ("U", "updated"),
                ("D", "deleted"),
                ("I", "inserted"),
                ("K", "kept"),
            )
        ],
    )
    merged = acted.filter(~F.col("__action").isin("D", "X")).select(
        *out_cols
    )
    meta = dict(publish_kwargs.pop("meta", None) or {})
    meta["merge"] = {"from_version": head_v, "keys": list(key_cols)}
    new_v = publish_versioned(merged, base_dir, meta=meta, **publish_kwargs)
    by_action = obs.get
    return new_v, {
        "updated": int(by_action["updated"]),
        "deleted": int(by_action["deleted"]),
        "inserted": int(by_action["inserted"]),
        "kept": int(by_action["kept"]),
    }


def diff_snapshots(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Snapshot reconciliation: classify every key as `insert` (only in
    new), `delete` (only in old), or `update` (in both with any changed
    value) — the table-diff a versioned lake needs for CDC backfill
    validation, replication checks, and "what changed between v3 and
    v7" audits. Returns key_cols + `op`; unchanged rows are dropped.

    Shape: both sides reduce to (keys, xxhash64(all compared columns))
    BEFORE the join, so the full-outer join shuffles 8-byte digests +
    keys, never row payloads — at 100 TB the exchange carries a few
    percent of the table width. Columns are compared on the sorted
    intersection of the two schemas (minus keys), so a schema-evolved
    new version diffs cleanly against an old one: added/dropped columns
    don't spuriously mark every row updated; their rollout is visible in
    the manifests' schema field instead.

    Nulls: xxhash64 folds column VALUES including nulls positionally, so
    null→value transitions hash as changes (fold starts from a seed, and
    xxhash64 in Spark skips null args — guard by coalescing each column
    with a type-tagged sentinel string first)."""
    common = sorted(
        (set(old.columns) & set(new.columns)) - set(key_cols)
    )

    def digest(df: DataFrame) -> DataFrame:
        cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in common
        ] or [F.lit(0)]  # key-only table: presence itself is the value
        return df.select(
            *key_cols, F.xxhash64(*cols).alias("_digest")
        )

    o = digest(old).withColumnRenamed("_digest", "_old_digest")
    n = digest(new).withColumnRenamed("_digest", "_new_digest")
    joined = o.join(n, key_cols, "full_outer")
    op = (
        F.when(F.col("_old_digest").isNull(), F.lit("insert"))
        .when(F.col("_new_digest").isNull(), F.lit("delete"))
        .when(
            F.col("_old_digest") != F.col("_new_digest"), F.lit("update")
        )
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*key_cols, "op")
    )


def diff_versions(
    spark: SparkSession,
    base_dir: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """diff_snapshots over two pinned versions of a versioned-lake
    dataset (see publish_versioned / read_version)."""
    old, _ = read_version(spark, base_dir, v_old)
    new, _ = read_version(spark, base_dir, v_new)
    return diff_snapshots(old, new, key_cols)


# --- merge-on-read deletes (deletion vectors) -------------------------------


def delete_rows_mor(
    spark: SparkSession, base_dir: str, col: str, values: list
) -> tuple[int, int]:
    """Row deletion via MERGE-ON-READ deletion vectors — the
    write-optimized complement of `delete_rows_cow`: the commit writes
    ONLY the doomed key set (`_deletes.parquet` in the new version
    directory) and a manifest pointing at the parent's untouched data
    files; readers subtract the keys with an anti join at plan time.
    Deleting k rows from a 100 TB snapshot costs O(k) — no data file is
    decoded, copied, or rewritten — at the price of one broadcast anti
    join per MOR layer on every read (the Delta deletion-vector /
    Iceberg equality-delete trade). Layers STACK (a MOR delete on top
    of a MOR delete); `materialize_mor` folds the stack back into a
    physical full snapshot when read cost outweighs write savings.

    Carried metadata: `file_stats` stay valid (a delete only narrows
    the true min/max, so pruning bounds remain conservative) and
    `read_version_pruned` keeps skipping; per-file secondary INDEXES
    are NOT carried — a point lookup through an index could resurface
    deleted rows (read through read_version / read_version_pruned,
    which apply the vectors; or materialize).

    Legal targets: full snapshots, MOR layers, hidden-partitioned
    (transform) heads, AND append-chain heads — for a chain the vector
    applies to the RESOLVED chain (readers subtract the keys after the
    chain union), so keys can be deleted from a growing chain without
    forcing a compaction first. Only a RAW-hive-partitioned head is
    refused (compact it first); the flat-snapshot restriction belongs
    to POSITIONAL deletes, which need a stable (file, pos) address
    space (see `delete_rows_pos`). Returns (new_version,
    n_rows_deleted) where the count is measured against the RESOLVED
    parent (already-deleted keys count zero)."""
    _refuse_shallow_write(spark, base_dir, "delete_rows_mor")
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    parent_v = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    pm = json.loads(
        lakefs.read_text(spark, f"{base}/v={parent_v}/_manifest.json")
    )
    if not values:
        raise ValueError(
            "delete_rows_mor needs at least one key — an empty vector "
            "commit would be a no-op version"
        )
    if pm.get("partition_by") and not pm.get("partition_transform"):
        raise ValueError(
            "delete_rows_mor targets flat snapshots; compact the "
            "partitioned version first"
        )
    # a hidden-partitioned (transform) head IS a legal target: its
    # layout column is format metadata, resolution reads through
    # read_version/read_version_chain which plan the hive dirs and
    # drop the derived column before the vector subtraction
    # an append-chain head is a legal target: the vector then applies
    # to the RESOLVED chain (readers subtract it after the chain union)
    # — deleting from a growing chain without forcing a compaction
    if pm.get("append"):
        parent_df, _ = read_version_chain(spark, base, parent_v)
    else:
        parent_df, _ = read_version(spark, base, parent_v)
    counts = parent_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(col).isin(list(values)).cast("long")).alias("d"),
    ).head()
    parent_rows, n_deleted = int(counts["n"]), int(counts["d"] or 0)
    version = parent_v + 1
    out = f"{base}/v={version}"
    keys = spark.createDataFrame(
        [(v,) for v in values],
        schema=parent_df.select(F.col(col).alias("value")).schema,
    )
    keys.coalesce(1).write.mode("errorifexists").parquet(f"{out}/_deletes")
    from datetime import datetime, timezone

    manifest = {
        "version": version,
        "rows": parent_rows - n_deleted,
        "schema": pm["schema"],
        "schema_json": pm["schema_json"],
        # stamped NOW, not inherited: read_as_of must resolve a
        # pre-delete timestamp to the PARENT (rows still present), and
        # a post-delete one to this vector
        "published_ts": datetime.now(timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%fZ"
        ),
        "mor_delete": {
            "col": col,
            "parent": parent_v,
            "n_keys": len(values),
            "n_rows_deleted": n_deleted,
        },
        # data files live in the ancestor that actually wrote them
        "data_version": pm.get("data_version", parent_v),
    }
    if pm.get("file_stats") and not pm.get("append"):
        manifest["file_stats"] = pm["file_stats"]
    lakefs.write_text(spark, f"{out}/_manifest.json", json.dumps(manifest))
    lakefs.replace_text(spark, f"{base}/LATEST", str(version))
    return version, n_deleted


def _pos_parent_scan(spark, base: str):
    """(parent_version, parent_manifest, addressed_df) for a positional
    delete: the resolved LATEST with `_mor_file`/`_mor_pos` attached —
    existing layers (equality or positional) already subtracted, so a
    new vector can only target rows that are still alive. Restricted to
    flat-full-snapshot data ancestors: an append chain or hive layout
    has no single stable (file, pos) address space a positional vector
    can bind to (compact first — same rule as the COW path)."""
    import json

    from .sources import lakefs

    parent_v = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    pm = json.loads(
        lakefs.read_text(spark, f"{base}/v={parent_v}/_manifest.json")
    )
    if pm.get("append") or pm.get("partition_by"):
        raise ValueError(
            "positional deletes target flat full snapshots — an append "
            "chain / partitioned layout has no single (file, pos) "
            "address space; compact first"
        )
    data_v, layers = _mor_layers(spark, base, pm)
    dm = json.loads(
        lakefs.read_text(spark, f"{base}/v={data_v}/_manifest.json")
    )
    if dm.get("append") or dm.get("partition_by"):
        raise ValueError(
            "positional deletes need a flat-snapshot data ancestor "
            f"(v={data_v} is an append/partitioned segment) — "
            "materialize_mor or compact first"
        )
    df = _with_row_address(spark.read.parquet(f"{base}/v={data_v}"))
    for layer in layers:
        if layer[0] == "eq":
            _, col, deletes_dir = layer
            keys = spark.read.parquet(deletes_dir).select(
                F.col("value").alias(f"_mor_{col}")
            )
            df = df.join(
                F.broadcast(keys),
                df[col] == F.col(f"_mor_{col}"),
                "left_anti",
            )
        else:
            _, deletes_dir = layer
            addrs = spark.read.parquet(deletes_dir).select(
                F.col("file").alias("_del_file"),
                F.col("pos").alias("_del_pos"),
            )
            df = df.join(
                F.broadcast(addrs),
                (df["_mor_file"] == F.col("_del_file"))
                & (df["_mor_pos"] == F.col("_del_pos")),
                "left_anti",
            )
    return parent_v, pm, df


def _commit_pos_delete(
    spark, base: str, parent_v: int, pm: dict, doomed: DataFrame,
    record: dict,
) -> tuple[int, int]:
    """Write a positional delete vector (`_pos_deletes` holding
    (file, pos) addresses) plus its manifest, flip LATEST. Shared tail
    of delete_rows_pos / dedup_rows_pos."""
    import json
    from datetime import datetime, timezone

    from .sources import lakefs

    version = parent_v + 1
    out = f"{base}/v={version}"
    addrs = doomed.select(
        F.col("_mor_file").alias("file"), F.col("_mor_pos").alias("pos")
    )
    addrs.coalesce(1).write.mode("errorifexists").parquet(
        f"{out}/_pos_deletes"
    )
    n_deleted = spark.read.parquet(f"{out}/_pos_deletes").count()
    if n_deleted == 0:
        lakefs.delete(spark, out)
        raise ValueError(
            "positional delete matched zero rows — an empty vector "
            "commit would be a no-op version"
        )
    manifest = {
        "version": version,
        "rows": int(pm["rows"]) - n_deleted if "rows" in pm else None,
        "schema": pm["schema"],
        "schema_json": pm["schema_json"],
        "published_ts": datetime.now(timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%fZ"
        ),
        "pos_delete": {
            "parent": parent_v,
            "n_rows_deleted": n_deleted,
            **record,
        },
        "data_version": pm.get("data_version", parent_v),
    }
    if manifest["rows"] is None:
        del manifest["rows"]
    if pm.get("file_stats"):
        # deletes only narrow true ranges: carried bounds stay
        # conservative, so data skipping keeps working through the stack
        manifest["file_stats"] = pm["file_stats"]
    lakefs.write_text(spark, f"{out}/_manifest.json", json.dumps(manifest))
    lakefs.replace_text(spark, f"{base}/LATEST", str(version))
    return version, n_deleted


def delete_rows_pos(
    spark: SparkSession, base_dir: str, predicate: str
) -> tuple[int, int]:
    """Row deletion via POSITIONAL deletion vectors — the Iceberg
    position-delete shape beside the equality vectors of
    `delete_rows_mor`: the commit records the physical (file,
    row-ordinal) address of every row matching `predicate` (a SQL
    boolean expression over the resolved LATEST), touching no data
    file. Reads subtract the addresses with one broadcast anti join
    per layer, exactly like the equality path; the two kinds STACK in
    any order and `materialize_mor` folds both.

    Why a second vector kind: an equality vector needs the doomed set
    expressible as `col IN (keys)` — a predicate across columns
    (`quantity < 2 AND price > x`) would first have to be resolved to
    keys, and a table whose "key" has duplicates cannot address one
    specific physical row at all. Positional vectors address rows by
    where they physically sit, so any predicate — or a
    keep-one-per-duplicate-group policy (`dedup_rows_pos`) — commits
    in O(matched rows). The cost profile is identical to equality MOR:
    O(k) write, one broadcast anti join per layer per read.

    Returns (new_version, n_rows_deleted) measured against the
    RESOLVED parent (rows already dead in an earlier layer count
    zero)."""
    _refuse_shallow_write(spark, base_dir, "delete_rows_pos")
    base = base_dir.rstrip("/")
    parent_v, pm, df = _pos_parent_scan(spark, base)
    doomed = df.filter(F.expr(predicate))
    return _commit_pos_delete(
        spark, base, parent_v, pm, doomed, {"predicate": predicate}
    )


def dedup_rows_pos(
    spark: SparkSession, base_dir: str, keys: list[str]
) -> tuple[int, int]:
    """KEEP-FIRST positional dedup: for every group of rows sharing
    `keys`, keep the one at the lowest (file, pos) address and commit a
    positional vector deleting the rest — the capability equality
    vectors fundamentally lack (all duplicates share the key, so a key
    vector would delete the survivor too). This is the lake-mutation
    form of exact dedup: a 100 TB corpus with 0.1% duplicate rows pays
    an O(dup-rows) vector write, not an O(table) rewrite, and the next
    `materialize_mor`/compaction makes it physical.

    The group shuffle partitions by `keys` (two-phase: the window runs
    per group after one hash exchange); only the doomed addresses —
    file path + ordinal, ~tens of bytes per duplicate — are written.

    Returns (new_version, n_rows_deleted)."""
    from pyspark.sql import Window

    base = base_dir.rstrip("/")
    parent_v, pm, df = _pos_parent_scan(spark, base)
    w = Window.partitionBy(*keys).orderBy("_mor_file", "_mor_pos")
    doomed = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .drop("_rn")
    )
    return _commit_pos_delete(
        spark, base, parent_v, pm, doomed, {"keys": list(keys)}
    )


def _mor_record(m: dict) -> dict | None:
    """The delete-layer record of a merge-on-read manifest — equality
    (`mor_delete`, keyed on column values) or positional (`pos_delete`,
    keyed on (file, row-ordinal) addresses) — else None. Every chain
    walk treats the two kinds identically: a vector commit holds no
    data files of its own and links to its parent snapshot."""
    return m.get("mor_delete") or m.get("pos_delete")


def _mor_layers(spark, base: str, manifest: dict):
    """(data_version, layers) for a possibly-MOR manifest — the delete
    layers newest-first back to the physical snapshot, each either
    ("eq", col, deletes_dir) or ("pos", deletes_dir). O(stack)
    manifest reads."""
    import json

    from .sources import lakefs

    layers = []
    m = manifest
    while _mor_record(m):
        if m.get("mor_delete"):
            layers.append(
                (
                    "eq",
                    m["mor_delete"]["col"],
                    f"{base}/v={m['version']}/_deletes",
                )
            )
        else:
            layers.append(("pos", f"{base}/v={m['version']}/_pos_deletes"))
        m = json.loads(
            lakefs.read_text(
                spark,
                f"{base}/v={_mor_record(m)['parent']}/_manifest.json",
            )
        )
    return m["version"], layers


def _with_row_address(df: DataFrame) -> DataFrame:
    """Attach each row's physical address — `_mor_file` (the
    version-relative file path, so the address survives a base-dir
    move) and `_mor_pos` (the row ordinal within that file, Spark's
    `_metadata.row_index`). Resolvable only on a DataFrame still
    backed by a direct parquet scan (filters are fine, unions and
    projections lose the hidden `_metadata` column) — which the
    write-time restriction guarantees: positional vectors only ever
    target flat full snapshots."""
    return df.select(
        "*",
        F.regexp_extract(
            F.col("_metadata.file_path"), r"(v=\d+/.*)$", 1
        ).alias("_mor_file"),
        F.col("_metadata.row_index").alias("_mor_pos"),
    )


def _apply_mor(spark, df: DataFrame, base: str, manifest: dict) -> DataFrame:
    """Subtract every MOR layer from `df` (broadcast anti joins — the
    delete sets are the small side by construction). Equality layers
    join on the key column; positional layers join on the (file, pos)
    address, which `_with_row_address` attaches here and drops before
    returning — callers never see the address columns."""
    _, layers = _mor_layers(spark, base, manifest)
    has_pos = any(layer[0] == "pos" for layer in layers)
    if has_pos:
        df = _with_row_address(df)
    for layer in layers:
        if layer[0] == "eq":
            _, col, deletes_dir = layer
            keys = spark.read.parquet(deletes_dir).select(
                F.col("value").alias(f"_mor_{col}")
            )
            df = df.join(
                F.broadcast(keys),
                df[col] == F.col(f"_mor_{col}"),
                "left_anti",
            )
        else:
            _, deletes_dir = layer
            addrs = spark.read.parquet(deletes_dir).select(
                F.col("file").alias("_del_file"),
                F.col("pos").alias("_del_pos"),
            )
            df = df.join(
                F.broadcast(addrs),
                (df["_mor_file"] == F.col("_del_file"))
                & (df["_mor_pos"] == F.col("_del_pos")),
                "left_anti",
            )
    if has_pos:
        df = df.drop("_mor_file", "_mor_pos")
    return df


def materialize_mor(spark: SparkSession, base_dir: str) -> int:
    """Fold a MOR delete stack into a physical full snapshot: one
    rewrite of the surviving rows, published as a normal version (the
    compaction half of merge-on-read — run it when the stack depth
    makes the per-read anti joins noticeable, or before vacuum must
    reclaim the shared ancestor data files).

    The manifest carries `compacted_from` (the folded stack + its data
    ancestor) like any compaction rewrite: the lake STREAMING source
    must not re-flood an existing subscriber with rows it already
    emitted — deletions cannot be retracted from an append-only stream
    anyway, so for stream consumers a materialization is a no-op
    commit, exactly like chain compaction."""
    import json as _json

    from .sources import lakefs

    df, manifest = read_version(spark, base_dir)
    if not _mor_record(manifest):
        raise ValueError(f"{base_dir} LATEST carries no MOR delete stack")
    base = base_dir.rstrip("/")
    folded = [int(manifest["version"])]
    mm = manifest
    while _mor_record(mm):
        pv = int(_mor_record(mm)["parent"])
        folded.append(pv)
        mm = _json.loads(
            lakefs.read_text(spark, f"{base}/v={pv}/_manifest.json")
        )
    meta = {
        k: v
        for k, v in manifest.items()
        if k
        not in (
            "version", "rows", "schema", "schema_json", "published_ts",
            "mor_delete", "pos_delete", "data_version", "file_stats",
        )
    }
    meta["compacted_from"] = sorted(folded)
    return publish_versioned(df, base_dir, meta=meta)


def fast_count(
    spark: SparkSession, base_dir: str, version: int | None = None
) -> int:
    """`SELECT count(*)` answered from MANIFESTS ALONE — zero data
    I/O, zero tasks, O(chain) driver-side JSON — the metadata-only
    aggregate shortcut Delta/Iceberg serve for unfiltered counts.
    Every commit kind records the number it contributes: a full
    publish / compaction / COW rewrite stores its total, an append
    segment stores its delta (the chain total is the sum), and a
    delete-vector commit (equality or positional) stores the resolved
    total directly — so the head of a MOR stack answers without
    walking it. At 100 TB the difference is a metadata lookup versus
    scanning every footer (or worse, every row) to count a table.

    Always equals `read_version_chain(...)[0].count()` — pinned by
    tests across chains, evolution, vector stacks, and rewrites."""
    import json as _json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    chain = _resolve_chain(spark, base, version)
    head = chain[0]
    if "rows" not in head:
        raise ValueError(
            f"v={head['version']} manifest records no row count — "
            "fast_count needs manifests written by this format's "
            "publish paths"
        )
    if _mor_record(head):
        return int(head["rows"])
    return sum(int(m["rows"]) for m in chain)


def fast_minmax(
    spark: SparkSession,
    base_dir: str,
    col: str,
    version: int | None = None,
) -> tuple:
    """`SELECT min(col), max(col)` answered from the manifests' per-file
    footer stats ALONE — zero data I/O, zero tasks, the metadata-only
    companion of `fast_count`. Exact (not a bound) because parquet
    footer min/max ARE the exact column extremes of each file and an
    append chain's extremes are the extremes of its files' extremes.

    Refused where exactness would break: a MOR head (a deletion vector
    may have removed the extreme row — the carried stats are
    conservative bounds, not answers) and any chain segment without
    file_stats covering `col` (nothing to answer from). NULL-only
    files contribute nothing; a table with no non-NULL values returns
    (None, None). At 100 TB this is O(files) driver JSON versus a full
    column scan."""
    import json as _json  # noqa: F401  (parity with fast_count)

    chain = _resolve_chain(spark, base_dir.rstrip("/"), version)
    if _mor_record(chain[0]):
        raise ValueError(
            f"v={chain[0]['version']} is a merge-on-read head — its "
            "carried stats are conservative bounds, not exact extremes "
            "(the vector may have deleted the min/max row); "
            "materialize_mor first or scan"
        )
    lo = hi = None
    for m in chain:
        fs = m.get("file_stats")
        if not fs or col not in fs.get("columns", []):
            raise ValueError(
                f"v={m['version']} of {base_dir} records no file stats "
                f"for {col!r} — fast_minmax needs stats_cols at publish "
                "time (or scan)"
            )
        for f in fs["files"]:
            fmin, fmax = f["min"].get(col), f["max"].get(col)
            if fmin is not None and (lo is None or fmin < lo):
                lo = fmin
            if fmax is not None and (hi is None or fmax > hi):
                hi = fmax
    return lo, hi


def table_history(spark: SparkSession, base_dir: str) -> DataFrame:
    """DESCRIBE HISTORY for a versioned dataset: one row per retained
    version with its commit KIND (full / append / compaction /
    merge-on-read delete / staged candidate), row count, parent link,
    published timestamp, and evolution metadata — assembled from the
    manifests alone (O(versions) driver JSON, no data I/O) and returned
    as a DataFrame so it composes with SQL like any audit table.

    Versions reclaimed by vacuum no longer appear: history is the
    retention window, not an immutable ledger — pin versions (or
    archive manifests) where a longer audit trail is required."""
    import json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .sources import lakefs

    base = base_dir.rstrip("/")
    latest = staged = None
    if lakefs.exists(spark, f"{base}/LATEST"):
        latest = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    if lakefs.exists(spark, f"{base}/STAGED"):
        staged = int(lakefs.read_text(spark, f"{base}/STAGED").strip())
    rows = []
    for name in sorted(lakefs.listdir(spark, base)):
        if not (name.startswith("v=") and name.split("=")[1].isdigit()):
            continue
        v = int(name.split("=")[1])
        m = json.loads(
            lakefs.read_text(spark, f"{base}/v={v}/_manifest.json")
        )
        if m.get("mor_delete"):
            kind = "mor_delete"
            parent = int(m["mor_delete"]["parent"])
        elif m.get("pos_delete"):
            kind = "pos_delete"
            parent = int(m["pos_delete"]["parent"])
        elif m.get("append"):
            kind = "append"
            parent = m.get("parent")
        elif m.get("compacted_from"):
            kind = "compaction"
            parent = None
        elif m.get("staged"):
            kind = "staged"
            parent = None
        else:
            kind = "full"
            parent = None
        evo = []
        for key, tag in (
            ("added_columns", "add"),
            ("renamed_columns", "rename"),
            ("widened_columns", "widen"),
            ("dropped_columns", "drop"),
            ("partition_by", "partition"),
        ):
            if m.get(key):
                evo.append(f"{tag}:{m[key]}")
        rows.append(
            (
                v,
                kind,
                int(m.get("rows", -1)),
                parent,
                m.get("published_ts"),
                "; ".join(evo) if evo else None,
                v == latest,
                v == staged,
            )
        )
    schema = StructType(
        [
            StructField("version", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("rows", LongType(), False),
            StructField("parent", LongType(), True),
            StructField("published_ts", StringType(), True),
            StructField("evolution", StringType(), True),
            StructField("is_latest", StringType(), True),
            StructField("is_staged", StringType(), True),
        ]
    )
    # booleans as strings keep the frame trivially CSV/JSON-portable
    rows = [
        (a, b, c, d, e, f, str(g).lower(), str(h).lower())
        for a, b, c, d, e, f, g, h in rows
    ]
    return spark.createDataFrame(rows, schema)


def _commit_predecessor(m: dict) -> int | None:
    """The version this commit logically succeeded — the edge the change
    feed walks. COW-fold commits carry BOTH compacted_from and a
    deleted/updated record, so the mutation record (which knows the true
    pre-image version) wins over the compaction marker. None = a full
    publish with no recorded lineage."""
    if m.get("deleted"):
        return int(m["deleted"]["from_version"])
    if m.get("updated"):
        return int(m["updated"]["from_version"])
    if m.get("append"):
        p = m.get("parent")
        return int(p) if p is not None else None
    r = _mor_record(m)
    if r:
        return int(r["parent"])
    if m.get("compacted_from"):
        return max(int(v) for v in m["compacted_from"])
    return None


def table_changes(
    spark: SparkSession, base_dir: str, from_v: int, to_v: int
) -> DataFrame:
    """Row-level CHANGE DATA FEED between two versions (the Delta
    `table_changes` / Iceberg incremental-read shape): every row
    inserted or deleted by each commit in (from_v, to_v], tagged with
    `_change_type` ('insert' | 'delete') and `_commit_version`, under
    the head schema at `to_v`. An update surfaces as its delete+insert
    pair; a compaction / materialization emits NOTHING (same logical
    rows — stream consumers must not be re-flooded, the identical rule
    the lake streaming source applies).

    Cost tracks the COMMIT, not the table, wherever lineage metadata
    allows: an append contributes its own segment (O(batch)); an
    equality-vector delete contributes parent-resolved rows semi-joined
    to its O(keys) vector; a compaction contributes zero. Only commits
    with no row-addressed metadata (positional vectors, COW rewrites)
    fall back to a multiset diff (exceptAll both ways) of the two
    resolved snapshots — exact even for duplicate rows, at the cost of
    two scans. Full publishes without lineage can't be walked (there is
    no recorded predecessor) and raise — diff_versions is the explicit
    tool there.

    Refuses a window containing rename evolution: pre-rename rows would
    silently mis-align with the head schema by name; compact first.

    At 100 TB this is the incremental-consumer contract: a downstream
    materialization reads O(changes since last sync), never O(table),
    and the walk itself is O(window) driver-side manifest JSON."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    head_df, _ = read_version_chain(spark, base, to_v)
    out_fields = head_df.schema.fields

    def conform(df: DataFrame, change: str, v: int) -> DataFrame:
        names = set(df.columns)
        cols = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in names
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in out_fields
        ]
        return df.select(
            *cols,
            F.lit(change).alias("_change_type"),
            F.lit(v).cast("long").alias("_commit_version"),
        )

    # walk the commit lineage to_v -> from_v (manifest JSON only)
    walk: list[dict] = []
    v = to_v
    while v != from_v:
        m = json.loads(
            lakefs.read_text(spark, f"{base}/v={v}/_manifest.json")
        )
        if m.get("renamed_columns"):
            raise ValueError(
                f"v={v} renames columns inside the change window — "
                "pre-rename change rows would mis-align by name; "
                "compact the chain or start the feed after the rename"
            )
        p = _commit_predecessor(m)
        if p is None:
            raise ValueError(
                f"v={v} is a full publish with no recorded lineage — "
                "the change feed cannot walk past it; use "
                "diff_versions(key_cols) for rewrite commits"
            )
        walk.append(m)
        if p == v:
            raise ValueError(f"v={v} lists itself as predecessor")
        v = p
    parts: list[DataFrame] = []
    for m in reversed(walk):  # oldest commit first
        cv = int(m["version"])
        p = _commit_predecessor(m)
        if m.get("deleted") or m.get("updated") or m.get("pos_delete"):
            # row-addressed metadata isn't row-valued: multiset diff of
            # the two resolved snapshots (exact under duplicates)
            old_df, _ = read_version_chain(spark, base, p)
            new_df, _ = read_version_chain(spark, base, cv)
            old_c = conform(old_df, "", cv).drop(
                "_change_type", "_commit_version"
            )
            new_c = conform(new_df, "", cv).drop(
                "_change_type", "_commit_version"
            )
            parts.append(
                conform(new_c.exceptAll(old_c), "insert", cv)
            )
            parts.append(
                conform(old_c.exceptAll(new_c), "delete", cv)
            )
        elif m.get("mor_delete"):
            col = m["mor_delete"]["col"]
            keys = spark.read.parquet(f"{base}/v={cv}/_deletes").select(
                F.col("value").alias("_cdf_key")
            )
            parent_df, _ = read_version_chain(spark, base, p)
            hit = parent_df.join(
                F.broadcast(keys),
                parent_df[col] == F.col("_cdf_key"),
                "left_semi",
            )
            parts.append(conform(hit, "delete", cv))
        elif m.get("append"):
            seg = _segment_read(
                spark, base, m, _manifest_schema(m), aliases={}
            )
            parts.append(conform(seg, "insert", cv))
        elif m.get("compacted_from"):
            continue  # logical no-op: same rows, new layout
        else:  # pragma: no cover — predecessor logic excludes this
            raise ValueError(
                f"v={cv}: unrecognized commit kind for the change feed"
            )
    if not parts:
        return conform(head_df.limit(0), "insert", to_v).limit(0)
    return _union_all(parts)


# --- named branches (Nessie-style data branching) ---------------------------


def _branch_file(base: str, name: str) -> str:
    if not name or not name.replace("_", "").replace("-", "").isalnum():
        raise ValueError(f"branch name must be alphanumeric/_/-: {name!r}")
    if name.upper() in ("LATEST", "STAGED"):
        raise ValueError(f"{name!r} is a reserved pointer name")
    return f"{base}/BRANCH_{name}"


def create_branch(
    spark: SparkSession, base_dir: str, name: str,
    from_version: int | None = None,
) -> int:
    """Create a named BRANCH pointing at `from_version` (default: the
    current LATEST) — the Nessie/Git idea applied to the lake: a branch
    is just another pointer file, so creating one is O(1) and shares
    all data with main. The canonical use in a training-data pipeline:
    branch the corpus, run an experimental filter/dedup recipe on the
    branch, compare eval metrics, then merge_branch (fast-forward) or
    delete_branch — main's readers never see the experiment."""
    _refuse_shallow_write(spark, base_dir, "create_branch")
    from .sources import lakefs

    base = base_dir.rstrip("/")
    bf = _branch_file(base, name)
    if lakefs.exists(spark, bf):
        raise ValueError(f"branch {name!r} already exists at {base_dir}")
    if from_version is None:
        from_version = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    if not lakefs.exists(spark, f"{base}/v={from_version}/_manifest.json"):
        raise ValueError(f"version {from_version} does not exist")
    lakefs.replace_text(spark, bf, str(from_version))
    return from_version


def read_branch(spark: SparkSession, base_dir: str, name: str):
    """(DataFrame, manifests) at the branch head — chain/evolution/MOR
    resolution identical to a LATEST read, just through the branch
    pointer."""
    from .sources import lakefs

    base = base_dir.rstrip("/")
    v = int(lakefs.read_text(spark, _branch_file(base, name)).strip())
    return read_version_chain(spark, base_dir, v)


def branch_head(spark: SparkSession, base_dir: str, name: str) -> int:
    from .sources import lakefs

    return int(
        lakefs.read_text(
            spark, _branch_file(base_dir.rstrip("/"), name)
        ).strip()
    )


def delete_branch(spark: SparkSession, base_dir: str, name: str) -> None:
    """Drop the pointer; versions reachable only from it become vacuum
    garbage (exactly like an orphaned WAP candidate)."""
    from .sources import lakefs

    lakefs.delete(spark, _branch_file(base_dir.rstrip("/"), name))


def _ancestors(spark, base: str, v: int) -> set[int]:
    """Every version reachable from v over append-parent and MOR-parent
    links (v included)."""
    import json

    from .sources import lakefs

    out: set[int] = set()
    todo = [v]
    while todo:
        x = todo.pop()
        if x in out:
            continue
        out.add(x)
        m = json.loads(
            lakefs.read_text(spark, f"{base}/v={x}/_manifest.json")
        )
        if m.get("append") and m.get("parent") is not None:
            todo.append(int(m["parent"]))
        if _mor_record(m):
            todo.append(int(_mor_record(m)["parent"]))
    return out


def merge_branch(spark: SparkSession, base_dir: str, name: str) -> int:
    """FAST-FORWARD merge: flip LATEST to the branch head, legal only
    when the current LATEST is an ancestor of the branch head (over
    append/MOR links) — main has not moved since the branch was cut, so
    the merge is a pointer move with no conflict surface. A diverged
    main raises: three-way merge of arbitrary table states has no
    general semantics; rebase the branch (re-run its recipe on the new
    main) or reconcile explicitly with merge_rows/diff_snapshots. The
    branch pointer is retired after the merge."""
    from .sources import lakefs

    base = base_dir.rstrip("/")
    head = branch_head(spark, base_dir, name)
    latest = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    if latest != head and latest not in _ancestors(spark, base, head):
        raise ValueError(
            f"cannot fast-forward: LATEST v={latest} is not an ancestor "
            f"of branch {name!r} head v={head} — main diverged; rebase "
            "the branch or reconcile with merge_rows/diff_snapshots"
        )
    lakefs.replace_text(spark, f"{base}/LATEST", str(head))
    lakefs.delete(spark, _branch_file(base, name))
    return head


def rebase_branch(spark: SparkSession, base_dir: str, name: str) -> int:
    """REBASE a diverged branch onto the current LATEST: replay each
    branch-only append segment's delta rows, oldest-first, as fresh
    appends on top of main's head — after which `merge_branch` is a
    legal fast-forward again. The git analogy is exact, including the
    cost model: a replayed segment re-WRITES its delta (O(branch
    deltas), never O(table)), the rebased branch gets new version
    numbers, and the original branch segments become unreachable
    garbage for `vacuum_versions`.

    Scope: the branch-only suffix must be PLAIN append segments — no
    schema/partition evolution, no delete vectors. Those commits bake
    in assumptions about the base they were cut from (a rename chain,
    a (file, pos) address space) that a textual replay onto a moved
    main cannot honor; re-run the branch's recipe instead (the same
    rule git imposes when a rebase hits a semantic conflict). All
    checks run BEFORE the first write, so a refused rebase mutates
    nothing.

    Returns the new branch head. No-op (returns the head unchanged)
    when main has not diverged — merge_branch already fast-forwards."""
    import json

    from .sources import lakefs

    base = base_dir.rstrip("/")
    head = branch_head(spark, base_dir, name)
    latest = int(lakefs.read_text(spark, f"{base}/LATEST").strip())
    if latest == head or latest in _ancestors(spark, base, head):
        return head  # fast-forwardable as-is
    main_anc = _ancestors(spark, base, latest)
    segs: list[dict] = []
    v: int | None = head
    while v is not None and v not in main_anc:
        m = json.loads(
            lakefs.read_text(spark, f"{base}/v={v}/_manifest.json")
        )
        if _mor_record(m) or not m.get("append"):
            raise ValueError(
                f"cannot rebase {name!r}: v={v} is not a plain append "
                "segment (delete vectors / full rewrites don't replay "
                "onto a moved base) — re-run the branch's recipe on the "
                "new main instead"
            )
        if any(
            m.get(k)
            for k in (
                "added_columns", "renamed_columns", "widened_columns",
                "dropped_columns", "partition_by",
            )
        ):
            raise ValueError(
                f"cannot rebase {name!r}: v={v} carries schema/partition "
                "evolution, which binds to the base it was cut from — "
                "re-run the branch's recipe on the new main instead"
            )
        segs.append(m)
        v = m.get("parent")
    if v is None:
        raise ValueError(
            f"branch {name!r} shares no history with LATEST v={latest} — "
            "nothing to rebase onto"
        )
    # pre-validate every delta against main's head schema so a refused
    # rebase mutates nothing (publish_append would also catch this, but
    # only after earlier segments had already replayed)
    head_m = json.loads(
        lakefs.read_text(spark, f"{base}/v={latest}/_manifest.json")
    )
    for m in segs:
        if m["schema_json"] != head_m["schema_json"]:
            raise ValueError(
                f"cannot rebase {name!r}: segment v={m['version']} "
                "schema differs from main's head — main evolved since "
                "the fork; re-run the branch's recipe on the new main"
            )
    lakefs.replace_text(spark, _branch_file(base, name), str(latest))
    for m in reversed(segs):
        delta = spark.read.schema(_manifest_schema(m)).parquet(
            f"{base}/v={m['version']}"
        )
        stats = m.get("file_stats")
        publish_append(
            delta, base_dir, branch=name,
            stats_cols=stats["columns"] if stats else None,
        )
    return branch_head(spark, base_dir, name)


def clone_snapshot(
    spark: SparkSession,
    src_base: str,
    dest_base: str,
    version: int | None = None,
) -> int:
    """Snapshot EXPORT/import — clone one snapshot's full manifest
    lineage into a NEW dataset base (the Iceberg register_table /
    Delta CLONE shape on this manifest format).

    The exported set is `_ancestors(version)`: every version a pinned
    read of `version` can touch — append parents back to the last full
    snapshot and MOR delete-layer parents, recursively. Each `v=N`
    directory is copied verbatim (data files, `_manifest.json`,
    `_deletes/` / `_pos_deletes/` layers); nothing inside needs
    rewriting because every cross-file reference in this format is
    base-relative by construction: manifest `parent` links are version
    NUMBERS, `file_stats` record basenames, and positional delete
    vectors address `v=N/...`-relative paths (_with_row_address). The
    clone's LATEST then points at `version`.

    The copy is DEEP, which is what buys the two independences the
    clone contract promises (tests/test_clone.py):
    - vacuum/compact/append on the SOURCE never change what the clone
      reads — there are no shared files to reclaim out from under it;
    - the clone is a first-class dataset: publish_append continues its
      chain, vacuum_versions applies its own retention, branches/WAP
      start fresh (branch pointers and STAGED state are deliberately
      NOT exported — they are live workflow state of the source, not
      part of the snapshot).

    Scope notes. A clone pins one snapshot's lineage, not the source's
    history: earlier versions, `compacted_from` stream history, and the
    change feed before `version` do not exist at the destination —
    stream subscribers on a clone start at its head. `dest_base` must
    be a fresh location (no LATEST/STAGED/`v=` entries): importing into
    an existing lineage would splice two version-number spaces.

    At 100 TB: the control-plane cost is O(chain) manifest reads; the
    data-plane cost is the snapshot's bytes through Hadoop FileUtil
    copies, driver-orchestrated here (local/HDFS). A cluster deployment
    would fan the per-file copies out DistCp-style — the file list is
    exactly what this function enumerates — or hand them to storage-
    native server-side copy (S3 CopyObject); the manifest-chain logic
    is unchanged either way. Returns the cloned version number."""
    from .sources import lakefs

    src = src_base.rstrip("/")
    dest = dest_base.rstrip("/")
    if version is None:
        version = int(lakefs.read_text(spark, f"{src}/LATEST").strip())
    if not lakefs.exists(spark, f"{src}/v={version}/_manifest.json"):
        raise ValueError(f"source has no v={version} to clone")
    if lakefs.exists(spark, dest):
        taken = [
            n
            for n in lakefs.listdir(spark, dest)
            if n in ("LATEST", "STAGED", "_shallow.json")
            or n.startswith(("v=", "BRANCH_"))
        ]
        if taken:
            raise ValueError(
                f"clone destination {dest} already holds dataset state "
                f"{sorted(taken)[:4]} — a clone must import into a fresh "
                "base, not splice into an existing lineage"
            )
    vers = _ancestors(spark, src, version)
    lakefs.mkdirs(spark, dest)
    # oldest-first so an interrupted clone is a prefix of the lineage
    # with no LATEST — invisible to readers, re-runnable after cleanup
    for v in sorted(vers):
        lakefs.copy(spark, f"{src}/v={v}", f"{dest}/v={v}")
    lakefs.replace_text(spark, f"{dest}/LATEST", str(version))
    return version


def _lineage_history(spark: SparkSession, base: str, version: int) -> set[int]:
    """The FULL history set of `version` — append-parent, MOR-parent,
    AND compacted_from (a head behind a compaction/materialization is
    still same-lineage; it only survives in the rewrite's
    compacted_from list). Versions the source has vacuumed stay IN the
    set (same rule as the stream source's ancestry): they prove lineage
    even though their bytes are gone. Shared by the fast-forward
    legality checks of sync_clone and sync_shallow_clone."""
    import json as _hist_json

    from .sources import lakefs

    history: set[int] = set()
    todo = [version]
    while todo:
        x = todo.pop()
        if x in history:
            continue
        history.add(x)
        try:
            m = _hist_json.loads(
                lakefs.read_text(spark, f"{base}/v={x}/_manifest.json")
            )
        except Exception:
            continue  # vacuumed: number stays in the set
        if m.get("append") and m.get("parent") is not None:
            todo.append(int(m["parent"]))
        rec = _mor_record(m)
        if rec:
            todo.append(int(rec["parent"]))
        todo.extend(int(fv) for fv in m.get("compacted_from") or [])
    return history


def sync_clone(
    spark: SparkSession,
    src_base: str,
    dest_base: str,
    version: int | None = None,
) -> tuple[int, list[int]]:
    """INCREMENTAL clone refresh — the disaster-recovery / replica-
    maintenance companion to `clone_snapshot`: copy only the ancestor
    versions of `version` (default: the source's LATEST) that the
    destination does not already hold, then advance the clone's LATEST.
    Each sync costs O(new versions)' bytes, never a re-copy — the same
    O(batch) property append commits have, carried over to replication.

    Safety rules (all checked BEFORE any copy):
    - the destination must be an existing clone (have a LATEST) — a
      fresh target belongs to clone_snapshot;
    - the destination's LATEST must be an ancestor of the new version
      on the SOURCE's history (same-lineage fast-forward, exactly the
      merge_branch rule): a diverged clone — one that took local
      appends of its own — cannot be silently overwritten; refuse and
      let the caller reconcile or re-clone. Version numbers shared
      with the source but written by the CLONE (possible after local
      appends) would otherwise be skipped as "already present" and
      corrupt the lineage.
    - version directories present at BOTH ends are trusted as
      identical (they are immutable at the source by the manifest
      format's contract; the clone's copy is a byte copy).

    Returns (new_version, newly_copied_versions). A sync to an
    up-to-date clone is a no-op returning ([] copied). Vacuum safety:
    like clone_snapshot, a crash mid-copy leaves LATEST untouched, so
    the clone stays consistent at its previous version and the sync is
    re-runnable."""
    from .sources import lakefs

    src = src_base.rstrip("/")
    dest = dest_base.rstrip("/")
    if not lakefs.exists(spark, f"{dest}/LATEST"):
        raise ValueError(
            f"{dest} is not an existing clone (no LATEST) — use "
            "clone_snapshot for the initial copy"
        )
    if version is None:
        version = int(lakefs.read_text(spark, f"{src}/LATEST").strip())
    if not lakefs.exists(spark, f"{src}/v={version}/_manifest.json"):
        raise ValueError(f"source has no v={version} to sync to")
    dest_head = int(lakefs.read_text(spark, f"{dest}/LATEST").strip())
    history = _lineage_history(spark, src, version)
    if dest_head not in history:
        raise ValueError(
            f"clone at {dest} (LATEST v={dest_head}) is not on the "
            f"history of source v={version} — the clone diverged (local "
            "writes?); reconcile explicitly or re-clone to a fresh base"
        )
    src_ancestors = _ancestors(spark, src, version)
    copied: list[int] = []
    for v in sorted(src_ancestors):
        if lakefs.exists(spark, f"{dest}/v={v}/_manifest.json"):
            # shared version numbers are only trustworthy if they ARE
            # the same commit — a clone that wrote a local version
            # under a number the source also used must not be spliced
            # (manifest bytes are the commit's identity)
            if lakefs.read_text(
                spark, f"{dest}/v={v}/_manifest.json"
            ) != lakefs.read_text(spark, f"{src}/v={v}/_manifest.json"):
                raise ValueError(
                    f"clone at {dest} holds a DIFFERENT v={v} than the "
                    "source — colliding local writes; re-clone to a "
                    "fresh base"
                )
            continue
        lakefs.copy(spark, f"{src}/v={v}", f"{dest}/v={v}")
        copied.append(v)
    lakefs.replace_text(spark, f"{dest}/LATEST", str(version))
    return version, copied


def _refuse_shallow_write(spark: SparkSession, base_dir: str, op: str) -> None:
    """A SHALLOW clone is a read-only pinned view: local writes would
    allocate version numbers in the SOURCE's number space without the
    source knowing (splicing two lineages) — fork a writable lineage
    with the deep clone_snapshot instead. Typed refusal, not a
    documented footgun."""
    if _shallow_meta(spark, base_dir.rstrip("/")) is not None:
        raise ValueError(
            f"{op} at {base_dir}: the base is a SHALLOW clone "
            "(read-only pinned view) - use clone_snapshot (deep) to "
            "fork a writable lineage"
        )


def _shallow_meta(spark: SparkSession, base: str) -> dict | None:
    """The `_shallow.json` redirection record of a SHALLOW clone, or
    None for a regular dataset."""
    import json

    from .sources import lakefs

    if not lakefs.exists(spark, f"{base}/_shallow.json"):
        return None
    return json.loads(lakefs.read_text(spark, f"{base}/_shallow.json"))


def _follow_shallow(
    spark: SparkSession, base: str, version: int | None
) -> tuple[str, int | None]:
    """Resolve reads at a shallow clone to (source base, pinned
    version). A caller-supplied `version` (time travel within the pin's
    lineage) passes through; the default read resolves to the PIN, not
    the source's LATEST — a clone is frozen by definition."""
    meta = _shallow_meta(spark, base)
    if meta is None:
        return base, version
    return meta["src"].rstrip("/"), (
        version if version is not None else int(meta["version"])
    )


def shallow_clone_snapshot(
    spark: SparkSession,
    src_base: str,
    dest_base: str,
    version: int | None = None,
) -> int:
    """SHALLOW clone — the zero-copy sibling of clone_snapshot (the
    Delta `SHALLOW CLONE` shape): the destination holds ONLY a
    redirection record (`_shallow.json` → source base + pinned
    version); every data byte stays at the source and reads at the
    clone resolve through `_follow_shallow`. O(1) bytes, O(chain)
    manifest reads — a 100 TB snapshot clones in milliseconds.

    What makes this SAFE where Delta's shallow clone is documented-
    hazardous ("vacuum on the source breaks shallow clones"): the clone
    registers a REF in the source's ledger (`src/_refs/shallow-<id>.json`)
    recording the pinned version, its full ancestor set, and every
    referenced data file. `vacuum_versions` on the source treats every
    ref-pinned version as live (exactly like branch heads), so
    retention can never reclaim bytes a clone still reads —
    tests/test_clone.py proves vacuum skips them and the clone read is
    byte-stable. `clone_refcounts` derives per-file counts from the
    ledger; `release_shallow_clone` drops the ref, after which vacuum
    reclaims normally.

    The ref is written BEFORE the destination becomes readable, so
    there is no window where a vacuum could race the clone into
    existence. The ref id is deterministic in the destination path, so
    a CRASHED attempt (ref written, `_shallow.json` not yet) converges
    on retry — the retry overwrites the orphan ref instead of leaking
    one per attempt. A LIVE clone (destination already holds
    `_shallow.json`) is refused like any taken destination: re-pointing
    an existing clone is `repin_shallow_clone` / `sync_shallow_clone`'s
    job, not a re-clone's.

    Contract differences vs the deep clone (both tested):
    - the shallow clone is a READ-ONLY pinned view: publish_append /
      branches at the clone base are not supported (the deep clone is
      the way to fork a writable lineage);
    - a shallow clone OF a shallow clone re-points at the ultimate
      source (refs never chain, so releasing an intermediate clone
      cannot strand a grand-clone).

    Trade-off at 100 TB: deep clone = pay the bytes once, then total
    independence; shallow clone = free until the source's retention
    pressure matters — the standard dev/test-against-prod-snapshot and
    short-lived-experiment shape. Returns the pinned version."""
    import hashlib
    import json

    from .sources import lakefs

    src = src_base.rstrip("/")
    dest = dest_base.rstrip("/")
    # shallow-of-shallow: chase to the ultimate source and ITS pin
    src_meta = _shallow_meta(spark, src)
    if src_meta is not None:
        if version is None:
            version = int(src_meta["version"])
        src = src_meta["src"].rstrip("/")
    if version is None:
        version = int(lakefs.read_text(spark, f"{src}/LATEST").strip())
    if not lakefs.exists(spark, f"{src}/v={version}/_manifest.json"):
        raise ValueError(f"source has no v={version} to clone")
    if lakefs.exists(spark, dest):
        taken = [
            n
            for n in lakefs.listdir(spark, dest)
            if n in ("LATEST", "STAGED", "_shallow.json")
            or n.startswith(("v=", "BRANCH_"))
        ]
        if taken:
            raise ValueError(
                f"clone destination {dest} already holds dataset state "
                f"{sorted(taken)[:4]} — a clone must import into a fresh "
                "base, not splice into an existing lineage"
            )
    vers = sorted(_ancestors(spark, src, version))
    files = {
        str(v): lakefs.walk_files(spark, f"{src}/v={v}") for v in vers
    }
    ref_id = hashlib.md5(dest.encode()).hexdigest()[:12]
    ref = {
        "dest": dest,
        "version": version,
        "versions": vers,
        "files": files,
    }
    # ledger entry FIRST (vacuum must see the pin before any reader
    # depends on it), then the redirection record
    lakefs.mkdirs(spark, f"{src}/_refs")
    lakefs.write_text(
        spark, f"{src}/_refs/shallow-{ref_id}.json", json.dumps(ref)
    )
    lakefs.mkdirs(spark, dest)
    lakefs.write_text(
        spark,
        f"{dest}/_shallow.json",
        json.dumps({"src": src, "version": version, "ref_id": ref_id}),
    )
    return version


def repin_shallow_clone(
    spark: SparkSession, dest_base: str, version: int | None = None
) -> int:
    """Move a shallow clone's pin to another source version (default:
    the source's current LATEST) — the shallow analogue of sync_clone,
    at O(chain) manifest reads and zero data bytes (the clone IS a
    pointer). Works forward (replica refresh) and backward (time
    travel), since a shallow clone has no local writes by construction
    (every lineage mutator refuses at a `_shallow.json` base).

    Crash-safe ledger ordering — the pinned lineage must never be
    unprotected while any reader could still resolve it:
    1. overwrite the ref with the UNION of the old and new ancestor
       sets (single PUT; both lineages protected),
    2. flip `_shallow.json` to the new pin,
    3. shrink the ref to the new set only.
    A crash after (1) or (2) leaves a SUPERSET-protective ref — safe,
    merely retentive; re-running repin converges. Returns the new
    pinned version."""
    import hashlib
    import json

    from .sources import lakefs

    dest = dest_base.rstrip("/")
    meta = _shallow_meta(spark, dest)
    if meta is None:
        raise ValueError(f"{dest} is not a shallow clone (no _shallow.json)")
    src = meta["src"].rstrip("/")
    if version is None:
        version = int(lakefs.read_text(spark, f"{src}/LATEST").strip())
    if not lakefs.exists(spark, f"{src}/v={version}/_manifest.json"):
        raise ValueError(f"source has no v={version} to repin to")
    ref_id = meta.get("ref_id") or hashlib.md5(dest.encode()).hexdigest()[:12]
    ref_path = f"{src}/_refs/shallow-{ref_id}.json"
    old_ref = {}
    if lakefs.exists(spark, ref_path):
        old_ref = json.loads(lakefs.read_text(spark, ref_path))
    new_vers = sorted(_ancestors(spark, src, version))
    new_files = {
        str(v): lakefs.walk_files(spark, f"{src}/v={v}") for v in new_vers
    }
    union_vers = sorted(
        set(int(v) for v in old_ref.get("versions", [])) | set(new_vers)
    )
    union_files = dict(old_ref.get("files") or {})
    union_files.update(new_files)
    base_ref = {"dest": dest, "version": version}
    lakefs.write_text(
        spark, ref_path,
        json.dumps({**base_ref, "versions": union_vers, "files": union_files}),
    )
    lakefs.write_text(
        spark,
        f"{dest}/_shallow.json",
        json.dumps({"src": src, "version": version, "ref_id": ref_id}),
    )
    lakefs.write_text(
        spark, ref_path,
        json.dumps({**base_ref, "versions": new_vers, "files": new_files}),
    )
    return version


def sync_shallow_clone(
    spark: SparkSession, dest_base: str, version: int | None = None
) -> int:
    """FAST-FORWARD a shallow clone — the shallow analogue of
    `sync_clone`, completing the clone-maintenance matrix (deep+initial
    = clone_snapshot, deep+refresh = sync_clone, shallow+initial =
    shallow_clone_snapshot, shallow+refresh = this). Cost is O(chain)
    manifest reads and zero data bytes: a "sync" of a pointer is a
    guarded re-point.

    Same legality rule as sync_clone, adapted to a pin instead of a
    copied head: the new version (default: the source's LATEST) must
    carry the CURRENT pin in its lineage history (_lineage_history —
    append-parent + MOR-parent + compacted_from, vacuumed numbers
    retained). A source whose history was rewritten out from under the
    pin (e.g. the lineage was re-published from scratch, so the pinned
    version number now names an unrelated commit) is refused rather
    than silently re-pointed — the caller chose a pin for
    reproducibility; moving it across a lineage break needs the
    explicit `repin_shallow_clone`, which imposes no ancestry rule
    (time travel backward, jumps across rewrites).

    Refuses a sync BACKWARD (new version already in the current pin's
    own history but not equal to it) for the same reason sync_clone
    only fast-forwards; a no-op sync (already at `version`) returns the
    pin unchanged. The ledger update inherits repin's crash-safe
    superset-first ordering. Returns the new pinned version."""
    from .sources import lakefs

    dest = dest_base.rstrip("/")
    meta = _shallow_meta(spark, dest)
    if meta is None:
        raise ValueError(f"{dest} is not a shallow clone (no _shallow.json)")
    src = meta["src"].rstrip("/")
    pin = int(meta["version"])
    if version is None:
        version = int(lakefs.read_text(spark, f"{src}/LATEST").strip())
    if version == pin:
        return pin  # already current — no-op
    if not lakefs.exists(spark, f"{src}/v={version}/_manifest.json"):
        raise ValueError(f"source has no v={version} to sync to")
    if pin not in _lineage_history(spark, src, version):
        raise ValueError(
            f"shallow clone at {dest} pins v={pin}, which is not on the "
            f"history of source v={version} — not a fast-forward (source "
            "lineage rewritten, or target precedes the pin); use "
            "repin_shallow_clone to move the pin explicitly"
        )
    return repin_shallow_clone(spark, dest, version)


def release_shallow_clone(spark: SparkSession, dest_base: str) -> None:
    """Drop a shallow clone's ledger ref (the source becomes free to
    vacuum the pinned versions) and its redirection record. The caller
    removes the (now empty) destination directory if desired."""
    from .sources import lakefs

    dest = dest_base.rstrip("/")
    meta = _shallow_meta(spark, dest)
    if meta is None:
        raise ValueError(f"{dest} is not a shallow clone (no _shallow.json)")
    lakefs.delete(
        spark, f"{meta['src'].rstrip('/')}/_refs/shallow-{meta['ref_id']}.json"
    )
    lakefs.delete(spark, f"{dest}/_shallow.json")


def _ref_pinned_versions(spark: SparkSession, base: str) -> set[int]:
    """Every version pinned by the clone-ref ledger at `base`."""
    import json

    from .sources import lakefs

    pinned: set[int] = set()
    for name in lakefs.listdir(spark, f"{base}/_refs"):
        if not name.endswith(".json"):
            continue
        ref = json.loads(lakefs.read_text(spark, f"{base}/_refs/{name}"))
        pinned.update(int(v) for v in ref.get("versions", []))
    return pinned


def clone_refcounts(spark: SparkSession, src_base: str) -> dict[str, int]:
    """Per-file reference counts derived from the ledger: how many
    live shallow clones read each `v=N/<file>` of the source. The
    vacuum-protection predicate is `count > 0` at version granularity;
    the per-file ledger is what an object-store GC with sub-version
    granularity (file-level compaction) would consume."""
    import json

    from .sources import lakefs

    base = src_base.rstrip("/")
    counts: dict[str, int] = {}
    for name in lakefs.listdir(spark, f"{base}/_refs"):
        if not name.endswith(".json"):
            continue
        ref = json.loads(lakefs.read_text(spark, f"{base}/_refs/{name}"))
        for v, names in (ref.get("files") or {}).items():
            for fname in names:
                key = f"v={v}/{fname}"
                counts[key] = counts.get(key, 0) + 1
    return counts


def clone_table_set(
    spark: SparkSession,
    sources: dict[str, tuple[str, int | None]],
    dest_root: str,
) -> dict[str, int]:
    """CONSISTENT multi-table clone: clone several versioned datasets
    in one operation, pinning each at a caller-chosen version (None =
    its LATEST, resolved ONCE up front) — the cross-dataset complement
    of `publish_snapshot` (which co-publishes tables into one store;
    this exports already-independent stores as one frozen set). The
    canonical use: freeze the exact {fact@12, dim@7, labels@3} an
    experiment trained on, immune to every source's later compaction,
    vacuum, or publish.

    All-or-nothing discipline: every precondition (fresh destination,
    existing source version) is checked BEFORE the first byte copies;
    if a copy still fails midway, the already-created destination
    tables are removed (best-effort rollback — the set manifest is
    written LAST, so a torn clone set is never observable as complete).
    `dest_root/_CLONE_SET.json` records the pinned versions; each
    member is a full first-class clone (sync_clone can refresh them
    individually, though a refreshed member is by definition no longer
    the frozen set — the manifest keeps the original pins).

    Returns {table: pinned_version}."""
    import json

    from .sources import lakefs

    root = dest_root.rstrip("/")
    if lakefs.exists(spark, f"{root}/_CLONE_SET.json"):
        raise ValueError(f"{root} already holds a clone set")
    pinned: dict[str, int] = {}
    for name, (src_base, version) in sources.items():
        src = src_base.rstrip("/")
        v = version
        if v is None:
            v = int(lakefs.read_text(spark, f"{src}/LATEST").strip())
        if not lakefs.exists(spark, f"{src}/v={v}/_manifest.json"):
            raise ValueError(f"table {name!r}: source has no v={v}")
        dest = f"{root}/{name}"
        if lakefs.exists(spark, dest):
            taken = [
                n
                for n in lakefs.listdir(spark, dest)
                if n in ("LATEST", "STAGED") or n.startswith(("v=", "BRANCH_"))
            ]
            if taken:
                raise ValueError(
                    f"table {name!r}: destination {dest} already holds "
                    "dataset state — clone sets need a fresh root"
                )
        pinned[name] = v
    done: list[str] = []
    try:
        for name, (src_base, _v) in sources.items():
            clone_snapshot(
                spark, src_base, f"{root}/{name}", version=pinned[name]
            )
            done.append(name)
    except BaseException:
        for name in done:
            lakefs.delete(spark, f"{root}/{name}")
        raise
    lakefs.write_text(
        spark, f"{root}/_CLONE_SET.json", json.dumps({"tables": pinned})
    )
    return pinned


def read_clone_set(spark: SparkSession, dest_root: str):
    """({table: DataFrame}, {table: pinned_version}) for a clone set —
    every table resolves at its frozen pin (the member's own LATEST,
    which clone_snapshot pointed at the pinned version)."""
    import json

    from .sources import lakefs

    root = dest_root.rstrip("/")
    pins = json.loads(
        lakefs.read_text(spark, f"{root}/_CLONE_SET.json")
    )["tables"]
    out = {}
    for name, v in pins.items():
        df, _chain = read_version_chain(spark, f"{root}/{name}", int(v))
        out[name] = df
    return out, pins
