"""Streaming source over the versioned lake with DATA SKIPPING: tails
an append chain (pipelines.publish_append) version by version and
prunes each new segment's files by the per-file min/max stats recorded
in its manifest BEFORE any row is ingested — the stream-side twin of
`read_chain_pruned` (SURVEY.md §8 round-5 item: the batch path pruned,
the streaming source did not).

Built on the Python DataSource API's SimpleDataSourceStreamReader: the
offset is simply the newest PROCESSED version number, so replay is
deterministic for free — versions are immutable, `readBetweenOffsets`
re-reads exactly the segments in (start, end], giving exactly-once
output across crash/restart with no source-side buffering (same
replayable-cursor shape as sources/synthetic.py). Compaction commits
(manifests carrying `compacted_from`) are skipped: their rows were
already emitted as the segments they rewrote, so a compaction never
re-floods the stream.

At 100 TB the pruning decision is O(files-in-new-segment) driver-side
manifest JSON per micro-batch — files whose [min, max] cannot
intersect the configured range are never opened, so a stream consumer
interested in one key range pays for the answer, not the append
volume. Row-level residual filtering still applies (a surviving file
can hold out-of-range rows).

Local note: reads go through pyarrow on the driver (the
SimpleDataSourceStreamReader contract prefetches there), which bounds
per-batch volume — right for control-plane-sized tails (the pruned
range), not full-table replication; for the latter use the batch
chain readers per micro-batch (streaming/cdc.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType



def _read_manifest(base: str, version: int) -> dict:
    path = os.path.join(base, f"v={version}", "_manifest.json")
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        raise RuntimeError(
            f"lake stream offset points at v={version} of {base}, which no "
            "longer exists (vacuumed) — the retention window has passed "
            "this checkpoint; restart with a fresh checkpoint to "
            "resubscribe from the current snapshot"
        ) from None


def _chain_base(base: str, head: int) -> int:
    """Oldest member of the chain ending at `head` (follow parent links
    while segments are appends) — the full-snapshot boundary a FRESH
    stream must start from: starting at v=0 would walk vacuumed history
    and, on a compacted chain, skip the compaction commit that now
    CARRIES the base data a first-time consumer has never seen."""
    v = head
    while True:
        m = _read_manifest(base, v)
        if m.get("mor_delete") or m.get("pos_delete"):
            # a merge-on-read head means the CURRENT table state needs a
            # subtraction an append-only stream cannot express — a fresh
            # subscriber would either miss the base data (the vector
            # commit holds no files) or receive deleted rows. Refuse
            # loudly; materialization produces a clean snapshot commit.
            raise RuntimeError(
                f"lake stream cannot subscribe at v={v} of {base}: it is "
                "a merge-on-read delete layer — run materialize_mor "
                "first (existing subscribers are unaffected: vector "
                "commits emit no rows, and the materialization commit "
                "is marked compacted_from so it never re-floods)"
            )
        parent = m.get("parent") if m.get("append") else None
        if parent is None:
            return v
        v = parent


def _latest(base: str, branch: str | None = None) -> int:
    """Head version of LATEST or of a named branch (pipelines.
    create_branch) — tailing a branch lets a consumer follow an
    experimental recipe's commits without seeing main, and vice versa."""
    pointer = "LATEST" if branch is None else f"BRANCH_{branch}"
    with open(os.path.join(base, pointer)) as f:
        return int(f.read().strip())


def _manifest_schema(m: dict) -> StructType:
    return StructType.fromJson(json.loads(m["schema_json"]))


def _ancestor_set(base: str, head: int) -> set[int]:
    """Versions on the history of `head` (append-parent, MOR-parent,
    and `compacted_from` links, head included). The offset cursor walks
    version NUMBERS, which are globally unique but INTERLEAVED once
    named branches (or orphaned WAP candidates) exist — emission must
    restrict to the subscribed line's own ancestry or a main subscriber
    would ingest branch commits that happen to carry higher numbers.

    `compacted_from` MUST be traversed: a compaction commit carries no
    parent link, so without it the segments it folded (and their
    ancestry) would fall out of this set — a subscriber whose cursor
    lags the compaction would then skip the un-emitted appends AND the
    compaction commit itself, advance its offset past both, and lose
    those rows permanently. Superseded-but-same-line versions stay
    emittable to lagging subscribers; branch/WAP-orphan versions stay
    excluded. O(chain) driver-side manifest JSON per batch."""
    out: set[int] = set()
    todo = [head]
    while todo:
        v = todo.pop()
        if v in out:
            continue
        out.add(v)
        try:
            m = _read_manifest(base, v)
        except RuntimeError:
            # a folded segment already reclaimed by vacuum: keep the
            # version IN the set so a lagging subscriber that still
            # needs it hits _read_manifest's explicit vacuumed-offset
            # error in _emit (loud retention-window failure) instead of
            # silently treating it as another branch's commit
            continue
        if m.get("append") and m.get("parent") is not None:
            todo.append(int(m["parent"]))
        rec = m.get("mor_delete") or m.get("pos_delete")
        if rec:
            todo.append(int(rec["parent"]))
        for fv in m.get("compacted_from") or []:
            todo.append(int(fv))
    return out


def _segment_files(base: str, version: int) -> list[str]:
    """Version-relative data-file paths, recursing into hive partition
    directories (`col=value/part-*.parquet`) — a partition-evolved
    segment's rows live one level down, and a flat listing would
    silently emit nothing for it."""
    vdir = os.path.join(base, f"v={version}")
    out: list[str] = []
    stack = [""]
    while stack:
        rel = stack.pop()
        cur = os.path.join(vdir, rel) if rel else vdir
        for n in os.listdir(cur):
            if n.startswith(("_", ".")):
                continue
            sub = os.path.join(rel, n) if rel else n
            if n.endswith(".parquet"):
                out.append(sub)
            elif os.path.isdir(os.path.join(cur, n)):
                stack.append(sub)
    return sorted(out)


class LakeChainStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, schema: StructType):
        # the stream's schema is FIXED at query start (the head
        # segment's manifest schema): pre-evolution segments NULL-pad
        # missing columns, later-evolved extras are dropped — replay of
        # any offset interval emits identical tuples
        self.schema_names = [f.name for f in schema.fields]
        self.base = options["path"].rstrip("/")
        self.branch = options.get("branch")
        self.col = options.get("col")
        self.lo = options.get("lo")
        self.hi = options.get("hi")
        self.prune_log = options.get("prune_log")
        # admission control (the maxFilesPerTrigger analogue): cap how
        # many chain versions one micro-batch may span, so a subscriber
        # catching up after downtime ingests the backlog in bounded
        # batches (bounded executor memory / sink transaction size)
        # instead of one giant batch. Replay stays exactly-once: the
        # cap only moves the END offset; readBetweenOffsets re-reads
        # recorded intervals verbatim.
        mv = options.get("max_versions_per_trigger")
        self.max_versions = None if mv is None else int(mv)
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("max_versions_per_trigger must be >= 1")
        # row-based admission control: cap each micro-batch's cumulative
        # manifest `rows` over the versions it would emit — the finer
        # dial when segment sizes vary (a version cap admits whatever a
        # giant backfill segment holds; a row cap does not). A single
        # over-cap segment still admits alone (progress guarantee) —
        # versions are the atomic replay unit, so they never split.
        mr = options.get("max_rows_per_trigger")
        self.max_rows = None if mr is None else int(mr)
        if self.max_rows is not None and self.max_rows < 1:
            raise ValueError("max_rows_per_trigger must be >= 1")
        # stats min/max compare as the column's Python type; options
        # arrive as strings — coerce numerics when they parse
        for attr in ("lo", "hi"):
            v = getattr(self, attr)
            if v is not None:
                try:
                    setattr(self, attr, int(v))
                except ValueError:
                    try:
                        setattr(self, attr, float(v))
                    except ValueError:
                        pass

    def initialOffset(self) -> dict:
        # subscribe at the current chain's base: the base snapshot
        # (original publish OR compaction rewrite) is emitted as the
        # first batch, appends follow; vacuumed pre-base history is
        # never walked. `emit_base` marks this a FRESH subscription —
        # the offset number alone cannot distinguish "subscribed after
        # the compaction" (must emit the rewrite commit, it carries base
        # data this consumer never saw) from "processed the segments the
        # compaction rewrote" (must skip it); the flag rides the offset
        # so crash-replay of the first batch stays deterministic.
        return {
            "version": _chain_base(
                self.base, _latest(self.base, self.branch)
            ) - 1,
            "emit_base": True,
        }

    def read(self, start: dict):
        head = _latest(self.base, self.branch)
        if self.max_versions is not None and head > start["version"]:
            # Admission cap composed with line subscription: the cap
            # counts versions ON THE SUBSCRIBED LINE and the capped
            # head must itself BE an in-line version. Capping by raw
            # number arithmetic (start + N) would be wrong twice once
            # histories interleave (named branches, WAP orphans): the
            # capped number can belong to ANOTHER line, and both
            # _emit and readBetweenOffsets derive the ancestry filter
            # from the END version — a main subscriber would ingest a
            # branch's commit and permanently skip its own, and a
            # checkpoint replay would reproduce a different batch than
            # the original (exactly-once broken). Committing only
            # in-line end versions keeps every offset's ancestry
            # self-describing, so replay-from-offsets is stable.
            allowed = _ancestor_set(self.base, head)
            n = 0
            capped = start["version"]
            for v in range(start["version"] + 1, head + 1):
                capped = v
                if v in allowed:
                    n += 1
                    if n >= self.max_versions:
                        break
            head = capped
        if self.max_rows is not None and head > start["version"]:
            head = self._cap_rows(
                start["version"], head, start.get("emit_base", False)
            )
        # iter(): the runner's prefetch cache (datasource_internal.
        # add_result_to_cache) consumes the rows with next(); a bare
        # list satisfies the simple path but not the cached one
        return (
            iter(
                self._emit(
                    start["version"], head, start.get("emit_base", False)
                )
            ),
            {"version": head},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            self._emit(
                start["version"], end["version"],
                start.get("emit_base", False),
            )
        )

    def _cap_rows(self, after: int, upto: int, emit_base: bool) -> int:
        """Largest end version in (after, upto] whose would-be-emitted
        segments stay within max_rows (manifest row counts — O(span)
        driver-side JSON, no data I/O). Mirrors _emit's skip rules so
        non-emitting versions (other lines, vector commits, already-
        emitted compactions) cost nothing against the budget."""
        allowed = _ancestor_set(self.base, upto)
        cum = 0
        end = after
        for v in range(after + 1, upto + 1):
            rows = 0
            if v in allowed:
                try:
                    m = _read_manifest(self.base, v)
                except RuntimeError:
                    m = None  # vacuumed: _emit will raise loudly
                if m is not None and not (
                    m.get("mor_delete") or m.get("pos_delete")
                ):
                    if "compacted_from" not in m or (
                        emit_base and v == after + 1
                    ):
                        rows = int(m.get("rows") or 0)
            if cum > 0 and rows > 0 and cum + rows > self.max_rows:
                break
            cum += rows
            if v in allowed:
                # only IN-LINE versions may become the committed end:
                # readBetweenOffsets re-derives the ancestry filter
                # from the end version at replay time, so an off-line
                # end would replay a different batch than it emitted
                # (same invariant as the max_versions cap in read())
                end = v
        return end

    def _emit(self, after: int, upto: int, emit_base: bool = False):
        rows: list[tuple] = []
        n_total = n_read = 0
        allowed = _ancestor_set(self.base, upto) if upto > after else set()
        for v in range(after + 1, upto + 1):
            if v not in allowed:
                # a version number from another line of history (named
                # branch, orphaned candidate) — not ours to emit
                continue
            m = _read_manifest(self.base, v)
            if m.get("mor_delete") or m.get("pos_delete"):
                # merge-on-read vector commit: holds no data files, and
                # an append-only stream cannot retract the rows it
                # deletes — a no-op for existing subscribers
                continue
            if "compacted_from" in m and not (emit_base and v == after + 1):
                # rewrite commit: rows already emitted as the segments —
                # EXCEPT when this is a fresh subscription whose start
                # IS the compacted base (see initialOffset)
                continue
            files = _segment_files(self.base, v)
            n_total += len(files)
            keep = self._prune(m, files)
            n_read += len(keep)
            rows.extend(self._read_files(m, v, keep))
        if self.prune_log:
            self._log_prune(n_total, n_read)
        return rows

    def _prune(self, m: dict, files: list[str]) -> list[str]:
        if self.col is None:
            return files
        fs = m.get("file_stats")
        if not fs or self.col not in fs.get("columns", []):
            return files  # no stats: conservative, read everything
        by_name = {f["name"]: f for f in fs["files"]}
        keep = []
        for name in files:
            st = by_name.get(name)
            if st is None:
                keep.append(name)
                continue
            fmin = st["min"].get(self.col)
            fmax = st["max"].get(self.col)
            if fmin is None or fmax is None:
                keep.append(name)
            elif (self.hi is None or fmin <= self.hi) and (
                self.lo is None or fmax >= self.lo
            ):
                keep.append(name)
        return keep

    def _read_files(self, m: dict, version: int, files: list[str]):
        import pyarrow.parquet as pq

        seg_fields = {f.name: f for f in _manifest_schema(m).fields}
        out = []
        vdir = os.path.join(self.base, f"v={version}")
        idx = (
            self.schema_names.index(self.col)
            if self.col in self.schema_names
            else None
        )
        for name in files:
            # hive components of the path carry the partition column's
            # value (it is NOT in the data file) — decode and inject it;
            # components whose name is outside the segment schema (e.g.
            # a synthetic transform column) are layout-only and skipped
            hive_vals: dict[str, object] = {}
            for comp in name.split(os.sep)[:-1]:
                if "=" not in comp:
                    continue
                c, raw = comp.split("=", 1)
                if c not in seg_fields:
                    continue
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    hive_vals[c] = None
                    continue
                kind = seg_fields[c].dataType.simpleString()
                if kind in ("tinyint", "smallint", "int", "bigint"):
                    hive_vals[c] = int(raw)
                elif kind in ("float", "double"):
                    hive_vals[c] = float(raw)
                elif kind == "string":
                    hive_vals[c] = raw
                elif kind == "date":
                    import datetime

                    hive_vals[c] = datetime.date.fromisoformat(raw)
                elif kind == "boolean":
                    hive_vals[c] = raw.lower() == "true"
                elif kind.startswith("decimal"):
                    import decimal

                    hive_vals[c] = decimal.Decimal(raw)
                else:
                    # unhandled partition type (timestamp, binary, …):
                    # injecting the raw directory string into a typed
                    # field would corrupt the fixed stream schema —
                    # emit NULL for this column instead (conservative:
                    # the value is layout metadata we cannot decode)
                    hive_vals[c] = None
            present = [
                n
                for n in self.schema_names
                if n in seg_fields and n not in hive_vals
            ]
            t = pq.read_table(os.path.join(vdir, name), columns=present)
            n_rows = t.num_rows
            by_name = {n: t.column(n).to_pylist() for n in present}
            for c, v in hive_vals.items():
                if c in self.schema_names:
                    by_name[c] = [v] * n_rows
            cols = [
                by_name.get(n, [None] * n_rows) for n in self.schema_names
            ]
            for tup in zip(*cols):
                if idx is not None:
                    val = tup[idx]
                    if val is None:
                        continue
                    if self.lo is not None and val < self.lo:
                        continue
                    if self.hi is not None and val > self.hi:
                        continue
                out.append(tup)
        return out

    def _log_prune(self, n_total: int, n_read: int) -> None:
        """Cumulative pruning evidence for tests/monitoring (driver-side
        control file, same underscore convention as the manifests)."""
        totals = {"files_total": 0, "files_read": 0}
        if os.path.exists(self.prune_log):
            with open(self.prune_log) as f:
                totals = json.load(f)
        totals["files_total"] += n_total
        totals["files_read"] += n_read
        with open(self.prune_log, "w") as f:
            json.dump(totals, f)


class LakeChainStreamSource(DataSource):
    """`spark.readStream.format("lake_chain").option("path", base)
    .option("col", k).option("lo", a).option("hi", b)` — pruned tail of
    a versioned append chain."""

    @classmethod
    def name(cls) -> str:
        return "lake_chain"

    def schema(self) -> StructType:
        base = self.options["path"].rstrip("/")
        head = _read_manifest(base, _latest(base))
        # evolution-safe: emit the HEAD segment's schema; older
        # segments NULL-backfill missing columns at emission
        return _manifest_schema(head)

    def simpleStreamReader(self, schema: StructType):
        return LakeChainStreamReader(self.options, schema)


def register_lake_stream_source(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(LakeChainStreamSource)
