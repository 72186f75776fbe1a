"""Network stream ingest end-to-end: a threaded loopback TCP server
feeds newline-delimited JSON events through Spark's socket source →
schema-enforced parse → watermark + tumbling aggregate → memory sink,
and the result matches the same aggregate computed in batch over the
same events. Malformed lines are counted and dropped, never silently
lost or crashing the query."""

from __future__ import annotations

import json
import socket
import socketserver
import threading
import time

from pyspark.sql import functions as F

from novelti_dingo_spark.sources import load_table
from novelti_dingo_spark.streaming.socket_source import (
    socket_events,
    socket_tumbling_counts,
)


class _Feeder(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True
    payload: list[str] = []


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        for line in self.server.payload:
            self.request.sendall((line + "\n").encode())
        # keep the connection open so the source doesn't see EOF and
        # fail the query mid-test; Spark closes it at query stop
        time.sleep(30)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_socket_json_stream_matches_batch(spark, sf_small):
    events = load_table(spark, sf_small, "events").limit(200)
    rows = events.collect()
    lines = [
        json.dumps(
            {
                "event_id": r.event_id,
                "user_id": r.user_id,
                "event_type": r.event_type,
                "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S.%f"),
                "value": str(r.value),
            }
        )
        for r in rows
    ]
    # two malformed lines: not-JSON and JSON of the wrong shape
    payload = lines[:100] + ["{natural garbage", '{"foo": 1}'] + lines[100:]

    port = _free_port()
    server = _Feeder(("127.0.0.1", port), _Handler)
    server.payload = payload
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    q = None
    try:
        parsed = socket_events(spark, "127.0.0.1", port)
        agg = socket_tumbling_counts(parsed, watermark="10 seconds")
        q = (
            agg.writeStream.format("memory")
            .queryName("sock_counts")
            .outputMode("update")
            .trigger(processingTime="1 second")
            .start()
        )
        # also count corrupt rows through a second query on the same shape
        q2 = (
            parsed.filter(F.col("_corrupt"))
            .writeStream.format("memory")
            .queryName("sock_dead_letter")
            .outputMode("append")
            .start()
        )
        deadline = time.time() + 90
        want = (
            events.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
            )
        )
        want_map = {
            (r.window_start, r.event_type): r.n_events
            for r in want.collect()
        }
        got_map = {}
        while time.time() < deadline:
            got = spark.sql(
                "SELECT window_start, event_type, max(n_events) AS n "
                "FROM sock_counts GROUP BY 1, 2"
            ).collect()
            got_map = {(r.window_start, r.event_type): r.n for r in got}
            dead = spark.sql(
                "SELECT count(*) AS n FROM sock_dead_letter"
            ).head().n
            if got_map == want_map and dead == 2:
                break
            time.sleep(1)
        assert got_map == want_map
        assert (
            spark.sql("SELECT count(*) AS n FROM sock_dead_letter").head().n
            == 2
        )
        q2.stop()
    finally:
        if q is not None:
            q.stop()
        server.shutdown()
        server.server_close()
