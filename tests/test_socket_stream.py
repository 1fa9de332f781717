"""Network streaming source end-to-end: Spark's socket source is the
in-container analog of the Kafka path (registerStorages.cpp:63-88 streaming
engines) — readStream.format(...) → event-time tumbling window → sink is
the identical code shape; only the format string changes on a cluster with
the Kafka connector jar."""

from __future__ import annotations

import socketserver
import threading
import time

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.streaming.windows import tumble

LINES = [
    "2026-01-01 00:05:00,a",
    "2026-01-01 00:15:00,a",
    "2026-01-01 00:35:00,b",
    "2026-01-01 01:10:00,a",
    "2026-01-01 01:20:00,b",
]


class _Feeder(socketserver.BaseRequestHandler):
    def handle(self):
        payload = ("\n".join(LINES) + "\n").encode()
        self.request.sendall(payload)
        # keep the connection open so the source doesn't restart mid-batch
        time.sleep(20)


@pytest.fixture()
def feeder_port():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Feeder)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv.server_address[1]
    finally:
        srv.shutdown()
        srv.server_close()


def test_socket_source_tumbling_window(spark, feeder_port):
    # readStream over a real network socket — parse event time, hourly
    # tumble, count per (window, key); complete mode into a memory sink
    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", str(feeder_port))
        .load()
    )
    parsed = raw.select(
        F.to_timestamp(F.split("value", ",")[0]).alias("ts"),
        F.split("value", ",")[1].alias("k"),
    )
    agg = parsed.groupBy(tumble("ts", "1 hour").alias("w"), "k").agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sock_counts")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        want = {("00", "a"): 2, ("00", "b"): 1, ("01", "a"): 1, ("01", "b"): 1}
        got = {}
        while time.time() < deadline:
            rows = spark.sql("SELECT w, k, n FROM sock_counts").collect()
            got = {(r.w.start.strftime("%H"), r.k): r.n for r in rows}
            if got == want:
                break
            time.sleep(1)
        assert got == want
    finally:
        q.stop()
