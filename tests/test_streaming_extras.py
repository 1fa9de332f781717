"""Materialized-view push chain, session windows (beyond-reference
extension), processing-time semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.streaming.materialized_views import MaterializedViewChain
from myscaledb_spark.streaming.windows import events_stream
from tests.conftest import SF_DIR


def test_mv_chain_multi_sink(spark, tmp_path):
    """One ingest → two views materialized (filter view + agg view), each
    equal to the batch-computed equivalent."""
    t_purch = str(tmp_path / "mv_purchases")
    t_hourly = str(tmp_path / "mv_hourly")
    chain = (
        MaterializedViewChain()
        .add_view(
            "purchases",
            lambda df: df.filter(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "value"
            ),
            t_purch,
        )
        .add_view(
            "hourly",
            lambda df: df.groupBy(
                F.date_trunc("hour", "ts").alias("h"), "event_type"
            ).agg(F.count(F.lit(1)).alias("n")),
            t_hourly,
        )
    )
    chain.run(events_stream(spark, SF_DIR), str(tmp_path / "ckpt"))

    ev = spark.table("events")
    want_purch = ev.filter(F.col("event_type") == "purchase").count()
    got_purch = MaterializedViewChain.read_view(spark, t_purch).count()
    assert got_purch == want_purch

    # hourly view appended per-batch partials; summing them equals batch agg
    got_hourly = (
        MaterializedViewChain.read_view(spark, t_hourly)
        .groupBy("h", "event_type")
        .agg(F.sum("n").alias("n"))
    )
    want_hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    a = sorted(map(tuple, got_hourly.collect()))
    b = sorted(map(tuple, want_hourly.collect()))
    assert a == b


def test_session_window_extension(spark):
    """session_window: Spark-native, flagged in SURVEY §2.10 as an extension
    (the reference supports only tumble/hop)."""
    out = (
        spark.table("events")
        .filter(F.col("user_id") < 5)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(out) > 0
    for r in out:
        assert r.w.end > r.w.start
    # sessions of one user don't overlap
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append((r.w.start, r.w.end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1


def test_asof_forward_and_strict(spark):
    """ASOF direction/strictness matrix vs DuckDB-computed expectations."""
    import duckdb
    from myscaledb_spark.operators.relational import asof_join

    ev = spark.table("events").filter(F.col("user_id") < 10).select(
        "event_id", "user_id", "ts"
    )
    o = spark.table("orders").select("o_custkey", "o_orderdate", "o_orderkey")

    # forward: first order with orderdate >= event ts (none exist: orders all
    # before 2024) → inner join must be empty
    fwd = asof_join(
        ev, o, "ts", "o_orderdate", ["user_id"], ["o_custkey"], direction="forward"
    )
    assert fwd.count() == 0

    # backward strict vs non-strict only differ on exact-equal timestamps;
    # none are equal here so both must match DuckDB's ASOF
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    want = {
        r[0]: r[1]
        for r in con.sql(
            """
        SELECT e.event_id, o.o_orderkey
        FROM (SELECT * FROM events WHERE user_id < 10) e
        ASOF JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        """
        ).fetchall()
    }
    for strict in (False, True):
        got = {
            r.event_id: r.o_orderkey
            for r in asof_join(
                ev, o, "ts", "o_orderdate", ["user_id"], ["o_custkey"],
                direction="backward", strict=strict,
            ).collect()
        }
        assert got == want, f"strict={strict}"


def test_processing_time_rate_source(spark, tmp_path):
    """PROCESSING-time windows (tumble(now(), ...) in the reference,
    StorageWindowView.h:60-66): rate source + processing-time trigger."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 50).load()
    )
    agg = stream.groupBy(F.window("timestamp", "1 second").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_proc_time")
        .outputMode("complete")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            if spark.table("rate_proc_time").count() > 0:
                break
            time.sleep(0.5)
        rows = spark.table("rate_proc_time").collect()
        assert len(rows) > 0
        assert all(r.n > 0 for r in rows)
    finally:
        q.stop()


def test_streaming_dedup(spark, tmp_path):
    """Duplicated rows across micro-batches collapse to one within the
    watermark (streaming counterpart of exact_dedup_groups)."""
    import pyspark.sql.functions as F
    from myscaledb_spark.streaming.windows import streaming_dedup

    src = str(tmp_path / "in")
    import os
    os.makedirs(src)
    rows1 = [(1, "a", "2024-01-01 10:00:00"), (2, "b", "2024-01-01 10:01:00")]
    rows2 = [(1, "a", "2024-01-01 10:02:00"), (3, "c", "2024-01-01 10:03:00")]
    spark.createDataFrame(rows1, "id int, payload string, ts_s string").write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(rows2, "id int, payload string, ts_s string").write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("id int, payload string, ts_s string")
        .parquet(src)
        .withColumn("ts", F.to_timestamp("ts_s"))
    )
    deduped = streaming_dedup(stream, ["id"], ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.id for r in spark.table("dedup_sink").collect())
    assert got == [1, 2, 3]  # id=1 duplicate suppressed
