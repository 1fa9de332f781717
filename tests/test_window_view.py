"""CREATE WINDOW VIEW DDL end-to-end (r5 VERDICT ask #8).

Reference: src/Storages/WindowView/StorageWindowView.h:21-93 — tumble/hop
windowed aggregates over a streamed source, fired into a TO target.  The
DDL routes through ch_script; the source is a real file-source readStream;
the sink contents are compared against a plain batch aggregate oracle.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.plans.table_ddl import ch_script
from myscaledb_spark.streaming.window_view import register_stream_source

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def events_dir(tmp_path, spark):
    # file-source streams need a directory containing only the source files
    p = str(tmp_path / "wv_events")
    spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).write.parquet(p)
    return p


def test_create_window_view_tumble(spark, events_dir):
    register_stream_source("wv_src", events_dir)
    out = ch_script(
        spark,
        """
        CREATE WINDOW VIEW wv_hourly TO wv_tgt AS
        SELECT tumble(ts, INTERVAL 1 HOUR) AS w, count(*) AS n,
               round(sum(value), 4) AS total
        FROM wv_src GROUP BY w;
        SELECT * FROM wv_tgt
        """,
    )
    got = {
        (r.w_start, r.n, r.total)
        for r in out.select("w_start", "n", "total").collect()
    }
    oracle = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("w_start"), "n", "total")
    )
    want = {(r.w_start, r.n, r.total) for r in oracle.collect()}
    assert got == want and len(got) > 0


def test_create_window_view_hop_keys_watermark(spark, events_dir):
    register_stream_source("wv_src2", events_dir)
    out = ch_script(
        spark,
        """
        CREATE WINDOW VIEW wv_hop TO wv_hop_tgt
        WATERMARK=BOUNDED(INTERVAL 1 HOUR) AS
        SELECT hop(ts, INTERVAL 1 HOUR, INTERVAL 2 HOUR) AS w,
               event_type, count(*) AS n
        FROM wv_src2 GROUP BY w, event_type;
        SELECT * FROM wv_hop_tgt
        """,
    )
    got = {
        (r.w_start, r.event_type, r.n)
        for r in out.select("w_start", "event_type", "n").collect()
    }
    # batch oracle: hop(slide=1h, size=2h) = window(size=2h, slide=1h)
    oracle = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    want = {(r.w_start, r.event_type, r.n) for r in oracle.collect()}
    assert got == want and len(got) > 0


def test_window_view_requires_registered_source(spark):
    from myscaledb_spark.sql_dialect import ChSqlError

    with pytest.raises(ChSqlError, match="stream directory"):
        ch_script(
            spark,
            "CREATE WINDOW VIEW wv_x AS SELECT tumble(ts, INTERVAL 1 HOUR) "
            "AS w, count(*) AS n FROM nope_src GROUP BY w",
        )
