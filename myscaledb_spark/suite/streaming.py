"""Streaming suite: WINDOW VIEW semantics (tumble/hop) run through actual
Structured Streaming (file source → availableNow → memory sink), verified
against batch SQL oracles — the stream result must equal the batch result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.suite import register


@register(
    "stream_tumble_hourly",
    """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumble_hourly(spark, sf_dir):
    from myscaledb_spark.streaming.windows import events_stream, run_to_memory, tumble

    stream = events_stream(spark, sf_dir)
    agg = stream.groupBy(
        tumble("ts", "1 hour").alias("w"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    out = run_to_memory(agg, "stream_tumble_hourly")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    )


@register(
    "stream_hop_2h_1h",
    """
    WITH expanded AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) - (k * INTERVAL 1 HOUR) AS window_start,
             value
      FROM events, UNNEST(range(0, 2)) t(k)
    )
    SELECT window_start, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM expanded GROUP BY 1
    """,
)
def stream_hop_2h_1h(spark, sf_dir):
    from myscaledb_spark.streaming.windows import events_stream, hop, run_to_memory

    stream = events_stream(spark, sf_dir)
    agg = stream.groupBy(hop("ts", "1 hour", "2 hours").alias("w")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )
    out = run_to_memory(agg, "stream_hop_2h_1h")
    return out.select(F.col("w.start").alias("window_start"), "n", "total_value")


@register(
    "mv_push_hourly",
    """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def mv_push_hourly(spark, sf_dir):
    """INSERT → materialized-view push chain
    (buildPushingToViewsChain.cpp): every ingested micro-batch is pushed
    through the view transform into its target table; the target holds
    per-batch PARTIAL aggregates (the reference's SummingMergeTree MV
    pattern) which merge on read — so the final re-aggregation is part of
    the operator's contract, not a fixup. Driving the whole chain
    (events_stream → foreachBatch push → parquet target → merge-on-read)
    must reproduce the plain batch oracle exactly."""
    import tempfile

    from myscaledb_spark.streaming.materialized_views import MaterializedViewChain
    from myscaledb_spark.streaming.windows import events_stream, tumble

    base = tempfile.mkdtemp(prefix="gate_mv_")
    target = f"{base}/hourly"
    ckpt = f"{base}/ckpt"

    def hourly(batch):
        return batch.groupBy(
            tumble("ts", "1 hour").alias("w"), F.col("event_type")
        ).agg(F.count(F.lit(1)).alias("n"))

    chain = MaterializedViewChain().add_view("hourly", hourly, target)
    chain.run(events_stream(spark, sf_dir), ckpt)
    mv = MaterializedViewChain.read_view(spark, target)
    return (
        mv.groupBy(F.col("w.start").alias("window_start"), "event_type")
        .agg(F.sum("n").alias("n"))
    )


@register("stream_watermark_append")  # rows-only: late-data semantics differ by design
def stream_watermark_append(spark, sf_dir):
    """BOUNDED watermark (StorageWindowView.h:60-86) — append-mode windowed
    count with a 1h watermark. Late-arrival drop semantics are stream-order
    dependent, so the driver records a rows-only check for this one."""
    from myscaledb_spark.streaming.windows import events_stream, run_to_memory, tumble

    stream = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = stream.groupBy(tumble("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_to_memory(agg, "stream_watermark_append", mode="append")
    return out.select(F.col("w.start").alias("window_start"), "n")
