"""Structured Streaming surface mirroring the reference's WINDOW VIEW
(`src/Storages/WindowView/StorageWindowView.h:21-93`):

  tumble(t, INTERVAL)        → window(t, size)
  hop(t, slide, size)        → window(t, size, slide)
  WATERMARK BOUNDED(i)       → withWatermark(t, i)
  ALLOWED_LATENESS           → `update` output mode: a late-but-in-watermark
                               row re-fires its window with the updated
                               partial result (multiple outputs per window,
                               StorageWindowView.h:88-101); beyond-watermark
                               rows are dropped. Pinned executable in
                               tests/test_allowed_lateness.py.
  Kafka/FileLog engines      → readStream sources (file source here; kafka
                               format is available on clusters with the
                               kafka connector jar)
  TO target table            → writeStream.toTable / memory sink

The reference fires windows continuously on inserts; Spark's availableNow
trigger gives the same results batch-deterministically (every window emitted
in `complete` mode), which is what the correctness oracle checks. At scale
the same code runs against Kafka with a real trigger + watermark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        # events.parquet stores ts as naive timestamp[us]
        # (isAdjustedToUTC=false) → TIMESTAMP_NTZ in Spark 4.
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def tumble(ts: Column | str, size: str) -> Column:
    """tumble(t, INTERVAL x) → non-overlapping windows (StorageWindowView.h:26)."""
    return F.window(ts, size)


def hop(ts: Column | str, slide: str, size: str) -> Column:
    """hop(t, slide, size) → overlapping windows (StorageWindowView.h:39-51).
    NB reference arg order is (slide, size); Spark's is (size, slide)."""
    return F.window(ts, size, slide)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (≈ FileLog engine).

    `ts` is read as TIMESTAMP_NTZ (matching the parquet's naive
    timestamp[us]) and normalized to TIMESTAMP, mirroring
    catalog.load_table so batch and streaming agree bit-for-bit — the
    session tz is UTC, so the cast is value-preserving.
    """
    # file source requires a directory; glob-filter to the events file
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_memory(df: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) into a memory
    sink and return the materialized result table."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    return spark.table(name)


def stateful_running_totals(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState`` —
    per-key running (count, sum(value)) carried in explicit group state
    across micro-batches.

    This is the escape hatch for operators Spark's built-in streaming aggs
    can't express (reference analog: a custom stateful transform keeping
    block-spanning state, e.g. AggregatingTransform's aggregate states,
    `src/Processors/Transforms/AggregatingTransform.h`). State lives in the
    state store (per-key, checkpointed, partitioned by the grouping key), so
    a 1000-executor cluster shards it like any keyed aggregation; the pandas
    hop is per-group-per-batch, not per-row.

    Built-in aggregations stay the right tool for plain running totals —
    this exists to pin the API shape (schema, state round-trip, update mode)
    for genuinely custom state machines.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key: [key_tuple[0]], "n": [n], "total": [total]}
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=f"{key} long, n long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the continuous-ingestion counterpart of the
    batch dedup family (operators/dedup.py): dropDuplicates keyed on content
    hash / ids, state-bounded by a watermark so 100 TB/day streams don't
    grow dedup state forever (late duplicates beyond the watermark pass
    through, the documented tradeoff; reference analog: ReplacingMergeTree
    dedup-on-merge which is similarly eventual).

    With ts_col: dropDuplicatesWithinWatermark(keys) — duplicates are
    suppressed while their key is within the watermark window. Without:
    unbounded-state exact dedup (only for bounded backfills).
    """
    if ts_col is None:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
