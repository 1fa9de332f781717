"""ALLOWED_LATENESS firing semantics — reference
`src/Storages/WindowView/StorageWindowView.h:88-101`:

  - default: elements behind the watermark are DROPPED;
  - with ALLOWED_LATENESS, the view "fires immediately when encountering
    late events; thus, it will result in multiple outputs for the same
    window. Users need to take these duplicated results into account."

Spark analog (documented in streaming/windows.py, pinned executable here):
`update` output mode with a watermark — a late-but-within-watermark row
re-fires its window with an updated partial result (one output per trigger
that changes the window ⇒ duplicated results per window, the reference's
contract), and a row behind the watermark is dropped. The test drives one
file-source stream through four availableNow runs against the SAME
checkpoint (state and watermark carry across restarts), collecting what
each run emits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _run_update(spark, src, ckpt, out_name):
    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )
    emitted: list[tuple[int, int]] = []

    def sink(batch, _bid):
        emitted.extend((r.w_start.minute, r.n) for r in batch.collect())

    # foreachBatch (memory sink can't recover from a checkpoint, and the
    # carried-over checkpoint IS the point: state + watermark survive runs)
    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return set(emitted)


def _write(spark, src, minutes):
    pdf = pd.DataFrame(
        {"ts": [pd.Timestamp(f"2024-01-01 10:{m:02d}:00") for m in minutes],
         "v": list(range(len(minutes)))}
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)


def test_allowed_lateness_update_mode(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # run 1: two rows in window [10:00,10:05) → first firing, n=2
    _write(spark, src, [1, 2])
    got1 = _run_update(spark, src, ckpt, "al_run1")
    assert got1 == {(0, 2)}

    # run 2: a LATE row (10:03) still within the 10-minute lateness →
    # the same window fires AGAIN with the updated count (n=3). This is the
    # reference's "multiple outputs for the same window".
    _write(spark, src, [3])
    got2 = _run_update(spark, src, ckpt, "al_run2")
    assert got2 == {(0, 3)}

    # run 3: 10:59 advances the watermark far past the window's end,
    # finalizing it (own window fires once).
    _write(spark, src, [59])
    got3 = _run_update(spark, src, ckpt, "al_run3")
    assert got3 == {(55, 1)}

    # run 4: 10:04 is now BEHIND the watermark (10:49) → dropped, the
    # closed window does NOT re-fire (default drop semantics for
    # beyond-lateness events).
    _write(spark, src, [4])
    got4 = _run_update(spark, src, ckpt, "al_run4")
    assert got4 == set()


def test_tz_normalize_nested(spark, tmp_path):
    """catalog normalizes TIMESTAMP_NTZ recursively — nested struct/array
    timestamp fields can't slip through uncast (latent-risk item from the
    r2 review)."""
    import pandas as pd

    from myscaledb_spark.catalog import load_table

    pdf = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01 10:00:00")], "v": [1]})
    df = spark.createDataFrame(pdf)
    nested = df.select(
        F.struct(F.col("ts").cast("timestamp_ntz").alias("inner_ts"), "v").alias("s"),
        F.array(F.col("ts").cast("timestamp_ntz")).alias("arr"),
        F.col("ts").cast("timestamp_ntz"),
    )
    sf = str(tmp_path)
    nested.write.mode("overwrite").parquet(f"{sf}/nested.parquet")
    out = load_table(spark, sf, "nested")
    types = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert types["ts"] == "timestamp"
    assert "timestamp_ntz" not in types["s"] and "timestamp" in types["s"]
    assert types["arr"] == "array<timestamp>"
    row = out.first()
    assert row.s.inner_ts == row.ts == row.arr[0]
