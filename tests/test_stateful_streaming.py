"""Custom stateful streaming operator (applyInPandasWithState): state must
survive across micro-batches and the final per-key totals must equal the
batch oracle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.streaming.windows import stateful_running_totals

from tests.conftest import SF_DIR


def test_state_spans_micro_batches(spark, tmp_path):
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 5)
        .select("event_id", "user_id", "value")
    )
    # two files → maxFilesPerTrigger=1 forces two micro-batches, so per-user
    # state must carry batch 1's totals into batch 2
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    a.coalesce(1).write.parquet(os.path.join(src, "f=a"))
    b.coalesce(1).write.parquet(os.path.join(src, "f=b"))

    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stateful_running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("running_totals").toPandas()

    oracle = {
        r["user_id"]: (r["n"], r["t"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    # update mode emits one row per (user, batch); >1 row proves multi-batch
    assert out.groupby("user_id").size().max() > 1
    final = out.loc[out.groupby("user_id")["n"].idxmax()]
    for _, row in final.iterrows():
        n_exp, t_exp = oracle[row["user_id"]]
        assert row["n"] == n_exp
        assert abs(row["total"] - t_exp) < 1e-6
