"""Approximate-aggregate contracts (documented estimator deltas) + streaming
incremental index maintenance (§3.3 write path analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.functions import ch_compat as ch


def test_uniq_within_tolerance(spark):
    """uniq (HLL++) must be within its documented rsd of exact."""
    got = (
        spark.table("lineitem")
        .agg(
            ch.uniq("l_partkey").alias("approx"),
            ch.uniqExact("l_partkey").alias("exact"),
            ch.uniqCombined("l_orderkey").alias("approx2"),
            ch.uniqExact("l_orderkey").alias("exact2"),
        )
        .first()
    )
    assert abs(got.approx - got.exact) / got.exact < 0.1
    assert abs(got.approx2 - got.exact2) / got.exact2 < 0.05  # rsd 0.01 config


def test_quantile_tdigest_near_exact(spark):
    r = (
        spark.table("lineitem")
        .agg(
            ch.quantileTDigest("l_extendedprice", 0.5).alias("approx"),
            ch.quantileExact("l_extendedprice", 0.5).alias("exact"),
        )
        .first()
    )
    assert r.approx == pytest.approx(r.exact, rel=0.05)


def test_streaming_fts_maintenance(spark, tmp_path):
    """Ingest events-style docs via a stream; foreachBatch appends to the FTS
    index (≈ VIBuilderUpdater building on freshly inserted parts); final
    index-backed search equals the direct batch computation."""
    from myscaledb_spark.functions.text import text_search
    from myscaledb_spark.plans.fts_index import (
        append_to_fts_index,
        build_fts_index,
        fts_search,
    )
    from myscaledb_spark.streaming.windows import EVENTS_SCHEMA  # noqa: F401
    from tests.conftest import SF_DIR

    art = str(tmp_path / "fts_stream")
    docs = spark.table("documents")
    # seed the index with an empty-ish bootstrap (first 1 doc), then stream
    # the rest in two micro-batches via foreachBatch
    build_fts_index(docs.filter(F.col("doc_id") == 0), "text", "doc_id", art)

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )

    def ingest(batch, batch_id):
        newdocs = batch.filter(F.col("doc_id") != 0)
        if newdocs.count() > 0:
            append_to_fts_index(newdocs, "text", "doc_id", art)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    via_index = fts_search(spark, art, "vector search fast", 10).collect()
    direct = (
        text_search(docs, "text", "vector search fast", 10, id_col="doc_id")
        .select("doc_id", "bm25_score")
        .collect()
    )
    assert [(r.doc_id, round(r.bm25_score, 9)) for r in via_index] == [
        (r.doc_id, round(r.bm25_score, 9)) for r in direct
    ]


def test_tdigest_grouped_partial_equals_single_quality(spark):
    """r8: tdigest_quantiles_by mode='partial' (map-side partial digests,
    centroid-only shuffle — the 100 TB shape) must satisfy the same
    empirical-CDF error bound as mode='single', on an input repartitioned
    so groups genuinely fragment across partitions."""
    from myscaledb_spark.operators.stats import tdigest_quantiles_by

    li = spark.table("lineitem").repartition(16)
    for mode in ("single", "partial"):
        est = {
            r["l_returnflag"]: (r["q0_5"], r["q0_9"])
            for r in tdigest_quantiles_by(
                li, ["l_returnflag"], "l_extendedprice", [0.5, 0.9], mode=mode
            ).collect()
        }
        for flag, (q50, q90) in est.items():
            grp = li.filter(F.col("l_returnflag") == flag)
            n = grp.count()
            for q, v in ((0.5, q50), (0.9, q90)):
                lo = grp.filter(F.col("l_extendedprice") < v).count() / n
                hi = grp.filter(F.col("l_extendedprice") <= v).count() / n
                assert lo - 0.01 <= q <= hi + 0.01, (mode, flag, q, v, lo, hi)
