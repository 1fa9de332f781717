"""Bucketed co-located joins: correctness + the shuffle-free plan shape.

The point of bucketing is scale: a fact-to-fact join on the bucket key must
not shuffle either side (reference analog: sharding-key co-location,
`OptimizeShardingKeyRewriteInVisitor.cpp`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.sources.bucketed import bucketed_join, drop_table, save_bucketed

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange_and_correct(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    save_bucketed(li, "t_li_bucketed", ["l_orderkey"], 4, ["l_orderkey"])
    save_bucketed(orders, "t_ord_bucketed", ["l_orderkey"], 4, ["l_orderkey"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(
                spark, "t_li_bucketed", "t_ord_bucketed", ["l_orderkey"]
            )
            agg = joined.groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n")
            )
            plan = _plan(agg)
            assert "SortMergeJoin" in plan
            # co-located bucketed scans: no shuffle anywhere below the join
            join_part = plan[plan.index("SortMergeJoin"):]
            assert "Exchange" not in join_part.replace(
                "ExchangeQueryStage", ""
            ), plan
            got = {r["o_orderstatus"]: r["n"] for r in agg.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # oracle: same join off the raw parquet
        exp = {
            r["o_orderstatus"]: r["n"]
            for r in load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == exp
    finally:
        drop_table(spark, "t_li_bucketed")
        drop_table(spark, "t_ord_bucketed")


def test_bucketed_groupby_no_exchange(spark):
    # aggregation on the bucket key also rides the co-partitioning
    li = load_table(spark, SF_DIR, "lineitem")
    save_bucketed(li, "t_li_bucketed2", ["l_orderkey"], 4)
    try:
        agg = spark.table("t_li_bucketed2").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        assert "Exchange" not in _plan(agg)
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        drop_table(spark, "t_li_bucketed2")


def test_parquet_bloom_filter_skip_index(spark, tmp_path):
    """Skip-index analog: parquet bloom filters written via the native
    writer option (reference: bloom_filter skip index,
    MergeTreeIndices.cpp) — verified present in the file footer."""
    import pyarrow.parquet as pq
    import os as _os

    def write(path, bloom):
        # high-cardinality column: parquet-mr only serializes a bloom when
        # the dictionary can't cover the chunk (dict pages already answer
        # point-membership exactly)
        w = (
            spark.range(50000)
            .selectExpr("id", "concat('u', id) AS user")
            .coalesce(1)
            .write
        )
        if bloom:
            w = w.option("parquet.bloom.filter.enabled#user", "true").option(
                "parquet.bloom.filter.expected.ndv#user", "50000"
            )
        w.parquet(path)
        f = [x for x in _os.listdir(path) if x.endswith(".parquet")][0]
        return _os.path.join(path, f)

    plain = write(str(tmp_path / "plain"), bloom=False)
    bloomed = write(str(tmp_path / "bloom"), bloom=True)
    # same data, same encoding — the footprint delta is the serialized bloom
    # (pyarrow 16 doesn't expose bloom offsets; ~1.4 KB for ndv=1000)
    assert _os.path.getsize(bloomed) > _os.path.getsize(plain) + 512
    assert (
        pq.ParquetFile(bloomed).metadata.num_rows
        == pq.ParquetFile(plain).metadata.num_rows
        == 50000
    )
    # and the scan with a point filter still answers correctly through it
    n = spark.read.parquet(str(tmp_path / "bloom")).filter("user = 'u5'").count()
    assert n == 1
