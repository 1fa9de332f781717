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
