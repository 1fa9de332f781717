"""Gate entry for bucketed co-located fact-to-fact join.

orders and lineitem are both bucketed on the order key with the same bucket
count; the join then reads co-partitioned buckets with no ShuffleExchange on
either side (asserted in tests/test_bucketed.py). This is the reference's
sharding-key co-location (`OptimizeShardingKeyRewriteInVisitor.cpp`)
re-expressed as Spark bucketing — at 100 TB the only sane shape for
fact-to-fact joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.sources.bucketed import bucketed_join, save_bucketed
from myscaledb_spark.suite import register

_BUILT: set[tuple[str, str]] = set()


def _table_name(sf_dir: str, base: str) -> str:
    # one catalog table per (sf_dir, base); sf dir string → identifier-safe
    tag = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.strip("/"))
    return f"{base}_b_{tag}"


def ensure_bucketed(spark, sf_dir: str, base: str, bucket_cols, sort_cols, n=8) -> str:
    name = _table_name(sf_dir, base)
    key = (sf_dir, base)
    if key not in _BUILT:
        save_bucketed(
            load_table(spark, sf_dir, base), name, bucket_cols, n, sort_cols
        )
        _BUILT.add(key)
    return name


@register(
    "bucketed_join_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_priority(spark, sf_dir):
    li = ensure_bucketed(
        spark, sf_dir, "lineitem", ["l_orderkey"], ["l_orderkey"]
    )
    orders = ensure_bucketed(
        spark, sf_dir, "orders", ["o_orderkey"], ["o_orderkey"]
    )
    one = F.lit(1).cast("decimal(18,2)")
    joined = (
        spark.table(li)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table(orders), on="o_orderkey")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (one - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
