"""JDBC federation gate: write orders into an embedded-Derby database once
(artifact cache), then answer an aggregate off the PARTITIONED JDBC read
with the status filter pushed into the remote SQL — the `jdbc`/`mysql`
table-engine shape (registerStorages.cpp:63-88) on Spark's native source.
The oracle reads the same rows from parquet, proving the remote round-trip
preserved values exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register
from myscaledb_spark.suite.artifact_cache import cached_artifact


def _derby_orders(spark, sf_dir: str) -> str:
    from myscaledb_spark.sources.jdbc import derby_url, write_jdbc

    def build(art: str) -> None:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
            "o_orderpriority",
        )
        write_jdbc(
            o,
            derby_url(art + "/db"),
            "orders",
            column_types="o_orderstatus VARCHAR(1), o_orderpriority VARCHAR(15)",
        )

    return cached_artifact(sf_dir, "derby_orders", build) + "/db"


@register(
    "jdbc_roundtrip",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def jdbc_roundtrip_q(spark, sf_dir):
    """Partitioned 8-way JDBC read (range-sliced on o_orderkey) with the
    status filter pushed into the remote query; exact DECIMAL totals."""
    from myscaledb_spark.sources.jdbc import derby_url, read_jdbc

    db = _derby_orders(spark, sf_dir)
    hi = 200_000  # orderkey upper bound: range partitioning only needs a cover
    o = read_jdbc(
        spark,
        derby_url(db, create=False),
        "orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=hi,
        num_partitions=8,
    )
    return (
        o.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").cast("double").alias("total"),
        )
        .orderBy("o_orderpriority")
    )
