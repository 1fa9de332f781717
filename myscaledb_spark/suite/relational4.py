"""TPC-H-shaped relational breadth: q3 (shipping priority), q10 (returned
items), q14 (promo revenue) adapted to the driver's synthetic schema
(o_orderpriority instead of o_shippriority; p_type is a plain category).

Float discipline: money math in DECIMAL(18,2) on both sides (exact,
association-independent), final outputs cast DOUBLE + ROUND.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register


def _dec2(c: str):
    return F.col(c).cast("decimal(18,2)")


_ONE = "CAST(1 AS DECIMAL(18,2))"
_REV = f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(18,2)))"


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    cutoff = F.lit("1997-06-01").cast("timestamp")
    j = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
    )
    rev = F.sum(_dec2("l_extendedprice") * (one - _dec2("l_discount")))
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(rev.cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(18,2)")
    j = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    rev = F.sum(_dec2("l_extendedprice") * (one - _dec2("l_discount")))
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev.cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT ROUND(
             (100 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE))
             / CAST(SUM({_REV}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-03-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(18,2)")
    rev = _dec2("l_extendedprice") * (one - _dec2("l_discount"))
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
        ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    return j.agg(
        F.round(
            (F.lit(100) * promo.cast("double")) / F.sum(rev).cast("double"), 6
        ).alias("promo_revenue")
    )
