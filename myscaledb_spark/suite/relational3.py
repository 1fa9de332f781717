"""Relational breadth 3: classic TPC-H query shapes on the available tables,
correlated subqueries, outer/cross joins, multi-column IN, sessionization
(session_window vs a gaps-and-islands oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 — pure filter+agg; all three predicates push to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT c_name, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    GROUP BY c_name, o_orderkey
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 — IN over a grouped-HAVING subquery (semi-join of an agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
    )


@register(
    "correlated_subquery_above_cust_avg",
    """
    SELECT o_custkey, COUNT(*) AS n_above
    FROM orders o1
    WHERE o_totalprice > (
      SELECT AVG(o_totalprice) FROM orders o2 WHERE o2.o_custkey = o1.o_custkey
    )
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
)
def correlated_subquery_above_cust_avg(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates (the reference's
    old analyzer largely can't; superset noted in SURVEY §4.1)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_cs_orders")
    return spark.sql(
        """
        SELECT o_custkey, COUNT(*) AS n_above
        FROM _cs_orders o1
        WHERE o_totalprice > (
          SELECT AVG(o_totalprice) FROM _cs_orders o2 WHERE o2.o_custkey = o1.o_custkey
        )
        GROUP BY o_custkey
        HAVING COUNT(*) >= 3
        """
    )


@register(
    "full_outer_customers_suppliers",
    """
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           COUNT(c.c_custkey) AS n_cust,
           COUNT(s.s_suppkey) AS n_supp
    FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 12) c
    FULL OUTER JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
      ON c.c_nationkey = s.s_nationkey
    GROUP BY 1
    """,
)
def full_outer_customers_suppliers(spark, sf_dir):
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 12)
        .select("c_custkey", "c_nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .groupBy(F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"))
        .agg(
            F.count("c_custkey").alias("n_cust"),
            F.count("s_suppkey").alias("n_supp"),
        )
    )


@register(
    "cross_join_region_status",
    """
    SELECT r_name, o_orderstatus,
           (SELECT COUNT(*) FROM orders o WHERE o.o_orderstatus = x.o_orderstatus) AS n
    FROM (SELECT DISTINCT o_orderstatus FROM orders) x
    CROSS JOIN region
    ORDER BY r_name, o_orderstatus
    """,
)
def cross_join_region_status(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    r = load_table(spark, sf_dir, "region")
    statuses = o.select("o_orderstatus").distinct()
    counts = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    return (
        statuses.crossJoin(F.broadcast(r.select("r_name")))
        .join(counts, "o_orderstatus")
        .select("r_name", "o_orderstatus", "n")
        .orderBy("r_name", "o_orderstatus")
    )


@register(
    "multi_column_in",
    """
    SELECT COUNT(*) AS n
    FROM lineitem
    WHERE (l_returnflag, l_linestatus) IN (('R', 'F'), ('A', 'F'))
      AND l_quantity > 30
    """,
)
def multi_column_in(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pair = F.struct(F.col("l_returnflag"), F.col("l_linestatus"))
    allowed = [
        F.struct(F.lit("R").alias("l_returnflag"), F.lit("F").alias("l_linestatus")),
        F.struct(F.lit("A").alias("l_returnflag"), F.lit("F").alias("l_linestatus")),
    ]
    return (
        li.filter(pair.isin(*allowed) & (F.col("l_quantity") > 30))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "session_windows_30m",
    """
    WITH ev AS (
      SELECT user_id, ts FROM events WHERE user_id < 25
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def session_windows_30m(spark, sf_dir):
    """session_window(gap 30m) row counts == the gaps-and-islands batch
    formulation; checks Spark's session semantics against plain SQL."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    s = ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events")
    )
