"""Gate entries for MergeTree engine-family FINAL semantics, TTL lifecycle,
and OPTIMIZE ... DEDUPLICATE.

The sign/version columns the Collapsing engines need do not exist in the
TPC-H-ish testdata, so each entry derives them deterministically from
``event_id`` (same arithmetic on both engines) — the gate then checks the
collapse semantics end-to-end, not the synthetic column.

Reference: src/Processors/Merges/Algorithms/{Collapsing,VersionedCollapsing,
Summing}SortedAlgorithm.cpp, src/Processors/TTL/*, and
src/Interpreters/InterpreterOptimizeQuery.cpp (see operators/engines.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.operators.relational import any_join
from myscaledb_spark.operators.engines import (
    collapsing_final,
    optimize_deduplicate,
    summing_final,
    ttl_column_default,
    ttl_delete,
    ttl_group_by,
    versioned_collapsing_final,
)
from myscaledb_spark.suite import register


@register(
    "collapsing_final_state",
    """
    WITH src AS (
      SELECT *, CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END AS sign
      FROM events
    ),
    g AS (
      SELECT user_id, event_type, SUM(sign) AS net,
             MAX(CASE WHEN sign = 1 THEN event_id END) AS last_id
      FROM src GROUP BY 1, 2
    )
    SELECT g.user_id, g.event_type, g.last_id AS last_event_id,
           ROUND(s.value, 4) AS last_value
    FROM g JOIN src s ON s.event_id = g.last_id
    WHERE g.net > 0
    """,
)
def collapsing_final_state(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "sign", F.when(F.col("event_id") % 3 == 0, F.lit(-1)).otherwise(F.lit(1))
    )
    out = collapsing_final(ev, ["user_id", "event_type"], "sign", "event_id")
    return out.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.round("value", 4).alias("last_value"),
    )


@register(
    "versioned_collapsing_state",
    """
    WITH src AS (
      SELECT *, event_id % 4 AS version,
             CASE WHEN event_id % 7 < 2 THEN -1 ELSE 1 END AS sign
      FROM events
    ),
    n AS (
      SELECT user_id, event_type, version, sign, event_id,
             SUM(sign) OVER (PARTITION BY user_id, event_type, version) AS net,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type, version, sign
                                ORDER BY event_id DESC) AS rn
      FROM src
    )
    SELECT user_id, event_type, version, CAST(sign AS INT) AS sign,
           event_id AS state_event_id
    FROM n
    WHERE net <> 0 AND sign = (CASE WHEN net > 0 THEN 1 ELSE -1 END)
      AND rn <= abs(net)
    """,
)
def versioned_collapsing_state(spark, sf_dir):
    """FIFO pairwise cancellation per (key, version): the last |net| rows of
    the majority sign survive — unpaired -1 rows are emitted and multiple
    same-version +1 rows all survive (VersionedCollapsingAlgorithm.cpp; the
    oracle replays the same queue invariant longhand)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("version", F.col("event_id") % 4)
        .withColumn(
            "sign", F.when(F.col("event_id") % 7 < 2, F.lit(-1)).otherwise(F.lit(1))
        )
    )
    out = versioned_collapsing_final(
        ev, ["user_id", "event_type"], "sign", "version", "event_id"
    )
    return out.select(
        "user_id", "event_type", "version", "sign",
        F.col("event_id").alias("state_event_id"),
    )


@register(
    "summing_final_lineitem",
    """
    SELECT l_suppkey, l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           ARG_MIN(l_partkey,
                   (l_orderkey * 100000 + l_linenumber) * 10000000 + l_partkey)
             AS first_partkey
    FROM lineitem
    GROUP BY 1, 2
    HAVING NOT (COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))), 0) = 0
            AND COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 0) = 0)
    """,
)
def summing_final_lineitem(spark, sf_dir):
    # the generated lineitem data contains duplicate (orderkey, linenumber)
    # pairs, so the insertion-order stand-in folds the pinned column itself
    # into the tie-break — fully deterministic on both engines
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("sum_qty"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("sum_price"),
        "l_partkey",
        (
            (F.col("l_orderkey") * 100000 + F.col("l_linenumber")) * 10000000
            + F.col("l_partkey")
        ).alias("_ord"),
    )
    out = summing_final(
        li,
        keys=["l_suppkey", "l_returnflag"],
        sum_cols=["sum_qty", "sum_price"],
        first_by="_ord",
    )
    return out.select(
        "l_suppkey",
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
        F.col("l_partkey").alias("first_partkey"),
    )


@register(
    "ttl_delete_column_events",
    """
    WITH alive AS (
      SELECT event_type, ts,
             CASE WHEN ts + INTERVAL 20 DAY > TIMESTAMP '2024-02-10 00:00:00'
                  THEN CAST(ROUND(value, 4) AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END AS val
      FROM events
      WHERE ts + INTERVAL 25 DAY > TIMESTAMP '2024-02-10 00:00:00'
    )
    SELECT event_type, COUNT(*) AS n_alive,
           CAST(SUM(CASE WHEN val = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted,
           CAST(SUM(val) AS DOUBLE) AS total_value
    FROM alive GROUP BY 1
    """,
)
def ttl_delete_column_events(spark, sf_dir):
    now = F.lit("2024-02-10 00:00:00").cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.round("value", 4).cast("decimal(18,4)").alias("val"),
    )
    alive = ttl_delete(ev, F.col("ts") + F.expr("INTERVAL 25 DAYS"), now)
    alive = ttl_column_default(
        alive,
        "val",
        F.col("ts") + F.expr("INTERVAL 20 DAYS"),
        now,
        F.lit(0).cast("decimal(18,4)"),
    )
    return alive.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_alive"),
        F.sum(F.when(F.col("val") == 0, 1).otherwise(0)).alias("n_defaulted"),
        F.sum("val").cast("double").alias("total_value"),
    )


@register(
    "ttl_group_by_events",
    """
    WITH src AS (
      SELECT user_id, date_trunc('day', ts) AS day, 1 AS cnt,
             CAST(ROUND(value, 4) AS DECIMAL(18,4)) AS val
      FROM events
    ),
    fresh AS (
      SELECT user_id, day, cnt, val FROM src
      WHERE day + INTERVAL 25 DAY > TIMESTAMP '2024-02-10 00:00:00'
    ),
    rolled AS (
      SELECT user_id, day, SUM(cnt) AS cnt, SUM(val) AS val FROM src
      WHERE NOT (day + INTERVAL 25 DAY > TIMESTAMP '2024-02-10 00:00:00')
      GROUP BY 1, 2
    ),
    u AS (SELECT * FROM fresh UNION ALL SELECT * FROM rolled)
    SELECT user_id, COUNT(*) AS n_rows, CAST(SUM(cnt) AS BIGINT) AS total_events,
           CAST(SUM(val) AS DOUBLE) AS total_value
    FROM u GROUP BY 1
    """,
)
def ttl_group_by_events(spark, sf_dir):
    now = F.lit("2024-02-10 00:00:00").cast("timestamp")
    src = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        F.lit(1).alias("cnt"),
        F.round("value", 4).cast("decimal(18,4)").alias("val"),
    )
    merged = ttl_group_by(
        src,
        ttl=F.col("day") + F.expr("INTERVAL 25 DAYS"),
        now=now,
        keys=["user_id", "day"],
        set_aggs={"cnt": F.sum("cnt"), "val": F.sum("val")},
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cnt").alias("total_events"),
        F.sum("val").cast("double").alias("total_value"),
    )


@register(
    "any_join_first_order",
    """
    WITH first_ord AS (
      SELECT o_custkey,
             ARG_MIN(o_orderkey, o_orderkey) AS first_orderkey,
             ARG_MIN(o_orderstatus, o_orderkey) AS first_status
      FROM orders GROUP BY 1
    )
    SELECT c_custkey, c_nationkey, first_orderkey, first_status
    FROM customer LEFT JOIN first_ord ON c_custkey = o_custkey
    WHERE c_custkey < 500
    """,
)
def any_join_first_order(spark, sf_dir):
    """LEFT ANY JOIN: every customer exactly once, paired with at most one
    order (the min-orderkey one) even though o_custkey repeats."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 500)
        .select("c_custkey", "c_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderstatus").alias("first_status"),
    )
    return any_join(cust, orders, ["c_custkey"], "left", "first_orderkey")


@register(
    "optimize_dedup_events",
    """
    SELECT user_id, event_type, CAST(day AS TIMESTAMP) AS day, event_id
    FROM (
      SELECT user_id, event_type, date_trunc('day', ts) AS day, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                                date_trunc('day', ts)
                                ORDER BY event_id) AS rn
      FROM events WHERE user_id < 40
    ) WHERE rn = 1
    """,
)
def optimize_dedup_events(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select(
            "user_id",
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            "event_id",
        )
    )
    return optimize_deduplicate(
        ev, by=["user_id", "event_type", "day"], order="event_id"
    )
