"""Analytic aggregates batch: simpleLinearRegression, AUC (rank formula),
intervalLengthSum (union of intervals), maxIntersections (sweep line) —
`registerAggregateFunctions.cpp:58-64,78-80` + arrayAUC.cpp.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register


@register(
    "simple_linear_regression",
    """
    SELECT l_linestatus,
           ROUND(covar_pop(l_quantity, l_extendedprice) / var_pop(l_quantity), 4) AS slope,
           ROUND(AVG(l_extendedprice) - covar_pop(l_quantity, l_extendedprice)
                 / var_pop(l_quantity) * AVG(l_quantity), 2) AS intercept
    FROM lineitem GROUP BY l_linestatus
    """,
)
def simple_linear_regression(spark, sf_dir):
    """simpleLinearRegression(x, y) → (slope, intercept) via moments."""
    li = load_table(spark, sf_dir, "lineitem")
    slope = F.covar_pop("l_quantity", "l_extendedprice") / F.var_pop("l_quantity")
    return li.groupBy("l_linestatus").agg(
        F.round(slope, 4).alias("slope"),
        F.round(F.avg("l_extendedprice") - slope * F.avg("l_quantity"), 2).alias(
            "intercept"
        ),
    )


@register(
    "auc_value_vs_purchase",
    """
    WITH t AS (
      SELECT value AS score, (event_type = 'purchase') AS pos
      FROM events WHERE user_id < 60
    ),
    ranked AS (
      SELECT pos, RANK() OVER (ORDER BY score) + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS r
      FROM t
    ),
    agg AS (
      SELECT SUM(CASE WHEN pos THEN r END) AS rp,
             COUNT(CASE WHEN pos THEN 1 END)::DOUBLE AS np,
             COUNT(CASE WHEN NOT pos THEN 1 END)::DOUBLE AS nn
      FROM ranked
    )
    SELECT ROUND((rp - np * (np + 1) / 2) / (np * nn), 6) AS auc FROM agg
    """,
)
def auc_value_vs_purchase(spark, sf_dir):
    """arrayAUC semantics (rank-sum formula, tie-averaged) over a scored
    relation: AUC of `value` predicting event_type='purchase'."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    t = ev.select(F.col("value").alias("score"), (F.col("event_type") == "purchase").alias("pos"))
    r = F.rank().over(Window.orderBy("score")) + (
        F.count(F.lit(1)).over(Window.partitionBy("score")) - 1
    ) / 2.0
    ranked = t.withColumn("r", r)
    agg = ranked.agg(
        F.sum(F.when(F.col("pos"), F.col("r"))).alias("rp"),
        F.count(F.when(F.col("pos"), 1)).cast("double").alias("np"),
        F.count(F.when(~F.col("pos"), 1)).cast("double").alias("nn"),
    )
    auc = (F.col("rp") - F.col("np") * (F.col("np") + 1) / 2) / (F.col("np") * F.col("nn"))
    return agg.select(F.round(auc, 6).alias("auc"))


# intervals: [ts, ts + value seconds] per event — deterministic synthesis
_INTERVAL_SQL = """
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(FLOOR(value * 1000000) AS BIGINT) AS e
      FROM events WHERE user_id < 15
"""


@register(
    "interval_length_sum",
    f"""
    WITH iv AS ({_INTERVAL_SQL}),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    )
    SELECT user_id, CAST(SUM(ilen) AS BIGINT) AS union_len_us, COUNT(*) AS n_islands
    FROM (
      SELECT user_id, island, MAX(e) - MIN(s) AS ilen
      FROM islands GROUP BY user_id, island
    ) GROUP BY user_id
    """,
)
def interval_length_sum(spark, sf_dir):
    """intervalLengthSum: total length of the UNION of per-user intervals
    (overlaps merged via gaps-and-islands, one window pass)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 15)
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.floor(F.col("value") * 1000000).cast("bigint")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_e = F.max("e").over(w_prev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("ilen")
    )
    return per_island.groupBy("user_id").agg(
        F.sum("ilen").alias("union_len_us"), F.count(F.lit(1)).alias("n_islands")
    )


@register(
    "max_intersections",
    f"""
    WITH iv AS ({_INTERVAL_SQL}),
    pts AS (
      SELECT user_id, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT user_id, e AS t, -1 AS d FROM iv
    ),
    sweep AS (
      SELECT user_id,
             SUM(d) OVER (PARTITION BY user_id ORDER BY t, d
                          ROWS UNBOUNDED PRECEDING) AS depth
      FROM pts
    )
    SELECT user_id, CAST(MAX(depth) AS BIGINT) AS max_concurrent FROM sweep GROUP BY user_id
    """,
)
def max_intersections(spark, sf_dir):
    """maxIntersections: peak number of simultaneously open intervals per
    user — classic sweep line as +1/-1 deltas and a running sum. At an exact
    boundary the -1 sorts first (d ASC), i.e. [s,e) touch-closed semantics —
    same on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 15)
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.floor(F.col("value") * 1000000).cast("bigint")).alias("e"),
    )
    pts = iv.select("user_id", F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select("user_id", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = pts.withColumn("depth", F.sum("d").over(w))
    return sweep.groupBy("user_id").agg(F.max("depth").alias("max_concurrent"))
