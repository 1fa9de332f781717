"""Aggregate long-tail batch 3 — the final `no`/unchecked rows of SURVEY §2.4:
boundingRatio, contingency + cramersVBiasCorrected, singleValueOrNull,
sumCount (+avgWeighted), groupArrayMovingSum/Avg, groupArrayInsertAt,
quantileExactWeighted, sumForEach, countResample/avgResample.

Float discipline (suite/__init__ header): money stays DECIMAL end-to-end and
every array is serialized with to_json holding only integers/strings (scaled
cents/micros), so the value-hash never sees engine-specific float formatting.
The two crosstab statistics are one-row doubles with identical association
trees on both engines, ROUND(x, 6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register

# --- boundingRatio (AggregateFunctionBoundingRatio.h:21-66) -------------------


@register(
    "bounding_ratio_orders",
    """
    SELECT o_orderpriority,
           ROUND((arg_max(o_totalprice, o_orderkey) - arg_min(o_totalprice, o_orderkey))
                 / (MAX(o_orderkey) - MIN(o_orderkey)), 6) AS bounding_ratio
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bounding_ratio_q(spark, sf_dir):
    """boundingRatio(o_orderkey, o_totalprice) per priority — x is the unique
    order key, so the reference's first-seen tie rule never fires."""
    from myscaledb_spark.operators.agg_extras import bounding_ratio

    o = load_table(spark, sf_dir, "orders")
    out = bounding_ratio(o, "o_orderkey", "o_totalprice", "o_orderpriority")
    return out.select(
        "o_orderpriority", F.round("bounding_ratio", 6).alias("bounding_ratio")
    ).orderBy("o_orderpriority")


# --- contingency / cramersVBiasCorrected (CrossTab.h:96-112) ------------------


@register(
    "contingency_coeffs",
    """
    WITH obs AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b, CAST(COUNT(*) AS DOUBLE) AS o
      FROM orders GROUP BY 1, 2
    ),
    ra AS (SELECT a, SUM(o) AS row_n FROM obs GROUP BY a),
    cb AS (SELECT b, SUM(o) AS col_n FROM obs GROUP BY b),
    tot AS (SELECT SUM(o) AS n FROM obs),
    j AS (
      SELECT obs.o, ra.row_n * cb.col_n / tot.n AS e, tot.n
      FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
    ),
    d AS (
      SELECT SUM((o - e) * (o - e) / e) / ANY_VALUE(n) AS phi2,
             ANY_VALUE(n) AS n,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM ra) AS r,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM cb) AS c
      FROM j
    )
    SELECT ROUND(sqrt(phi2 / (phi2 + n)), 6) AS contingency,
           ROUND(sqrt(GREATEST(0, phi2 - (r-1)*(c-1)/(n-1))
                      / (LEAST(r - (r-1)*(r-1)/(n-1), c - (c-1)*(c-1)/(n-1)) - 1)), 6)
             AS cramers_v_bc
    FROM d
    """,
)
def contingency_coeffs_q(spark, sf_dir):
    """contingency + cramersVBiasCorrected over (o_orderstatus,
    o_orderpriority). chi2 sums ~15 per-cell doubles; round-6 is far above
    sum-order noise (same precedent as cramers_v_status_priority)."""
    from myscaledb_spark.operators.agg_extras import (
        contingency,
        cramers_v_bias_corrected,
    )

    o = load_table(spark, sf_dir, "orders")
    c1 = contingency(o, "o_orderstatus", "o_orderpriority")
    c2 = cramers_v_bias_corrected(o, "o_orderstatus", "o_orderpriority")
    return c1.crossJoin(c2).select(
        F.round("contingency", 6).alias("contingency"),
        F.round("cramers_v_bc", 6).alias("cramers_v_bc"),
    )


# --- singleValueOrNull (AggregateFunctionMinMaxAny.h:1069-1105) ---------------


@register(
    "single_value_or_null_nations",
    """
    SELECT c_nationkey,
           CASE WHEN COUNT(DISTINCT n_regionkey) = 1
                THEN CAST(MIN(n_regionkey) AS BIGINT) END AS region_single,
           CASE WHEN COUNT(DISTINCT c_mktsegment) = 1 THEN MIN(c_mktsegment) END AS segment_single
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def single_value_or_null_q(spark, sf_dir):
    """singleValueOrNull: per nation, the region key collapses to its single
    value while the market segment (5 values per nation) yields NULL —
    exercising both branches."""
    from myscaledb_spark.operators.agg_extras import single_value_or_null

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        j.groupBy("c_nationkey")
        .agg(
            single_value_or_null(F.col("n_regionkey").cast("bigint")).alias(
                "region_single"
            ),
            single_value_or_null("c_mktsegment").alias("segment_single"),
        )
        .orderBy("c_nationkey")
    )


# --- sumCount + avgWeighted (AggregateFunctionSumCount.h, AvgWeighted) --------


@register(
    "sum_count_avg_weighted",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
           COUNT(l_quantity) AS qty_count,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS avg_weighted_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sum_count_avg_weighted_q(spark, sf_dir):
    """sumCount(l_quantity) + avgWeighted(l_extendedprice, l_quantity) per
    return flag: exact DECIMAL sums, one final double division rounded."""
    from myscaledb_spark.operators.agg_extras import sum_count

    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    s, c = sum_count(qty)
    return (
        li.groupBy("l_returnflag")
        .agg(
            s.cast("double").alias("qty_sum"),
            c.alias("qty_count"),
            F.round(
                F.sum(price * qty).cast("double") / F.sum(qty).cast("double"), 6
            ).alias("avg_weighted_price"),
        )
        .orderBy("l_returnflag")
    )


# --- groupArrayMovingSum / Avg (AggregateFunctionGroupArrayMoving.h:59-78) ----

_MOVING_W = 5


@register(
    "group_array_moving_qty",
    f"""
    WITH src AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
             CAST(l_quantity AS DECIMAL(18,2)) AS q
      FROM lineitem WHERE l_suppkey <= 10
    ),
    m AS (
      SELECT l_suppkey,
             SUM(q) OVER (PARTITION BY l_suppkey
                          ORDER BY l_orderkey, l_linenumber, l_partkey, q
                          ROWS BETWEEN {_MOVING_W - 1} PRECEDING AND CURRENT ROW) AS msum,
             l_orderkey, l_linenumber, l_partkey, q
      FROM src
    )
    SELECT l_suppkey,
           CAST(to_json(array_agg(CAST(msum * 100 AS BIGINT) ORDER BY l_orderkey, l_linenumber, l_partkey, q)) AS VARCHAR) AS moving_sum_cents,
           CAST(to_json(array_agg(CAST(msum * 200000 AS BIGINT) ORDER BY l_orderkey, l_linenumber, l_partkey, q)) AS VARCHAR) AS moving_avg_micros
    FROM m
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def group_array_moving_q(spark, sf_dir):
    """groupArrayMovingSum(5) + groupArrayMovingAvg(5) over quantities in
    (l_orderkey, l_linenumber, l_partkey, q) order — the synthetic lineitem
    has duplicate (orderkey, linenumber) pairs, so the order key includes the
    quantity itself; any rows still tied contribute identical window sums.
    Sums are exact DECIMAL; arrays are serialized as scaled integers (cents /
    avg-micros = sum*1e6/5) so JSON never carries float text."""
    from myscaledb_spark.operators.agg_extras import group_array_moving

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_suppkey") <= 10)
        .withColumn("q", F.col("l_quantity").cast("decimal(18,2)"))
    )
    out = group_array_moving(
        li,
        "l_suppkey",
        ["l_orderkey", "l_linenumber", "l_partkey", "q"],
        F.col("q"),
        _MOVING_W,
    )
    return out.select(
        "l_suppkey",
        F.to_json(
            F.transform(F.col("moving_sum"), lambda x: (x * 100).cast("bigint"))
        ).alias("moving_sum_cents"),
        F.to_json(
            F.transform(F.col("moving_sum"), lambda x: (x * 200000).cast("bigint"))
        ).alias("moving_avg_micros"),
    ).orderBy("l_suppkey")


# --- groupArrayInsertAt (AggregateFunctionGroupArrayInsertAt.h) ---------------


@register(
    "group_array_insert_at_nations",
    """
    WITH grid AS (
      SELECT g.n_regionkey, r.range AS i
      FROM range(0, 25) r CROSS JOIN (SELECT DISTINCT n_regionkey FROM nation) g
    ),
    slot AS (
      SELECT grid.n_regionkey, grid.i,
             COALESCE(MIN(CASE WHEN n.n_nationkey = grid.i THEN n.n_name END), '-') AS nm
      FROM grid LEFT JOIN nation n ON n.n_regionkey = grid.n_regionkey
      GROUP BY grid.n_regionkey, grid.i
    )
    SELECT n_regionkey,
           CAST(to_json(array_agg(nm ORDER BY i)) AS VARCHAR) AS arr
    FROM slot
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def group_array_insert_at_q(spark, sf_dir):
    """groupArrayInsertAt('-', 25)(n_name, n_nationkey) per region: each
    nation lands at its key's slot, other slots hold the default."""
    from myscaledb_spark.operators.agg_extras import group_array_insert_at

    n = load_table(spark, sf_dir, "nation")
    out = group_array_insert_at(
        n, "n_regionkey", F.col("n_nationkey"), F.col("n_name"), 25, "-"
    )
    return out.select(
        "n_regionkey", F.to_json(F.col("arr")).alias("arr")
    ).orderBy("n_regionkey")


# --- quantileExactWeighted (QuantileExactWeighted.h:106-126) ------------------

_QEW_LEVELS = [0.25, 0.5, 0.9]


@register(
    "quantile_exact_weighted_qty",
    """
    WITH pv AS (
      SELECT CAST(l_quantity AS BIGINT) AS v, SUM(CAST(l_linenumber AS BIGINT)) AS w
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT v, SUM(w) OVER (ORDER BY v) AS cum, SUM(w) OVER () AS tot FROM pv
    )
    SELECT MIN(CASE WHEN cum >= CEIL(CAST(tot AS DOUBLE) * 0.25) THEN v END) AS q_0_25,
           MIN(CASE WHEN cum >= CEIL(CAST(tot AS DOUBLE) * 0.5)  THEN v END) AS q_0_5,
           MIN(CASE WHEN cum >= CEIL(CAST(tot AS DOUBLE) * 0.9)  THEN v END) AS q_0_9
    FROM cum
    """,
)
def quantile_exact_weighted_q(spark, sf_dir):
    """quantileExactWeighted(l_quantity, l_linenumber): integer values and
    weights — fully exact, threshold = ceil(sum_w * level)."""
    from myscaledb_spark.operators.agg_extras import quantile_exact_weighted

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("v"),
        F.col("l_linenumber").cast("bigint").alias("w"),
    )
    return quantile_exact_weighted(li, "v", "w", _QEW_LEVELS)


# --- sumForEach over integerized embeddings (AggregateFunctionForEach.h) ------


@register(
    "sum_for_each_embeddings",
    """
    WITH ex AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
      FROM embeddings WHERE vec_id < 500
    )
    SELECT CAST(to_json(array_agg(v ORDER BY pos)) AS VARCHAR) AS sums
    FROM (SELECT pos, CAST(SUM(x) AS BIGINT) AS v FROM ex GROUP BY pos) t
    """,
)
def sum_for_each_q(spark, sf_dir):
    """sumForEach over embeddings integerized via floor(x*1000) — float→
    double widening and *1000 are exact IEEE ops on both engines, floor makes
    each element an exact BIGINT, so the elementwise sums are order-free."""
    from myscaledb_spark.operators.agg_extras import agg_for_each

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500)
    ints = e.select(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000).cast("bigint"),
        ).alias("iv")
    )
    return agg_for_each(ints, "iv", F.sum).select(
        F.to_json(F.col("arr")).alias("sums")
    )


# --- countResample / avgResample (AggregateFunctionResample.h) ----------------


@register(
    "resample_orders",
    """
    WITH b AS (
      SELECT o_orderpriority,
             CAST(FLOOR(o_totalprice / 100000) AS INT) AS bucket,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders
      WHERE o_totalprice >= 0 AND o_totalprice < 600000
    ),
    pb AS (
      SELECT o_orderpriority, bucket, COUNT(*) AS cnt,
             CAST(SUM(p * 100) AS BIGINT) AS s_cents
      FROM b GROUP BY 1, 2
    ),
    grid AS (
      SELECT g.o_orderpriority, r.range AS bucket
      FROM range(0, 6) r CROSS JOIN (SELECT DISTINCT o_orderpriority FROM b) g
    ),
    f AS (
      SELECT grid.o_orderpriority, grid.bucket,
             COALESCE(pb.cnt, 0) AS cnt,
             CASE WHEN pb.cnt IS NULL THEN NULL
                  ELSE (pb.s_cents * 10000) // pb.cnt END AS avg_micro
      FROM grid LEFT JOIN pb
        ON pb.o_orderpriority = grid.o_orderpriority AND pb.bucket = grid.bucket
    )
    SELECT o_orderpriority,
           CAST(to_json(array_agg(cnt ORDER BY bucket)) AS VARCHAR) AS counts,
           CAST(to_json(array_agg(avg_micro ORDER BY bucket)) AS VARCHAR) AS avgs
    FROM f
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def resample_orders_q(spark, sf_dir):
    """countResample(0, 600000, 100000) + avgResample over o_totalprice per
    priority: independent aggregates per price bucket in bucket order; empty
    count buckets are 0, empty avg buckets NULL. Averages are truncated
    integer micros computed from exact cent sums — (s*10000 - s*10000 % cnt)
    is an exactly-divisible ≤ 2^53 dividend, so the IEEE division is the
    exact integer quotient on both engines (DuckDB uses BIGINT //)."""
    from myscaledb_spark.operators.agg_extras import agg_resample

    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    cnt = agg_resample(
        o, 0, 600000, 100000, price, F.lit(1), F.count, "o_orderpriority"
    ).select(
        "o_orderpriority",
        F.transform(F.col("arr"), lambda x: F.coalesce(x, F.lit(0))).alias("_cnts"),
    )
    cents = agg_resample(
        o,
        0,
        600000,
        100000,
        price,
        (price.cast("decimal(18,2)") * 100).cast("decimal(28,2)"),
        F.sum,
        "o_orderpriority",
    ).select(
        "o_orderpriority",
        F.transform(F.col("arr"), lambda x: x.cast("bigint")).alias("_cents"),
    )

    def _avg_micro(s, c):
        num = s * 10000
        return F.when(
            s.isNotNull(), ((num - num % c) / c).cast("bigint")
        )

    return (
        cnt.join(cents, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.to_json(F.col("_cnts")).alias("counts"),
            F.to_json(F.zip_with(F.col("_cents"), F.col("_cnts"), _avg_micro)).alias(
                "avgs"
            ),
        )
        .orderBy("o_orderpriority")
    )


# --- quantileExact / Low / High / Exclusive / Inclusive -----------------------
# (QuantileExact.h:95, :141-151 exclusive, :208-215 inclusive, :266-290 low,
# :345-365 high). All deterministic order statistics -> exactly oracle-able.
# n is computed as floor(level * size) in double on BOTH engines; the two
# interpolated variants share the identical double tree then ROUND(x, 6).


@register(
    "quantile_exact_variants",
    """
    WITH pv AS (
      SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
             CAST(SUM(c) OVER () AS DOUBLE) AS s
      FROM pv
    ),
    sel AS (
      SELECT
        MIN(CASE WHEN cum >= FLOOR(0.25 * s) + 1 THEN v END) AS exact_q25,
        MIN(CASE WHEN cum >= (CASE WHEN CAST(s AS BIGINT) % 2 = 1
                                   THEN FLOOR(s / 2) ELSE s / 2 - 1 END) + 1
                 THEN v END) AS median_low,
        MIN(CASE WHEN cum >= FLOOR(s / 2) + 1 THEN v END) AS median_high,
        MIN(CASE WHEN cum >= FLOOR(0.9 * (s + 1)) THEN v END) AS ex_lo,
        MIN(CASE WHEN cum >= FLOOR(0.9 * (s + 1)) + 1 THEN v END) AS ex_hi,
        ANY_VALUE(FLOOR(0.9 * (s + 1))) AS ex_n, ANY_VALUE(0.9 * (s + 1)) AS ex_h,
        MIN(CASE WHEN cum >= FLOOR(0.9 * (s - 1) + 1) THEN v END) AS in_lo,
        MIN(CASE WHEN cum >= FLOOR(0.9 * (s - 1) + 1) + 1 THEN v END) AS in_hi,
        ANY_VALUE(FLOOR(0.9 * (s - 1) + 1)) AS in_n, ANY_VALUE(0.9 * (s - 1) + 1) AS in_h
      FROM cum
    )
    SELECT exact_q25, median_low, median_high,
           ROUND(ex_lo + (ex_h - ex_n) * (ex_hi - ex_lo), 6) AS excl_q90,
           ROUND(in_lo + (in_h - in_n) * (in_hi - in_lo), 6) AS incl_q90
    FROM sel
    """,
)
def quantile_exact_variants_q(spark, sf_dir):
    """quantileExact(0.25), quantileExactLow/High medians, and the
    interpolated quantileExactExclusive/Inclusive(0.9), all from one
    per-value-count cumulative window (one shuffle on the value key —
    nth_element's distributed analog)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy(F.col("l_quantity").cast("bigint").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = pv.select(
        "v",
        F.sum("c").over(Window.orderBy("v")).alias("cum"),
        F.sum("c").over(Window.partitionBy()).cast("double").alias("s"),
    )
    s = F.col("s")

    def at_index(n_expr):
        # element at 0-based index n of the sorted multiset
        return F.min(F.when(F.col("cum") >= n_expr + 1, F.col("v")))

    ex_n = F.floor(F.lit(0.9) * (s + 1))
    in_n = F.floor(F.lit(0.9) * (s - 1) + 1)
    sel = cum.agg(
        at_index(F.floor(F.lit(0.25) * s)).alias("exact_q25"),
        at_index(
            F.when(s.cast("bigint") % 2 == 1, F.floor(s / 2)).otherwise(s / 2 - 1)
        ).alias("median_low"),
        at_index(F.floor(s / 2)).alias("median_high"),
        F.min(F.when(F.col("cum") >= ex_n, F.col("v"))).alias("ex_lo"),
        at_index(ex_n).alias("ex_hi"),
        F.first(ex_n).alias("ex_n"),
        F.first(F.lit(0.9) * (s + 1)).alias("ex_h"),
        F.min(F.when(F.col("cum") >= in_n, F.col("v"))).alias("in_lo"),
        at_index(in_n).alias("in_hi"),
        F.first(in_n).alias("in_n"),
        F.first(F.lit(0.9) * (s - 1) + 1).alias("in_h"),
    )
    return sel.select(
        "exact_q25",
        "median_low",
        "median_high",
        F.round(
            F.col("ex_lo") + (F.col("ex_h") - F.col("ex_n")) * (F.col("ex_hi") - F.col("ex_lo")),
            6,
        ).alias("excl_q90"),
        F.round(
            F.col("in_lo") + (F.col("in_h") - F.col("in_n")) * (F.col("in_hi") - F.col("in_lo")),
            6,
        ).alias("incl_q90"),
    )


@register(
    "quantile_interpolated_weighted_qty",
    """
    WITH g AS (
      SELECT l_returnflag, l_quantity AS v, SUM(CAST(l_linenumber AS BIGINT)) AS w
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_linenumber > 0
      GROUP BY 1, 2
    ),
    pos AS (
      SELECT l_returnflag, v, w,
             (CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
              - 0.5 * CAST(w AS DOUBLE))
             / CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS p
      FROM g
    ),
    br AS (
      SELECT l_returnflag,
             ARG_MAX(p, CASE WHEN p <= 0.5 THEN p END) AS xl5,
             ARG_MAX(v, CASE WHEN p <= 0.5 THEN p END) AS yl5,
             ARG_MIN(p, CASE WHEN p >= 0.5 THEN p END) AS xr5,
             ARG_MIN(v, CASE WHEN p >= 0.5 THEN p END) AS yr5,
             ARG_MAX(p, CASE WHEN p <= 0.9 THEN p END) AS xl9,
             ARG_MAX(v, CASE WHEN p <= 0.9 THEN p END) AS yl9,
             ARG_MIN(p, CASE WHEN p >= 0.9 THEN p END) AS xr9,
             ARG_MIN(v, CASE WHEN p >= 0.9 THEN p END) AS yr9
      FROM pos GROUP BY 1
    )
    SELECT l_returnflag,
           CASE WHEN xl5 IS NULL THEN yr5 WHEN xr5 IS NULL THEN yl5
                ELSE yl5 + ((yr5 - yl5) /
                     (CASE WHEN xr5 - xl5 = 0 THEN 1.0 ELSE xr5 - xl5 END))
                     * (0.5 - xl5) END AS q_0_5,
           CASE WHEN xl9 IS NULL THEN yr9 WHEN xr9 IS NULL THEN yl9
                ELSE yl9 + ((yr9 - yl9) /
                     (CASE WHEN xr9 - xl9 = 0 THEN 1.0 ELSE xr9 - xl9 END))
                     * (0.9 - xl9) END AS q_0_9
    FROM br
    """,
)
def quantile_interpolated_weighted_qty(spark, sf_dir):
    """quantileInterpolatedWeighted(0.5, 0.9)(l_quantity, l_linenumber) per
    return flag — the reference's deterministic weighted-percentile
    estimator, bit-exact (QuantileInterpolatedWeighted.h)."""
    from myscaledb_spark.operators.agg_extras import quantile_interpolated_weighted

    li = load_table(spark, sf_dir, "lineitem")
    return quantile_interpolated_weighted(
        li, ["l_returnflag"], "l_quantity", "l_linenumber", [0.5, 0.9]
    )


@register(
    "quantile_tdigest_grouped",
    """
    SELECT l_returnflag, 1 AS ok50, 1 AS ok90
    FROM lineitem GROUP BY 1
    """,
)
def quantile_tdigest_grouped(spark, sf_dir):
    """`quantileTDigest(p)(x) ... GROUP BY k` — the per-group Dunning
    digest (operators/stats.tdigest_quantiles_by; QuantileTDigest.h keeps
    one digest per aggregation state), not percentile_approx.  Like
    quantile_tdigest_qty, the estimate has no bit-exact SQL twin, so the
    gate pins the per-group empirical-CDF error: for each group and level
    q the estimate v must satisfy F(v⁻) − 0.01 ≤ q ≤ F(v) + 0.01; the
    sorted build makes ok = 1 a stable hash-checkable value.

    r9 shape (r8 VERDICT finding #2): the indicator rides the digest's
    own applyInPandas task (check_tol — exact numpy CDF over the same
    group values), so the gate is ONE job instead of digest + collect +
    broadcast-join + second full scan (driver 2.22× → ~1.4×).  The
    SQL-dialect routing of grouped quantileTDigest to this operator stays
    pinned by tests/test_special.py::
    test_grouped_tdigest_sql_routes_to_real_estimator and the 00649
    conformance file."""
    from myscaledb_spark.operators.stats import tdigest_quantiles_by

    li = load_table(spark, sf_dir, "lineitem")
    out = tdigest_quantiles_by(
        li, ["l_returnflag"], "l_extendedprice", [0.5, 0.9],
        out_names=["q50", "q90"], mode="single", check_tol=0.01,
    )
    return out.select(
        "l_returnflag",
        F.col("ok_q50").alias("ok50"),
        F.col("ok_q90").alias("ok90"),
    )


@register(
    "quantile_tdigest_qty",
    """
    SELECT CAST(0.25 AS DOUBLE) AS level, 1 AS ok UNION ALL
    SELECT CAST(0.50 AS DOUBLE) AS level, 1 AS ok UNION ALL
    SELECT CAST(0.75 AS DOUBLE) AS level, 1 AS ok UNION ALL
    SELECT CAST(0.90 AS DOUBLE) AS level, 1 AS ok
    """,
)
def quantile_tdigest_qty(spark, sf_dir):
    """quantileTDigest over l_extendedprice, accuracy-pinned (r5 VERDICT ask
    #5): the real Dunning t-digest with the reference's merge rule
    (QuantileTDigest.h; operators/stats.tdigest_quantiles) replaces the
    old percentile_approx stand-in.  A t-digest estimate has no bit-exact
    SQL twin, so the gate pins its EMPIRICAL-CDF error instead: for each
    level q the estimate v must satisfy F(v⁻) − tol ≤ q ≤ F(v) + tol with
    tol = 0.01 (ε = 0.01 bounds rank error by ~2εq(1−q)); the build is
    range-sorted and greedy, hence deterministic, so ok = 1 is a stable
    hash-checkable value."""
    from myscaledb_spark.operators.stats import tdigest_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    levels = [0.25, 0.50, 0.75, 0.90]
    ests = tdigest_quantiles(li, "l_extendedprice", levels)
    aggs = []
    for i, v in enumerate(ests):
        aggs += [
            F.sum(F.when(F.col("l_extendedprice") < v, 1).otherwise(0))
            .cast("double").alias(f"lo{i}"),
            F.sum(F.when(F.col("l_extendedprice") <= v, 1).otherwise(0))
            .cast("double").alias(f"hi{i}"),
        ]
    r = li.agg(F.count(F.lit(1)).cast("double").alias("n"), *aggs).first()
    tol = 0.01
    rows = [
        (q, 1 if (r[f"lo{i}"] / r["n"] - tol) <= q <= (r[f"hi{i}"] / r["n"] + tol)
         else 0)
        for i, q in enumerate(levels)
    ]
    return spark.createDataFrame(rows, "level double, ok int")
