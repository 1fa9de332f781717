"""Relational breadth batch 2: array higher-order functions, map-style
aggregation (sumMap), ordered-sequence aggregates (deltaSum, exponential
time-decayed sum, nonNegativeDerivative), window frame variants
(first/last/nth, RANGE BETWEEN), pagination, CTEs, parameterized SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register

SQL_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"


# --- array higher-order functions (src/Functions/array/*) ---------------------
@register(
    "array_ops_docs",
    f"""
    WITH toked AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents WHERE doc_id < 150)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_filter(toks, t -> length(t) > 5)) AS n_long,
           CAST(list_reduce(list_transform(toks, t -> length(t)), (a, b) -> a + b) AS BIGINT) AS total_chars,
           CAST(to_json(toks[1:3]) AS VARCHAR) AS first3,
           CAST(to_json(list_sort(list_distinct(toks))[1:2]) AS VARCHAR) AS first2_sorted,
           CAST(list_reduce(list_transform(toks, t -> CASE WHEN t = 'spark' THEN 1 ELSE 0 END),
                       (a, b) -> a + b) AS BIGINT) AS n_spark
    FROM toked WHERE len(toks) >= 3
    """,
)
def array_ops_docs(spark, sf_dir):
    from myscaledb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    toked = docs.withColumn("toks", tokenize("text")).filter(F.size("toks") >= 3)
    return toked.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.filter("toks", lambda t: F.length(t) > 5)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform("toks", lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.to_json(F.slice("toks", 1, 3)).alias("first3"),
        F.to_json(F.slice(F.array_sort(F.array_distinct("toks")), 1, 2)).alias(
            "first2_sorted"
        ),
        F.size(F.filter("toks", lambda t: t == "spark")).cast("long").alias("n_spark"),
    )


# --- ARRAY JOIN (ArrayJoinAction.cpp → explode) -------------------------------
@register(
    "array_join_token_counts",
    f"""
    WITH toked AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS token FROM toked)
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def array_join_token_counts(spark, sf_dir):
    from myscaledb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


# --- posexplode / arrayEnumerate (ARRAY JOIN with positions) ------------------
@register(
    "posexplode_tokens",
    f"""
    WITH toked AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents WHERE doc_id < 40)
    SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS token
    FROM toked
    """,
)
def posexplode_tokens(spark, sf_dir):
    """posexplode ≈ ARRAY JOIN arr, arrayEnumerate(arr) (1-based positions
    to match the reference's arrayEnumerate)."""
    from pyspark.sql import functions as F

    from myscaledb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toked = docs.withColumn("toks", tokenize("text"))
    return toked.select(
        "doc_id", F.posexplode("toks").alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")


# --- sumMap / map aggregation (registerAggregateFunctions.cpp:50) -------------
@register(
    "sum_map_events",
    """
    WITH kv AS (
      SELECT user_id, event_type AS k, ROUND(SUM(value), 4) AS v
      FROM events WHERE user_id < 25 GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(to_json(list_sort(list(k))) AS VARCHAR) AS keys,
           CAST(to_json(list_transform(list_sort(list([k, CAST(v AS VARCHAR)])), p -> p[2])) AS VARCHAR) AS vals
    FROM kv GROUP BY user_id
    """,
)
def sum_map_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    kv = ev.groupBy("user_id", F.col("event_type").alias("k")).agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    # sumMap returns a key-sorted map; emit parallel sorted arrays (portable
    # across engines — map cell ordering is not)
    return kv.groupBy("user_id").agg(
        F.to_json(F.array_sort(F.collect_list("k"))).alias("keys"),
        F.to_json(
            F.transform(
                F.array_sort(
                    F.collect_list(F.array(F.col("k"), F.col("v").cast("string")))
                ),
                lambda p: F.element_at(p, 2),
            )
        ).alias("vals"),
    )


# --- groupArray (sorted for determinism) --------------------------------------
@register(
    "group_array_orders",
    """
    SELECT o_custkey, CAST(to_json(list_sort(list(o_orderkey))) AS VARCHAR) AS orderkeys,
           len(list(o_orderkey)) AS n
    FROM orders WHERE o_custkey < 20 GROUP BY o_custkey
    """,
)
def group_array_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    return o.groupBy("o_custkey").agg(
        F.to_json(F.array_sort(F.collect_list("o_orderkey"))).alias("orderkeys"),
        F.count(F.lit(1)).alias("n"),
    )


# --- window first/last/nth value (WindowTransform.cpp:2488-2508) --------------
@register(
    "window_first_last_nth",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER w AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WHERE o_custkey < 40
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 40)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


# --- RANGE BETWEEN frame (WindowDescription.h:31-60) --------------------------
@register(
    "window_range_30d",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_30d
    FROM orders WHERE o_custkey < 40
    """,
)
def window_range_30d(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 40)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.count(F.lit(1)).over(w).alias("n_30d")
    )


# --- ordered-sequence aggregates: deltaSum, EMA, nonNegativeDerivative --------
@register(
    "delta_sum_per_user",
    """
    WITH d AS (
      SELECT user_id, value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
      FROM events WHERE user_id < 30
    )
    SELECT user_id, ROUND(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END), 4) AS delta_sum
    FROM d GROUP BY user_id
    """,
)
def delta_sum_per_user(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dv = F.col("value") - F.lag("value").over(w)
    return (
        ev.withColumn("dv", dv)
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.when(F.col("dv") > 0, F.col("dv")).otherwise(0.0)), 4).alias(
                "delta_sum"
            )
        )
    )


@register(
    "exp_time_decayed_sum",
    """
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS t, value,
             MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS tmax
      FROM events WHERE user_id < 30 AND event_type = 'purchase'
    )
    SELECT user_id,
           ROUND(SUM(value * exp(-((tmax - t) / 1000000.0) / 86400.0)), 4) AS decayed_sum
    FROM g GROUP BY user_id
    """,
)
def exp_time_decayed_sum(spark, sf_dir):
    """exponentialTimeDecayedSum(tau)(v, t) at the latest event time:
    Σ v_i · e^{-(T - t_i)/τ}, τ = 1 day (WindowTransform.cpp:2509)."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 30) & (F.col("event_type") == "purchase")
    )
    w = Window.partitionBy("user_id")
    g = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "value",
    ).withColumn("tmax", F.max("t").over(w))
    decay = F.col("value") * F.exp(
        -((F.col("tmax") - F.col("t")) / F.lit(1000000.0)) / F.lit(86400.0)
    )
    return g.groupBy("user_id").agg(F.round(F.sum(decay), 4).alias("decayed_sum"))


@register(
    "nonneg_derivative",
    """
    SELECT user_id, event_id,
           ROUND(GREATEST((value - LAG(value) OVER w) /
                          ((epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0), 0), 6) AS rate
    FROM events WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def nonneg_derivative(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    rate = (F.col("value") - F.lag("value").over(w)) / (
        (t - F.lag(t).over(w)) / F.lit(1000000.0)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.greatest(rate, F.lit(0.0)), 6).alias("rate")
    )


# --- UNION DISTINCT + pagination (LIMIT/OFFSET) -------------------------------
@register(
    "union_distinct_keys",
    """
    SELECT COUNT(*) AS n FROM (
      SELECT o_custkey AS k FROM orders
      UNION
      SELECT c_custkey AS k FROM customer
    )
    """,
)
def union_distinct_keys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.union(c).distinct().agg(F.count(F.lit(1)).alias("n"))


@register(
    "offset_pagination",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10 OFFSET 20
    """,
)
def offset_pagination(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(20)
        .limit(10)
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
    )


# --- CTE / WITH + parameterized SQL (§2.11) -----------------------------------
@register(
    "cte_top_nations",
    """
    WITH cust_per_nation AS (
      SELECT c_nationkey, COUNT(*) AS n_cust
      FROM customer GROUP BY c_nationkey
    ),
    ranked AS (
      SELECT n_name, n_cust,
             ROW_NUMBER() OVER (ORDER BY n_cust DESC, n_name ASC) AS rn
      FROM cust_per_nation JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, n_cust FROM ranked WHERE rn <= 5
    """,
)
def cte_top_nations(spark, sf_dir):
    from myscaledb_spark.catalog import load_table as lt

    lt(spark, sf_dir, "customer").createOrReplaceTempView("_cte_customer")
    lt(spark, sf_dir, "nation").createOrReplaceTempView("_cte_nation")
    return spark.sql(
        """
        WITH cust_per_nation AS (
          SELECT c_nationkey, COUNT(*) AS n_cust
          FROM _cte_customer GROUP BY c_nationkey
        ),
        ranked AS (
          SELECT n_name, n_cust,
                 ROW_NUMBER() OVER (ORDER BY n_cust DESC, n_name ASC) AS rn
          FROM cust_per_nation JOIN _cte_nation ON c_nationkey = n_nationkey
        )
        SELECT n_name, n_cust FROM ranked WHERE rn <= 5
        """
    )


@register(
    "parameterized_query",
    """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders WHERE o_totalprice > 150000.0 AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderstatus
    """,
)
def parameterized_query(spark, sf_dir):
    """Parameterized queries ({name:Type}, ReplaceQueryParameterVisitor) →
    spark.sql named args."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_pq_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM _pq_orders WHERE o_totalprice > :minprice AND o_orderdate >= :mindate
        GROUP BY o_orderstatus
        """,
        args={"minprice": 150000.0, "mindate": "1997-01-01 00:00:00"},
    )
