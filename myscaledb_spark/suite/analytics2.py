"""Long-tail aggregates batch (r3 VERDICT asks #5-6 + the 'no' tail):
topKWeighted, quantileTiming (exact fixed-grid parity), sparkbar,
categoricalInformationValue, deltaSumTimestamp, stochasticLinearRegression —
`registerAggregateFunctions.cpp:15-16,20-34,54,58-64,78-80`.

Float discipline: every entry either stays in exact integer/DECIMAL space
until one final double cast (topKWeighted, quantileTiming, sparkbar,
stochasticLinearRegression moments) or rounds a one-row statistic whose
double tree is identical on both engines (categoricalIV).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register

# --- topKWeighted (AggregateFunctionTopK.cpp; space-saving sketch in the
# reference bounds single-node memory — Spark's shuffle makes the EXACT
# hash-agg + TakeOrdered the right distributed shape, exact ⊇ approximate) ----


@register(
    "topk_weighted",
    """
    SELECT l_partkey AS k, CAST(SUM(l_quantity) AS DOUBLE) AS w
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY SUM(l_quantity) DESC, l_partkey ASC
    LIMIT 15
    """,
)
def topk_weighted_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import topk_weighted

    li = load_table(spark, sf_dir, "lineitem")
    out = topk_weighted(li, "l_partkey", "l_quantity", 15)
    # ordering on the exact DECIMAL sum; double cast only at output
    return out.select("k", F.col("w").cast("double").alias("w"))


# --- quantileTiming (QuantileTiming.h large state, exact grid parity) ---------
_QT_LEVELS = [0.1, 0.5, 0.9]


def _quantile_timing_sql() -> str:
    from myscaledb_spark.operators.stats import timing_rep_values

    reps = ", ".join(str(v) for v in timing_rep_values())
    qcols = ", ".join(
        f"COALESCE(MIN(CASE WHEN cum >= CEIL(n * ({lv!r}::DOUBLE)) THEN key END), 30000)"
        f" AS q_{str(lv).replace('.', '_')}"
        for lv in _QT_LEVELS
    )
    return f"""
    WITH rep AS (SELECT [{reps}] AS a),
    b AS (
      SELECT CASE WHEN v < 1024 THEN v
                  WHEN v < 30000 THEN a[CAST((v - 1024) // 16 AS INT) + 1]
                  ELSE NULL END AS key
      FROM (SELECT CAST(FLOOR(l_extendedprice) AS BIGINT) AS v FROM lineitem)
      CROSS JOIN rep
    ),
    h AS (SELECT key, COUNT(*) AS c FROM b GROUP BY key),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM h),
    cum AS (
      SELECT key, SUM(c) OVER (ORDER BY key) AS cum
      FROM h WHERE key IS NOT NULL
    )
    SELECT {qcols} FROM cum CROSS JOIN tot
    """


@register("quantile_timing", _quantile_timing_sql())
def quantile_timing_q(spark, sf_dir):
    """quantileTiming over floor(l_extendedprice): exercises all three grid
    regimes (exact <1024 values, width-16 buckets with the intHash32
    de-evening, ≥30000 overflow → 30000)."""
    from myscaledb_spark.operators.stats import quantile_timing

    li = load_table(spark, sf_dir, "lineitem")
    return quantile_timing(li, F.floor("l_extendedprice"), _QT_LEVELS)


# --- quantileBFloat16 (QuantileBFloat16Histogram.h): exact estimator parity ---
_QBF_LEVELS = [0.25, 0.5, 0.9]


def _qbf16_sql() -> str:
    # the bfloat16 collapse, arithmetically (see operators.stats.bfloat16_round)
    qcols = ", ".join(
        f"MIN(CASE WHEN cum >= CEIL(n * ({lv!r}::DOUBLE)) THEN key END)"
        f" AS q_{str(lv).replace('.', '_')}"
        for lv in _QBF_LEVELS
    )
    return f"""
    WITH src AS (
      SELECT (CASE WHEN l_orderkey % 2 = 1 THEN -1.0 ELSE 1.0 END)
             * CAST(l_extendedprice AS DOUBLE) AS x
      FROM lineitem
    ),
    f AS (SELECT CAST(CAST(x AS REAL) AS DOUBLE) AS fd FROM src),
    ex AS (
      SELECT fd, e0 + (CASE WHEN power(2.0, e0 + 1) <= abs(fd) THEN 1 ELSE 0 END)
                 - (CASE WHEN power(2.0, e0) > abs(fd) THEN 1 ELSE 0 END) AS e
      FROM (SELECT fd, FLOOR(log2(abs(fd))) AS e0 FROM f)
    ),
    b AS (
      SELECT CASE WHEN abs(fd) = 0 THEN 0.0
             ELSE (CASE WHEN fd < 0 THEN -1.0 ELSE 1.0 END)
                  * (power(2.0, e) * FLOOR(abs(fd) / power(2.0, e) * 128.0) / 128.0)
             END AS key
      FROM ex
    ),
    h AS (SELECT key, COUNT(*) AS c FROM b GROUP BY key),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM h),
    cum AS (SELECT key, SUM(c) OVER (ORDER BY key) AS cum FROM h)
    SELECT {qcols} FROM cum CROSS JOIN tot
    """


@register("quantile_bfloat16", _qbf16_sql())
def quantile_bfloat16_q(spark, sf_dir):
    """quantileBFloat16 over signed l_extendedprice (odd orderkeys negated,
    so negative-key float ordering is exercised): the bfloat16-truncated
    histogram walk, bit-exact on both engines because every step of the
    collapse is power-of-two-exact arithmetic."""
    from myscaledb_spark.operators.stats import quantile_bfloat16

    li = load_table(spark, sf_dir, "lineitem")
    x = F.when(F.col("l_orderkey") % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0)) * F.col(
        "l_extendedprice"
    ).cast("double")
    return quantile_bfloat16(li.select(x.alias("x")), "x", _QBF_LEVELS)


# --- sparkbar (AggregateFunctionSparkbar.h:140-228) ---------------------------
_SB_WIDTH = 8


def _sparkbar_sql() -> str:
    # mirrors render(): point map x→Σy, bucket index = floor(width/delta * (x-from)),
    # per-bucket INTEGER mean over contributing points, level = y*7/ymax + 1
    # (integer division both times, Y is integral), bars U+2581..U+2588.
    return f"""
    WITH pts AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS x,
             COUNT(*) AS y
      FROM orders GROUP BY 1
    ),
    rng AS (SELECT MIN(x) AS fx, MAX(x) AS tx FROM pts),
    idx AS (
      SELECT LEAST(CAST(FLOOR(({_SB_WIDTH}.0::DOUBLE / CAST(tx - fx + 1 AS DOUBLE)) * CAST(x - fx AS DOUBLE)) AS BIGINT), {_SB_WIDTH - 1}) AS b,
             y
      FROM pts CROSS JOIN rng
    ),
    hist AS (SELECT b, SUM(y) // COUNT(*) AS avg_y FROM idx GROUP BY b),
    mx AS (SELECT MAX(avg_y) AS ymax FROM hist),
    frame AS (
      SELECT g.b, COALESCE(h.avg_y, 0) AS avg_y
      FROM (SELECT UNNEST(generate_series(0, {_SB_WIDTH - 1})) AS b) g
      LEFT JOIN hist h ON g.b = h.b
    ),
    lv AS (
      SELECT b, CASE WHEN avg_y <= 0 THEN 0
                     ELSE avg_y * 7 // ymax + 1 END AS lev
      FROM frame CROSS JOIN mx
    )
    SELECT STRING_AGG(CASE WHEN lev = 0 THEN ' ' ELSE chr(9600 + CAST(lev AS INT)) END, '' ORDER BY b) AS bar
    FROM lv
    """


@register("sparkbar_daily", _sparkbar_sql())
def sparkbar_daily_q(spark, sf_dir):
    """sparkbar(8)(day, count) over orders — the reference's frame render
    with integer bucket means and the y*7/ymax+1 level map (bars ▁..█,
    empty bucket → space). All arithmetic integer-exact on both sides."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.groupBy(
        F.datediff("o_orderdate", F.lit("1992-01-01")).cast("bigint").alias("x")
    ).agg(F.count(F.lit(1)).alias("y"))
    rng = pts.agg(F.min("x").alias("fx"), F.max("x").alias("tx"))
    w = _SB_WIDTH
    bucket = F.least(
        (
            (F.lit(float(w)) / (F.col("tx") - F.col("fx") + 1).cast("double"))
            * (F.col("x") - F.col("fx")).cast("double")
        ).cast("bigint"),
        F.lit(w - 1).cast("bigint"),
    )
    hist = (
        pts.crossJoin(F.broadcast(rng))
        .groupBy(bucket.alias("b"))
        .agg(F.floor(F.sum("y").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_y"))
    )
    mx = hist.agg(F.max("avg_y").alias("ymax"))
    frame = spark.range(w).select(F.col("id").cast("bigint").alias("b"))
    lv = (
        frame.join(hist, "b", "left")
        .na.fill({"avg_y": 0})
        .crossJoin(F.broadcast(mx))
        .select(
            "b",
            F.when(F.col("avg_y") <= 0, F.lit(0))
            .otherwise(
                F.floor(
                    (F.col("avg_y") * 7).cast("double") / F.col("ymax").cast("double")
                )
                + 1
            )
            .cast("bigint")
            .alias("lev"),
        )
    )
    # Spark's char() is ASCII-mod-256, not a codepoint ctor — index the bar
    # alphabet (AggregateFunctionSparkbar.h:129 bars[]) as an array literal.
    bars = F.array(*[F.lit(ch) for ch in " ▁▂▃▄▅▆▇█"])
    bar = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("b", "lev"))),
            lambda s: F.element_at(bars, s["lev"].cast("int") + 1),
        ),
        "",
    )
    return lv.agg(bar.alias("bar"))


# --- categoricalInformationValue (AggregateFunctionCategoricalInformationValue
# .cpp:130-150): IV_i = (no_i/sum_no − yes_i/sum_yes) · ln((no_i/sum_no) /
# (yes_i/sum_yes)) over indicator categories vs a binary tag -------------------
_CIV_CATS = ["1-URGENT", "2-HIGH", "3-MEDIUM"]


def _civ_sql() -> str:
    sels = []
    for i, cat in enumerate(_CIV_CATS):
        sels.append(
            f"SELECT {i + 1} AS i, ROUND((no{i} / sum_no - yes{i} / sum_yes)"
            f" * ln((no{i} / sum_no) / (yes{i} / sum_yes)), 6) AS iv FROM m"
        )
    counters = ", ".join(
        f"COUNT(CASE WHEN o_orderpriority = '{c}' AND o_orderstatus <> 'F' THEN 1 END)::DOUBLE AS no{i}, "
        f"COUNT(CASE WHEN o_orderpriority = '{c}' AND o_orderstatus = 'F' THEN 1 END)::DOUBLE AS yes{i}"
        for i, c in enumerate(_CIV_CATS)
    )
    return (
        f"WITH m AS (SELECT {counters}, "
        "COUNT(CASE WHEN o_orderstatus <> 'F' THEN 1 END)::DOUBLE AS sum_no, "
        "COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)::DOUBLE AS sum_yes "
        "FROM orders)\n" + "\nUNION ALL ".join(sels)
    )


@register("categorical_iv", _civ_sql())
def categorical_iv_q(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    tag = F.col("o_orderstatus") == "F"
    aggs = []
    for i, cat in enumerate(_CIV_CATS):
        hit = F.col("o_orderpriority") == cat
        aggs.append(F.count(F.when(hit & ~tag, 1)).cast("double").alias(f"no{i}"))
        aggs.append(F.count(F.when(hit & tag, 1)).cast("double").alias(f"yes{i}"))
    aggs.append(F.count(F.when(~tag, 1)).cast("double").alias("sum_no"))
    aggs.append(F.count(F.when(tag, 1)).cast("double").alias("sum_yes"))
    m = o.agg(*aggs)
    entries = []
    for i in range(len(_CIV_CATS)):
        no_r = F.col(f"no{i}") / F.col("sum_no")
        yes_r = F.col(f"yes{i}") / F.col("sum_yes")
        iv = (no_r - yes_r) * F.log(no_r / yes_r)
        entries.append(
            F.struct(F.lit(i + 1).alias("i"), F.round(iv, 6).alias("iv"))
        )
    return m.select(F.inline(F.array(*entries)))


# --- deltaSumTimestamp (AggregateFunctionDeltaSumTimestamp.h): positive
# deltas of a value sequence ordered by its timestamp --------------------------


@register(
    "delta_sum_timestamp",
    """
    WITH seq AS (
      SELECT user_id % 8 AS bucket, value,
             LAG(value) OVER (PARTITION BY user_id % 8 ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT bucket,
           ROUND(SUM(CASE WHEN prev IS NOT NULL AND value > prev
                          THEN value - prev ELSE 0 END), 4) AS delta_sum
    FROM seq GROUP BY bucket
    """,
)
def delta_sum_timestamp_q(spark, sf_dir):
    """deltaSumTimestamp(value, ts): sum of positive consecutive deltas with
    the sequence ordered by timestamp (the reference keeps [min_ts, max_ts]
    per state so out-of-order part merges order correctly — Spark's window
    sort is that ordering, made total with the event_id tiebreak)."""
    ev = load_table(spark, sf_dir, "events")
    b = (F.col("user_id") % 8).alias("bucket")
    w = Window.partitionBy(F.col("user_id") % 8).orderBy("ts", "event_id")
    seq = ev.select(b, "value", F.lag("value").over(w).alias("prev"))
    delta = F.when(
        F.col("prev").isNotNull() & (F.col("value") > F.col("prev")),
        F.col("value") - F.col("prev"),
    ).otherwise(F.lit(0.0))
    return seq.groupBy("bucket").agg(F.round(F.sum(delta), 4).alias("delta_sum"))


# --- stochasticLinearRegression (AggregateFunctionMLMethod.cpp): full-batch
# gradient descent unrolled as a STATIC scalar recurrence over exact DECIMAL
# moments — w_{t+1} = w_t − lr·(2/n)(A·w_t − b) with A = Σuuᵀ, b = Σu·t
# computed in ONE scan. The iteration is 3-dimensional scalar math, so both
# engines evaluate the identical unrolled double tree → bit-equal weights. ----
_SLR_ITERS = 30
_SLR_LR = 0.2


def _slr_sql() -> str:
    moments = (
        "SELECT COUNT(*)::DOUBLE AS n, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS s1, "
        "CAST(SUM(l_discount) AS DOUBLE) AS s2, "
        "CAST(SUM(l_extendedprice) AS DOUBLE) AS sy, "
        "CAST(SUM(l_quantity * l_quantity) AS DOUBLE) AS s11, "
        "CAST(SUM(l_quantity * l_discount) AS DOUBLE) AS s12, "
        "CAST(SUM(l_discount * l_discount) AS DOUBLE) AS s22, "
        "CAST(SUM(l_quantity * l_extendedprice) AS DOUBLE) AS s1y, "
        "CAST(SUM(l_discount * l_extendedprice) AS DOUBLE) AS s2y "
        "FROM lineitem"
    )
    # scaled-feature second moments (u0=1, u1=0.02·q, u2=10·d, t=1e-5·price)
    scaled = (
        "SELECT n, (0.02::DOUBLE) * s1 AS a01, (10.0::DOUBLE) * s2 AS a02, "
        "(0.0004::DOUBLE) * s11 AS a11, (0.2::DOUBLE) * s12 AS a12, "
        "(100.0::DOUBLE) * s22 AS a22, (1e-05::DOUBLE) * sy AS b0, "
        "(2e-07::DOUBLE) * s1y AS b1, (0.0001::DOUBLE) * s2y AS b2 FROM m"
    )
    # per-iteration column names (w0_t) — a same-name alias in a SELECT could
    # ambiguously shadow the input column in lateral-alias dialects
    steps = [
        "it0 AS (SELECT *, 0.0::DOUBLE AS w0_0, 0.0::DOUBLE AS w1_0, 0.0::DOUBLE AS w2_0 FROM a)"
    ]
    c = f"({2.0 * _SLR_LR!r}::DOUBLE)"
    for t in range(_SLR_ITERS):
        u0, u1, u2 = f"w0_{t}", f"w1_{t}", f"w2_{t}"
        steps.append(
            f"it{t + 1} AS (SELECT n, a01, a02, a11, a12, a22, b0, b1, b2, "
            f"{u0} - {c} * (((n * {u0} + a01 * {u1} + a02 * {u2}) - b0) / n) AS w0_{t + 1}, "
            f"{u1} - {c} * (((a01 * {u0} + a11 * {u1} + a12 * {u2}) - b1) / n) AS w1_{t + 1}, "
            f"{u2} - {c} * (((a02 * {u0} + a12 * {u1} + a22 * {u2}) - b2) / n) AS w2_{t + 1} "
            f"FROM it{t})"
        )
    k = _SLR_ITERS
    return (
        f"WITH m AS ({moments}), a AS ({scaled}), " + ", ".join(steps)
        + f" SELECT ROUND(w0_{k}, 6) AS w0, ROUND(w1_{k}, 6) AS w1, ROUND(w2_{k}, 6) AS w2 FROM it{k}"
    )


@register("stochastic_linear_regression", _slr_sql())
def stochastic_linear_regression_q(spark, sf_dir):
    """stochasticLinearRegression(lr, ...)(target, f1, f2): the reference
    trains per-state SGD and merges; the distributed-deterministic
    formulation is full-batch GD on least squares, which collapses to a
    scalar linear recurrence over one row of exact DECIMAL co-moments —
    ONE table scan however many iterations, and bit-exact across engines
    because the unrolled double tree is identical."""
    li = load_table(spark, sf_dir, "lineitem")
    q, d, p = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(d).cast("double").alias("s2"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("s11"),
        F.sum(q * d).cast("double").alias("s12"),
        F.sum(d * d).cast("double").alias("s22"),
        F.sum(q * p).cast("double").alias("s1y"),
        F.sum(d * p).cast("double").alias("s2y"),
    )
    base = m.select(
        "n",
        (F.lit(0.02) * F.col("s1")).alias("a01"),
        (F.lit(10.0) * F.col("s2")).alias("a02"),
        (F.lit(0.0004) * F.col("s11")).alias("a11"),
        (F.lit(0.2) * F.col("s12")).alias("a12"),
        (F.lit(100.0) * F.col("s22")).alias("a22"),
        (F.lit(1e-05) * F.col("sy")).alias("b0"),
        (F.lit(2e-07) * F.col("s1y")).alias("b1"),
        (F.lit(0.0001) * F.col("s2y")).alias("b2"),
        F.lit(0.0).alias("w0"),
        F.lit(0.0).alias("w1"),
        F.lit(0.0).alias("w2"),
    )
    # Each iteration is a NAMED projection (like the oracle's chained CTEs):
    # closure-substituted Columns would blow up 3^iters tree nodes, named
    # columns keep the plan a DAG of 30 small projections.
    c = F.lit(2.0 * _SLR_LR)
    it = base
    keep = ["n", "a01", "a02", "a11", "a12", "a22", "b0", "b1", "b2"]
    for _ in range(_SLR_ITERS):
        n, w0, w1, w2 = F.col("n"), F.col("w0"), F.col("w1"), F.col("w2")
        a01, a02, a11 = F.col("a01"), F.col("a02"), F.col("a11")
        a12, a22 = F.col("a12"), F.col("a22")
        b0, b1, b2 = F.col("b0"), F.col("b1"), F.col("b2")
        it = it.select(
            *keep,
            (w0 - c * (((n * w0 + a01 * w1 + a02 * w2) - b0) / n)).alias("w0"),
            (w1 - c * (((a01 * w0 + a11 * w1 + a12 * w2) - b1) / n)).alias("w1"),
            (w2 - c * (((a02 * w0 + a12 * w1 + a22 * w2) - b2) / n)).alias("w2"),
        )
    return it.select(
        F.round("w0", 6).alias("w0"),
        F.round("w1", 6).alias("w1"),
        F.round("w2", 6).alias("w2"),
    )
