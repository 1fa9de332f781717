"""Long-tail aggregate functions, batch 2 (closing the last `no` rows of
SURVEY.md §2.4): boundingRatio, contingency, cramersVBiasCorrected,
singleValueOrNull, sumCount, groupArrayMovingSum/Avg, groupArrayInsertAt,
quantileExactWeighted, and the -ForEach / -Resample combinators.

Reference parity:
  - boundingRatio         src/AggregateFunctions/AggregateFunctionBoundingRatio.h:21-66
  - contingency           src/AggregateFunctions/AggregateFunctionContingencyCoefficient.cpp:21-28
  - cramersVBiasCorrected src/AggregateFunctions/AggregateFunctionCramersVBiasCorrected.cpp:17-34
  - crosstab chi2/phi2    src/AggregateFunctions/CrossTab.h:96-112
  - singleValueOrNull     src/AggregateFunctions/AggregateFunctionMinMaxAny.h:1069-1105
  - sumCount              src/AggregateFunctions/AggregateFunctionSumCount.h
  - groupArrayMoving*     src/AggregateFunctions/AggregateFunctionGroupArrayMoving.h:59-78
  - groupArrayInsertAt    src/AggregateFunctions/AggregateFunctionGroupArrayInsertAt.h
  - quantileExactWeighted src/AggregateFunctions/QuantileExactWeighted.h:106-126
  - -ForEach combinator   src/AggregateFunctions/AggregateFunctionForEach.h
  - -Resample combinator  src/AggregateFunctions/AggregateFunctionResample.h

All are pure DataFrame compositions — groupBy/window/explode shapes that
shuffle once on the grouping key and scale linearly; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bounding_ratio(df: DataFrame, x: str, y: str, *group: str) -> DataFrame:
    """boundingRatio(x, y): slope between the leftmost (min-x) and rightmost
    (max-x) points — (y_at_max_x - y_at_min_x) / (max_x - min_x).

    The reference keeps first-seen on x-ties (strict </> comparisons,
    AggregateFunctionBoundingRatio.h:45-52), which is insertion-order
    dependent; like the reference under parallel merge, ties are unstable, so
    callers wanting determinism should use a tie-free x.
    """
    agg = [
        (
            (F.max_by(F.col(y), F.col(x)) - F.min_by(F.col(y), F.col(x)))
            / (F.max(x) - F.min(x))
        ).alias("bounding_ratio")
    ]
    return df.groupBy(*group).agg(*agg) if group else df.agg(*agg)


def _crosstab_phi2(df: DataFrame, a: str, b: str) -> DataFrame:
    """One-row (phi2, n, r, c) for the CrossTab.h family: chi2 computed from
    pair counts vs expected = row_n * col_n / n, phi2 = chi2 / n."""
    obs = df.groupBy(F.col(a).alias("a"), F.col(b).alias("b")).agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    ra = obs.groupBy("a").agg(F.sum("o").alias("row_n"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(F.sum("o").alias("n"))
    j = (
        obs.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
        .withColumn("e", F.col("row_n") * F.col("col_n") / F.col("n"))
        .withColumn(
            "chi", (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
        )
    )
    return j.agg(
        (F.sum("chi") / F.first("n")).alias("phi2"),
        F.first("n").alias("n"),
        F.countDistinct("a").cast("double").alias("r"),
        F.countDistinct("b").cast("double").alias("c"),
    )


def contingency(df: DataFrame, a: str, b: str) -> DataFrame:
    """contingency(a, b) = sqrt(phi2 / (phi2 + n))."""
    d = _crosstab_phi2(df, a, b)
    return d.select(
        F.sqrt(F.col("phi2") / (F.col("phi2") + F.col("n"))).alias("contingency")
    )


def cramers_v_bias_corrected(df: DataFrame, a: str, b: str) -> DataFrame:
    """cramersVBiasCorrected(a, b): Bergsma-Wicher bias correction —
    phi2~ = max(0, phi2 - (r-1)(c-1)/(n-1)); r~ = r - (r-1)^2/(n-1);
    c~ = c - (c-1)^2/(n-1); V = sqrt(phi2~ / (min(r~, c~) - 1))."""
    d = _crosstab_phi2(df, a, b)
    nm1 = F.col("n") - 1
    phi2c = F.greatest(
        F.lit(0.0), F.col("phi2") - (F.col("r") - 1) * (F.col("c") - 1) / nm1
    )
    rc = F.col("r") - (F.col("r") - 1) * (F.col("r") - 1) / nm1
    cc = F.col("c") - (F.col("c") - 1) * (F.col("c") - 1) / nm1
    return d.select(
        F.sqrt(phi2c / (F.least(rc, cc) - 1)).alias("cramers_v_bc")
    )


def single_value_or_null(col: str | Column) -> Column:
    """singleValueOrNull aggregate expression: the value when every non-null
    input row agrees, else NULL (also NULL for all-null/empty groups)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.count_distinct(c) == 1, F.min(c))


def sum_count(col: str | Column) -> list[Column]:
    """sumCount(x) -> (sum, count) pair of aggregate expressions (the
    reference returns a tuple; Spark idiom is two named columns)."""
    c = F.col(col) if isinstance(col, str) else col
    return [F.sum(c).alias("sum"), F.count(c).alias("count")]


def group_array_moving(
    df: DataFrame,
    group: str,
    order: list[str],
    value: Column,
    window_size: int,
) -> DataFrame:
    """groupArrayMovingSum(w)(x) + groupArrayMovingAvg(w)(x) per group: arrays
    where element i holds the sum (avg) of the last `w` values up to i in
    `order` order. Avg divides by the full window size even for the first
    w-1 elements (AggregateFunctionGroupArrayMoving.h:73-78).

    Shape: one pass — a running-window sum over (group, order), then a sorted
    collect per group. Scales as a single shuffle on the group key.
    """
    w = (
        Window.partitionBy(group)
        .orderBy(*order)
        .rowsBetween(-(window_size - 1), Window.currentRow)
    )
    per_row = df.select(
        F.col(group),
        F.struct(*[F.col(o) for o in order]).alias("_ord"),
        F.sum(value).over(w).alias("_msum"),
    )
    # ONE sorted collect: the two result expressions used to each run their
    # own array_sort over the (deduplicated) collected list; moving_avg is
    # element-wise moving_sum / window_size — the identical float division —
    # so it derives from the already-sorted column instead (r10)
    agged = per_row.groupBy(group).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_ord", "_msum"))),
            lambda s: s["_msum"],
        ).alias("moving_sum"),
    )
    return agged.select(
        group,
        "moving_sum",
        F.transform(
            "moving_sum", lambda v: v / F.lit(window_size)
        ).alias("moving_avg"),
    )


def group_array_insert_at(
    df: DataFrame,
    group: str,
    pos: Column,
    value: Column,
    size: int,
    default,
) -> DataFrame:
    """groupArrayInsertAt(default, size)(x, pos): a length-`size` array per
    group with x placed at index pos, `default` elsewhere. The reference
    keeps an arbitrary value on duplicate positions; callers should use
    unique positions for determinism (as the gate does)."""
    pairs = df.groupBy(group).agg(
        F.map_from_arrays(
            F.collect_list(pos), F.collect_list(value)
        ).alias("_m")
    )
    return pairs.select(
        group,
        F.transform(
            F.sequence(F.lit(0), F.lit(size - 1)),
            # _m is a MAP keyed by position: element_at takes the key itself
            lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(default)),
        ).alias("arr"),
    )


def quantile_exact_weighted(
    df: DataFrame, value: str, weight: str, levels: list[float], *group: str
) -> DataFrame:
    """quantileExactWeighted: sort by value, threshold = ceil(sum_w * level),
    answer = first value whose cumulative weight reaches the threshold
    (QuantileExactWeighted.h:106-126). Exact in integer weight space."""
    keys = [F.col(g) for g in group]
    per_val = df.groupBy(*keys, F.col(value).alias("_v")).agg(
        F.sum(weight).alias("_w")
    )
    w_cum = Window.partitionBy(*group).orderBy("_v") if group else Window.orderBy("_v")
    cum = per_val.select(
        *keys,
        "_v",
        F.sum("_w").over(w_cum).alias("_cum"),
        F.sum("_w").over(Window.partitionBy(*group) if group else Window.partitionBy()).alias("_tot"),
    )
    aggs = []
    for lv in levels:
        name = f"q_{str(lv).replace('.', '_')}"
        thr = F.ceil(F.col("_tot").cast("double") * F.lit(lv))
        aggs.append(F.min(F.when(F.col("_cum") >= thr, F.col("_v"))).alias(name))
    return cum.groupBy(*keys).agg(*aggs) if group else cum.agg(*aggs)


def agg_for_each(df: DataFrame, arr: str | Column, agg_fn=F.sum) -> DataFrame:
    """-ForEach combinator (sumForEach by default): aggregate applied
    elementwise across array rows; ragged arrays aggregate what is present at
    each position (AggregateFunctionForEach.h). posexplode + groupBy(pos) —
    linear, one shuffle on position."""
    a = F.col(arr) if isinstance(arr, str) else arr
    ex = df.select(F.posexplode(a).alias("pos", "x"))
    per_pos = ex.groupBy("pos").agg(agg_fn(F.col("x")).alias("v"))
    return per_pos.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("arr")
    )


def agg_resample(
    df: DataFrame,
    start,
    end,
    step,
    resample_key: Column,
    value: Column,
    agg_fn,
    *group: str,
) -> DataFrame:
    """-Resample combinator: agg(value) computed independently per
    [start, end) bucket of resample_key, returned as one array per group in
    bucket order (AggregateFunctionResample.h). Rows outside [start, end)
    are dropped; buckets with no rows appear as NULL array elements (callers
    wanting the reference's count->0 coalesce them, as the gate does)."""
    n_buckets = int((end - start + step - 1) // step)
    bucketed = df.where(
        (resample_key >= F.lit(start)) & (resample_key < F.lit(end))
    ).withColumn(
        "_bucket", F.floor((resample_key - F.lit(start)) / F.lit(step)).cast("int")
    )
    keys = [F.col(g) for g in group]
    per_bucket = bucketed.groupBy(*keys, F.col("_bucket")).agg(
        agg_fn(value).alias("_v")
    )
    filled = per_bucket.groupBy(*keys).agg(
        F.map_from_arrays(F.collect_list("_bucket"), F.collect_list("_v")).alias("_m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        # _m is a MAP keyed by bucket number: element_at takes the key itself
        lambda i: F.element_at(F.col("_m"), i),
    )
    return filled.select(*[F.col(g) for g in group], arr.alias("arr"))


def quantile_interpolated_weighted(
    df: DataFrame,
    keys: list[str],
    value: str,
    weight: str,
    levels: list[float],
) -> DataFrame:
    """quantileInterpolatedWeighted — the reference's weighted-percentile
    estimator (`src/AggregateFunctions/QuantileInterpolatedWeighted.h:104-195`):
    weights summed per DISTINCT value, positions
    p_i = (cumsum_i - 0.5·w_i) / total, linear interpolation at each level
    with flat extrapolation outside [p_0, p_{n-1}] and the dx==0→1 guard
    (`:297-305`).

    Deterministic (unlike tdigest), so exactly oracle-able: weights stay
    integral through cumsum/total (bit-exact under any partitioning), and
    each float op mirrors the reference's expression order.

    Plan: two key-shuffles (distinct-value weight sum, then per-group
    bracketing via min_by/max_by) — no sort of the full data, no Python.
    Output: keys + q_<level> columns.
    """
    w = Window.partitionBy(*keys).orderBy(value)
    wp = Window.partitionBy(*keys)
    # the reference aggregate skips NULL values; zero/negative weights would
    # produce duplicate positions (nondeterministic bracket ties)
    df = df.filter(F.col(value).isNotNull() & (F.col(weight) > 0))
    g = (
        df.groupBy(*keys, value)
        .agg(F.sum(F.col(weight).cast("long")).alias("_w"))
        .withColumn("_cum", F.sum("_w").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("_tot", F.sum("_w").over(wp))
        .withColumn(
            "_p",
            (F.col("_cum").cast("double") - 0.5 * F.col("_w").cast("double"))
            / F.col("_tot").cast("double"),
        )
    )
    aggs = []
    for lv in levels:
        lvl = F.lit(float(lv))
        pair = F.struct(F.col("_p").alias("p"), F.col(value).alias("v"))
        aggs.append(F.max_by(pair, F.when(F.col("_p") <= lvl, F.col("_p"))).alias(f"_l{len(aggs)}"))
        aggs.append(F.min_by(pair, F.when(F.col("_p") >= lvl, F.col("_p"))).alias(f"_r{len(aggs)}"))
    out = g.groupBy(*keys).agg(*aggs)
    cols = [F.col(k) for k in keys]
    for i, lv in enumerate(levels):
        l, r = F.col(f"_l{2*i}"), F.col(f"_r{2*i+1}")
        dx = r["p"] - l["p"]
        dx = F.when(dx == 0, F.lit(1.0)).otherwise(dx)
        interp = l["v"] + ((r["v"] - l["v"]) / dx) * (F.lit(float(lv)) - l["p"])
        y = (
            F.when(l.isNull(), r["v"])
            .when(r.isNull(), l["v"])
            .otherwise(interp)
        )
        cols.append(y.alias(f"q_{str(lv).replace('.', '_')}"))
    return out.select(*cols)
