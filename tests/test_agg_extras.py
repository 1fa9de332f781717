"""Unit semantics for operators/agg_extras.py (aggregate long-tail batch 3)
against hand-computed expectations — the gate entries in suite/agg_tail.py
cover engine-vs-engine parity; these pin the reference semantics themselves:
boundingRatio slope, crosstab coefficients, singleValueOrNull branches,
moving windows, insertAt defaults, weighted-quantile thresholds, ForEach
raggedness, and Resample bucket boundaries."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.operators.agg_extras import (
    agg_for_each,
    agg_resample,
    bounding_ratio,
    contingency,
    cramers_v_bias_corrected,
    group_array_insert_at,
    group_array_moving,
    quantile_exact_weighted,
    single_value_or_null,
    sum_count,
)


def test_bounding_ratio_slope(spark):
    df = spark.createDataFrame(
        [(0.0, 10.0), (5.0, 100.0), (10.0, 30.0)], "x double, y double"
    )
    [r] = bounding_ratio(df, "x", "y").collect()
    # (y at max x - y at min x) / (max x - min x) = (30 - 10) / 10
    assert r.bounding_ratio == pytest.approx(2.0)


def test_contingency_and_bias_corrected_vs_manual(spark):
    # 2x2 table: a=0 -> b 10/0, a=1 -> b 5/5; chi2 by hand below
    rows = [(0, 0)] * 10 + [(1, 0)] * 5 + [(1, 1)] * 5
    df = spark.createDataFrame(rows, "a int, b int")
    n = 20.0
    obs = {(0, 0): 10.0, (1, 0): 5.0, (1, 1): 5.0}
    row_n = {0: 10.0, 1: 10.0}
    col_n = {0: 15.0, 1: 5.0}
    # CrossTab.h:96-112 iterates count_ab — OBSERVED pairs only; unobserved
    # cells contribute nothing to chi2 (unlike the textbook full-table sum)
    chi2 = sum(
        (o - row_n[a] * col_n[b] / n) ** 2 / (row_n[a] * col_n[b] / n)
        for (a, b), o in obs.items()
    )
    phi2 = chi2 / n
    [c] = contingency(df, "a", "b").collect()
    assert c.contingency == pytest.approx(math.sqrt(phi2 / (phi2 + n)))
    r = c_ = 2.0
    phi2c = max(0.0, phi2 - (r - 1) * (c_ - 1) / (n - 1))
    rr = r - (r - 1) ** 2 / (n - 1)
    cc = c_ - (c_ - 1) ** 2 / (n - 1)
    [v] = cramers_v_bias_corrected(df, "a", "b").collect()
    assert v.cramers_v_bc == pytest.approx(math.sqrt(phi2c / (min(rr, cc) - 1)))


def test_single_value_or_null_branches(spark):
    df = spark.createDataFrame(
        [("g1", 7), ("g1", 7), ("g2", 1), ("g2", 2), ("g3", None)],
        "g string, v int",
    )
    out = {
        r.g: r.sv
        for r in df.groupBy("g").agg(single_value_or_null("v").alias("sv")).collect()
    }
    assert out == {"g1": 7, "g2": None, "g3": None}


def test_sum_count_pair(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "v int")
    [r] = df.agg(*sum_count("v")).collect()
    assert (r["sum"], r["count"]) == (3, 2)


def test_group_array_moving_window(spark):
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([1, 2, 3, 4])],
        "g string, i int, v double",
    )
    [r] = group_array_moving(df, "g", ["i"], F.col("v"), 2).collect()
    assert r.moving_sum == [1.0, 3.0, 5.0, 7.0]
    # avg divides by the FULL window size even for the first element
    # (AggregateFunctionGroupArrayMoving.h:73-78)
    assert r.moving_avg == [0.5, 1.5, 2.5, 3.5]


def test_group_array_insert_at_defaults(spark):
    df = spark.createDataFrame(
        [("g", 0, "a"), ("g", 3, "d")], "g string, p int, v string"
    )
    [r] = group_array_insert_at(df, "g", F.col("p"), F.col("v"), 5, "-").collect()
    assert r.arr == ["a", "-", "-", "d", "-"]


def test_quantile_exact_weighted_threshold(spark):
    # values 1..4 with weights 1,1,1,7 -> sum_w=10
    # level .5 -> thr=5 -> first cum>=5 is v=4; level .25 -> thr=ceil(2.5)=3 -> v=3
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 7)], "v int, w int"
    )
    [r] = quantile_exact_weighted(df, "v", "w", [0.25, 0.5]).collect()
    assert (r.q_0_25, r.q_0_5) == (3, 4)


def test_agg_for_each_ragged(spark):
    df = spark.createDataFrame([([1, 2, 3],), ([10, 20],)], "a array<int>")
    [r] = agg_for_each(df, "a", F.sum).collect()
    assert r.arr == [11, 22, 3]


def test_agg_resample_buckets(spark):
    # [0, 30) step 10; key=29 lands in bucket 2, key=30 dropped
    df = spark.createDataFrame(
        [("g", 0, 1), ("g", 9, 2), ("g", 29, 4), ("g", 30, 8)],
        "g string, k int, v int",
    )
    [r] = agg_resample(
        df, 0, 30, 10, F.col("k"), F.col("v"), F.sum, "g"
    ).collect()
    assert r.arr == [3, None, 4]
