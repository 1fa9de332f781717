"""Statistical hypothesis-test aggregates
(`registerAggregateFunctions.cpp:66-74,81`: welchTTest, studentTTest,
mannWhitneyUTest, rankCorr, cramersV, theilsU) — implemented as pure
DataFrame aggregations (no scipy in this container, and none needed).
Like the reference, the t-tests and Mann-Whitney return (stat, p-value):
the t CDF / normal CDF come from `functions/special.py` column expressions
(Lanczos lgamma + fixed-depth incomplete-beta continued fraction / Chebyshev
erfc). Mann-Whitney uses the normal approximation without tie correction
(documented; the value columns here are continuous doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from myscaledb_spark.functions.special import (
    SparkOps,
    normal_two_sided_p_expr,
    t_two_sided_p_expr,
)


def _two_sample_moments(df: DataFrame, value: Column, is_a: Column):
    return df.agg(
        F.count(F.when(is_a, 1)).cast("double").alias("na"),
        F.count(F.when(~is_a, 1)).cast("double").alias("nb"),
        F.avg(F.when(is_a, value)).alias("ma"),
        F.avg(F.when(~is_a, value)).alias("mb"),
        F.var_samp(F.when(is_a, value)).alias("va"),
        F.var_samp(F.when(~is_a, value)).alias("vb"),
    )


def welch_ttest(df: DataFrame, value: Column | str, is_a: Column) -> DataFrame:
    """welchTTest: (t_stat, df) for unequal-variance two-sample test."""
    value = F.col(value) if isinstance(value, str) else value
    m = _two_sample_moments(df, value, is_a)
    se2a = F.col("va") / F.col("na")
    se2b = F.col("vb") / F.col("nb")
    t = (F.col("ma") - F.col("mb")) / F.sqrt(se2a + se2b)
    dof = (se2a + se2b) * (se2a + se2b) / (
        se2a * se2a / (F.col("na") - 1) + se2b * se2b / (F.col("nb") - 1)
    )
    out = m.select(t.alias("t_stat"), dof.alias("dof"))
    return out.select(
        "t_stat",
        "dof",
        t_two_sided_p_expr(SparkOps, F.col("t_stat"), F.col("dof")).alias("p_value"),
    )


def student_ttest(df: DataFrame, value: Column | str, is_a: Column) -> DataFrame:
    """studentTTest: pooled-variance two-sample test; df = na+nb-2."""
    value = F.col(value) if isinstance(value, str) else value
    m = _two_sample_moments(df, value, is_a)
    na, nb = F.col("na"), F.col("nb")
    sp2 = ((na - 1) * F.col("va") + (nb - 1) * F.col("vb")) / (na + nb - 2)
    t = (F.col("ma") - F.col("mb")) / F.sqrt(sp2 * (1 / na + 1 / nb))
    out = m.select(t.alias("t_stat"), (na + nb - 2).alias("dof"))
    return out.select(
        "t_stat",
        "dof",
        t_two_sided_p_expr(SparkOps, F.col("t_stat"), F.col("dof")).alias("p_value"),
    )


def mann_whitney_u(df: DataFrame, value: Column | str, is_a: Column) -> DataFrame:
    """mannWhitneyUTest: U statistic for group A (tie-corrected average
    ranks). Rank assignment is one global sort-window — the standard
    distributed formulation."""
    value = F.col(value) if isinstance(value, str) else value
    tagged = df.select(value.alias("v"), is_a.alias("a"))
    # average rank for ties: minrank + (ties-1)/2
    w_rank = Window.orderBy("v")
    w_tie = Window.partitionBy("v")
    ranked = tagged.withColumn(
        "r", F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("a"), F.col("r"))).alias("r1"),
        F.count(F.when(F.col("a"), 1)).cast("double").alias("n1"),
        F.count(F.when(~F.col("a"), 1)).cast("double").alias("n2"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    out = agg.select(u1.alias("u_stat"), F.col("n1"), F.col("n2"))
    n1, n2 = F.col("n1"), F.col("n2")
    z = (F.col("u_stat") - n1 * n2 / 2) / F.sqrt(n1 * n2 * (n1 + n2 + 1) / 12)
    return out.select(
        "u_stat",
        "n1",
        "n2",
        normal_two_sided_p_expr(SparkOps, z).alias("p_value"),
    )


def rank_corr(df: DataFrame, x: Column | str, y: Column | str) -> DataFrame:
    """rankCorr: Spearman correlation = Pearson corr of tie-averaged ranks."""
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    base = df.select(x.alias("x"), y.alias("y"))
    rx = F.rank().over(Window.orderBy("x")) + (
        F.count(F.lit(1)).over(Window.partitionBy("x")) - 1
    ) / 2.0
    ry = F.rank().over(Window.orderBy("y")) + (
        F.count(F.lit(1)).over(Window.partitionBy("y")) - 1
    ) / 2.0
    ranked = base.withColumn("rx", rx).withColumn("ry", ry)
    return ranked.agg(F.corr("rx", "ry").alias("rank_corr"))


def cramers_v(df: DataFrame, a: Column | str, b: Column | str) -> DataFrame:
    """cramersV: association between two categorical columns,
    V = sqrt(chi2 / (n * (min(r,c) - 1)))."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    obs = df.groupBy(a.alias("a"), b.alias("b")).agg(
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
        .withColumn("chi", (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
    )
    dims = (
        j.agg(
            F.sum("chi").alias("chi2"),
            F.countDistinct("a").cast("double").alias("r"),
            F.countDistinct("b").cast("double").alias("c"),
            F.first("n").alias("n"),
        )
    )
    v = F.sqrt(F.col("chi2") / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1)))
    return dims.select(v.alias("cramers_v"), F.col("chi2"))
