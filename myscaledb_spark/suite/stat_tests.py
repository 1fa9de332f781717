"""Hypothesis-test aggregates, oracle-checked: the statistics are plain
closed-form aggregations so DuckDB reproduces them exactly. The p-values are
oracle-checked too: the SAME builder code (functions/special.py) emits the
Spark Column and the DuckDB SQL for the t/normal CDFs, so both engines
evaluate an identical IEEE expression tree."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.functions.special import (
    SqlOps,
    f_sf_p_expr,
    norm_ppf,
    normal_two_sided_p_expr,
    t_two_sided_p_expr,
)
from myscaledb_spark.suite import register

_T_P_SQL = t_two_sided_p_expr(SqlOps, "t_raw", "dof_raw")
_MW_Z_SQL = "((u_raw - n1 * n2 / 2) / sqrt(n1 * n2 * (n1 + n2 + 1) / 12))"
_MW_P_SQL = normal_two_sided_p_expr(SqlOps, _MW_Z_SQL)


@register(
    "welch_ttest_purchase_vs_view",
    f"""
    WITH m AS (
      SELECT COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)::DOUBLE AS na,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END)::DOUBLE AS nb,
             AVG(CASE WHEN event_type = 'purchase' THEN value END) AS ma,
             AVG(CASE WHEN event_type = 'view' THEN value END) AS mb,
             VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END) AS va,
             VAR_SAMP(CASE WHEN event_type = 'view' THEN value END) AS vb
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    s AS (
      SELECT (ma - mb) / sqrt(va / na + vb / nb) AS t_raw,
             (va / na + vb / nb) * (va / na + vb / nb) /
             ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)) AS dof_raw
      FROM m
    )
    SELECT ROUND(t_raw, 6) AS t_stat, ROUND(dof_raw, 4) AS dof,
           ROUND({_T_P_SQL}, 8) AS p_value
    FROM s
    """,
)
def welch_ttest_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import welch_ttest

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    out = welch_ttest(ev, "value", F.col("event_type") == "purchase")
    return out.select(
        F.round("t_stat", 6).alias("t_stat"),
        F.round("dof", 4).alias("dof"),
        F.round("p_value", 8).alias("p_value"),
    )


@register(
    "student_ttest_segments",
    f"""
    WITH m AS (
      SELECT COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)::DOUBLE AS na,
             COUNT(CASE WHEN o_orderstatus <> 'F' THEN 1 END)::DOUBLE AS nb,
             AVG(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS ma,
             AVG(CASE WHEN o_orderstatus <> 'F' THEN o_totalprice END) AS mb,
             VAR_SAMP(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS va,
             VAR_SAMP(CASE WHEN o_orderstatus <> 'F' THEN o_totalprice END) AS vb
      FROM orders
    ),
    s AS (
      SELECT (ma - mb) / sqrt((((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)) * (1 / na + 1 / nb)) AS t_raw,
             (na + nb - 2) AS dof_raw
      FROM m
    )
    SELECT ROUND(t_raw, 6) AS t_stat, dof_raw AS dof,
           ROUND({_T_P_SQL}, 8) AS p_value
    FROM s
    """,
)
def student_ttest_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import student_ttest

    o = load_table(spark, sf_dir, "orders")
    out = student_ttest(o, "o_totalprice", F.col("o_orderstatus") == "F")
    return out.select(
        F.round("t_stat", 6).alias("t_stat"),
        F.col("dof"),
        F.round("p_value", 8).alias("p_value"),
    )


@register(
    "mann_whitney_click_error",
    f"""
    WITH tagged AS (
      SELECT value AS v, (event_type = 'click') AS a
      FROM events WHERE event_type IN ('click', 'error')
    ),
    ranked AS (
      SELECT a, RANK() OVER (ORDER BY v) + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS r
      FROM tagged
    ),
    agg AS (
      SELECT SUM(CASE WHEN a THEN r END) AS r1,
             COUNT(CASE WHEN a THEN 1 END)::DOUBLE AS n1,
             COUNT(CASE WHEN NOT a THEN 1 END)::DOUBLE AS n2
      FROM ranked
    ),
    s AS (SELECT r1 - n1 * (n1 + 1) / 2 AS u_raw, n1, n2 FROM agg)
    SELECT ROUND(u_raw, 4) AS u_stat, n1, n2,
           ROUND({_MW_P_SQL}, 8) AS p_value
    FROM s
    """,
)
def mann_whitney_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import mann_whitney_u

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    out = mann_whitney_u(ev, "value", F.col("event_type") == "click")
    return out.select(
        F.round("u_stat", 4).alias("u_stat"),
        "n1",
        "n2",
        F.round("p_value", 8).alias("p_value"),
    )


# --- meanZTest (AggregateFunctionMeanZTest.cpp:25-39, Moments.h:418-433) ------
_ZT_VX, _ZT_VY, _ZT_CL = 2500.0, 2600.0, 0.95
_ZT_CRIT = norm_ppf(1.0 - (1.0 - _ZT_CL) / 2.0)  # ONE shared double literal
_ZT_P_SQL = normal_two_sided_p_expr(SqlOps, "z_raw")


@register(
    "mean_z_test",
    f"""
    WITH m AS (
      SELECT COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)::DOUBLE AS na,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END)::DOUBLE AS nb,
             AVG(CASE WHEN event_type = 'purchase' THEN value END) AS ma,
             AVG(CASE WHEN event_type = 'view' THEN value END) AS mb
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    s AS (
      SELECT (ma - mb) / sqrt(({_ZT_VX!r}::DOUBLE) / na + ({_ZT_VY!r}::DOUBLE) / nb) AS z_raw,
             (ma - mb) - ({_ZT_CRIT!r}::DOUBLE) * sqrt(({_ZT_VX!r}::DOUBLE) / na + ({_ZT_VY!r}::DOUBLE) / nb) AS ci_low_raw,
             (ma - mb) + ({_ZT_CRIT!r}::DOUBLE) * sqrt(({_ZT_VX!r}::DOUBLE) / na + ({_ZT_VY!r}::DOUBLE) / nb) AS ci_high_raw
      FROM m
    )
    SELECT ROUND(z_raw, 6) AS z_stat, ROUND({_ZT_P_SQL}, 8) AS p_value,
           ROUND(ci_low_raw, 6) AS ci_low, ROUND(ci_high_raw, 6) AS ci_high
    FROM s
    """,
)
def mean_z_test_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import mean_z_test

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    out = mean_z_test(
        ev, "value", F.col("event_type") == "purchase", _ZT_VX, _ZT_VY, _ZT_CL
    )
    return out.select(
        F.round("z_stat", 6).alias("z_stat"),
        F.round("p_value", 8).alias("p_value"),
        F.round("ci_low", 6).alias("ci_low"),
        F.round("ci_high", 6).alias("ci_high"),
    )


# --- one-way ANOVA (AggregateFunctionAnalysisOfVariance.h:30-90) --------------
_F_P_SQL = f_sf_p_expr(SqlOps, "f_raw", "d1_raw", "d2_raw")


@register(
    "anova_oneway",
    f"""
    WITH g AS (
      SELECT event_type, COUNT(*)::DOUBLE AS ng,
             SUM(value) AS sg, SUM(value * value) AS qg
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT COUNT(*)::DOUBLE AS k, SUM(ng) AS n, SUM(sg) AS s,
             SUM(qg - sg * sg / ng) AS ssw, SUM(sg * sg / ng) AS sb
      FROM g
    ),
    s AS (
      SELECT ((sb - s * s / n) / (k - 1)) / (ssw / (n - k)) AS f_raw,
             k - 1 AS d1_raw, n - k AS d2_raw
      FROM tot
    )
    SELECT ROUND(f_raw, 6) AS f_stat, ROUND({_F_P_SQL}, 8) AS p_value,
           d1_raw AS d1, d2_raw AS d2
    FROM s
    """,
)
def anova_oneway_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import anova_oneway

    ev = load_table(spark, sf_dir, "events")
    out = anova_oneway(ev, "value", "event_type")
    return out.select(
        F.round("f_stat", 6).alias("f_stat"),
        F.round("p_value", 8).alias("p_value"),
        "d1",
        "d2",
    )


# --- corrMatrix (AggregateFunctionVarianceMatrix.cpp:37) ----------------------
_CM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix_sql() -> str:
    cast = {c: f"CAST({c} AS DOUBLE)" for c in _CM_COLS}
    moments = ["COUNT(*)::DOUBLE AS n"]
    for i, c in enumerate(_CM_COLS):
        moments.append(f"SUM({cast[c]}) AS s{i}")
        moments.append(f"SUM({cast[c]} * {cast[c]}) AS q{i}")
    for i in range(len(_CM_COLS)):
        for j in range(i + 1, len(_CM_COLS)):
            moments.append(f"SUM({cast[_CM_COLS[i]]} * {cast[_CM_COLS[j]]}) AS p{i}_{j}")
    selects = []
    for i in range(len(_CM_COLS)):
        for j in range(i + 1, len(_CM_COLS)):
            corr = (
                f"(n * p{i}_{j} - s{i} * s{j}) / "
                f"(sqrt(n * q{i} - s{i} * s{i}) * sqrt(n * q{j} - s{j} * s{j}))"
            )
            selects.append(
                f"SELECT {i + 1} AS i, {j + 1} AS j, ROUND({corr}, 6) AS corr FROM m"
            )
    return "WITH m AS (SELECT " + ", ".join(moments) + " FROM lineitem)\n" + "\nUNION ALL ".join(selects)


@register("corr_matrix", _corr_matrix_sql())
def corr_matrix_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import corr_matrix

    li = load_table(spark, sf_dir, "lineitem")
    out = corr_matrix(li, _CM_COLS)
    return out.select("i", "j", F.round("corr", 6).alias("corr"))


@register(
    "rank_corr_qty_price",
    """
    WITH base AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
    ranked AS (
      SELECT RANK() OVER (ORDER BY x) + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
             RANK() OVER (ORDER BY y) + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
      FROM base
    )
    SELECT ROUND(corr(rx, ry), 6) AS rank_corr FROM ranked
    """,
)
def rank_corr_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import rank_corr

    li = load_table(spark, sf_dir, "lineitem")
    return rank_corr(li, "l_quantity", "l_extendedprice").select(
        F.round("rank_corr", 6).alias("rank_corr")
    )


@register(
    "cramers_v_status_priority",
    """
    WITH obs AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*)::DOUBLE AS o
      FROM orders GROUP BY 1, 2
    ),
    ra AS (SELECT a, SUM(o) AS row_n FROM obs GROUP BY a),
    cb AS (SELECT b, SUM(o) AS col_n FROM obs GROUP BY b),
    tot AS (SELECT SUM(o) AS n FROM obs),
    j AS (
      SELECT obs.o, ra.row_n * cb.col_n / tot.n AS e, obs.a, obs.b, tot.n
      FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
    ),
    agg AS (
      SELECT SUM((o - e) * (o - e) / e) AS chi2,
             COUNT(DISTINCT a)::DOUBLE AS r, COUNT(DISTINCT b)::DOUBLE AS c,
             ANY_VALUE(n) AS n
      FROM j
    )
    SELECT ROUND(sqrt(chi2 / (n * (LEAST(r, c) - 1))), 6) AS cramers_v,
           ROUND(chi2, 4) AS chi2
    FROM agg
    """,
)
def cramers_v_q(spark, sf_dir):
    from myscaledb_spark.operators.stats import cramers_v

    o = load_table(spark, sf_dir, "orders")
    out = cramers_v(o, "o_orderstatus", "o_orderpriority")
    return out.select(
        F.round("cramers_v", 6).alias("cramers_v"), F.round("chi2", 4).alias("chi2")
    )
