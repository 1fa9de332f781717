"""Special functions (erfc / lgamma / incomplete beta) — dual-backend
equivalence and genuine numerical accuracy vs known reference values."""

from __future__ import annotations

import math

import pytest

from myscaledb_spark.functions.special import (
    SparkOps,
    SqlOps,
    erfc_expr,
    ibeta_expr,
    lgamma_expr,
    normal_two_sided_p_expr,
    t_two_sided_p_expr,
)


class PyOps:
    lit = staticmethod(float)
    add = staticmethod(lambda x, y: x + y)
    sub = staticmethod(lambda x, y: x - y)
    mul = staticmethod(lambda x, y: x * y)
    div = staticmethod(lambda x, y: x / y)
    neg = staticmethod(lambda x: -x)
    log = staticmethod(math.log)
    exp = staticmethod(math.exp)
    sqrt = staticmethod(math.sqrt)
    abs = staticmethod(abs)
    lt = staticmethod(lambda x, y: x < y)
    where = staticmethod(lambda c, a, b: a if c else b)


def test_lgamma_accuracy():
    for x in [0.5, 1.0, 2.0, 3.7, 100.0, 3750.5]:
        assert lgamma_expr(PyOps, x) == pytest.approx(math.lgamma(x), rel=1e-11, abs=1e-11)


def test_erfc_accuracy():
    for z in [0.0, 0.5, 1.0, 1.959964, 3.0, -1.0, -2.5]:
        assert erfc_expr(PyOps, z) == pytest.approx(math.erfc(z), rel=2e-6, abs=5e-8)


@pytest.mark.parametrize(
    "t,v,want",
    [
        (2.228, 10.0, 0.05),          # classic t-table critical value
        (2.0, 10.0, 0.07338803),      # scipy.stats.t.sf(2,10)*2
        (1.959964, 1e6, 0.05),        # t -> normal at huge dof
        (0.0, 50.0, 1.0),
        (0.5, 7500.0, 0.61708),       # ~2*norm.sf(0.5)
    ],
)
def test_t_two_sided_p(t, v, want):
    assert t_two_sided_p_expr(PyOps, t, v) == pytest.approx(want, rel=3e-4)


def test_normal_two_sided_p():
    assert normal_two_sided_p_expr(PyOps, 1.959964) == pytest.approx(0.05, rel=1e-4)
    assert normal_two_sided_p_expr(PyOps, 0.0) == pytest.approx(1.0, abs=1e-6)
    # symmetric in z
    assert normal_two_sided_p_expr(PyOps, -2.3) == normal_two_sided_p_expr(PyOps, 2.3)


def test_ibeta_boundaries_no_domain_error():
    # x=0 / x=1 must not raise (clamped) and must hit the limits
    assert ibeta_expr(PyOps, 0.0, 5.0, 0.5) == pytest.approx(0.0, abs=1e-12)
    # clamp at 1-1e-16 with b=0.5 leaves a sqrt(eps)~2.6e-8 gap — inherent
    assert ibeta_expr(PyOps, 1.0, 5.0, 0.5) == pytest.approx(1.0, abs=1e-7)


def test_spark_sql_python_backends_agree(spark):
    """The three backends must evaluate the same tree to the same double."""
    import duckdb

    cases = [(2.0, 10.0), (-1.3, 3958.39), (0.7, 14998.0)]
    for t, v in cases:
        py = t_two_sided_p_expr(PyOps, t, v)
        from pyspark.sql import functions as F

        sp = (
            spark.range(1)
            .select(t_two_sided_p_expr(SparkOps, F.lit(t), F.lit(v)).alias("p"))
            .first()
            .p
        )
        sql = duckdb.sql(
            "SELECT " + t_two_sided_p_expr(SqlOps, f"({t!r}::DOUBLE)", f"({v!r}::DOUBLE)")
        ).fetchone()[0]
        assert sp == pytest.approx(py, rel=1e-12)
        assert sql == pytest.approx(py, rel=1e-12)


def test_stats_p_values_against_python_oracle(spark):
    """welch/student/mannWhitney end-to-end p agree with the python mirror of
    the same formulas computed from collected data."""
    from pyspark.sql import functions as F
    from myscaledb_spark.operators.stats import (
        mann_whitney_u,
        student_ttest,
        welch_ttest,
    )

    ev = spark.table("events").filter(F.col("event_type").isin("purchase", "view"))
    r = welch_ttest(ev, "value", F.col("event_type") == "purchase").first()
    assert r.p_value == pytest.approx(
        t_two_sided_p_expr(PyOps, r.t_stat, r.dof), rel=1e-10
    )

    o = spark.table("orders")
    r = student_ttest(o, "o_totalprice", F.col("o_orderstatus") == "F").first()
    assert r.p_value == pytest.approx(
        t_two_sided_p_expr(PyOps, float(r.t_stat), float(r.dof)), rel=1e-10
    )

    ev2 = spark.table("events").filter(F.col("event_type").isin("click", "error"))
    r = mann_whitney_u(ev2, "value", F.col("event_type") == "click").first()
    z = (r.u_stat - r.n1 * r.n2 / 2) / math.sqrt(r.n1 * r.n2 * (r.n1 + r.n2 + 1) / 12)
    assert r.p_value == pytest.approx(
        normal_two_sided_p_expr(PyOps, z), rel=1e-10
    )


def test_bfloat16_round_bitexact(spark):
    """bfloat16_round (arithmetic collapse) must equal the bit-level
    float32 >> 16 << 16 truncation for normal-range values."""
    import struct

    from pyspark.sql import functions as F

    from myscaledb_spark.operators.stats import bfloat16_round

    def bf(x: float) -> float:
        b = struct.unpack("<I", struct.pack("<f", x))[0]
        return struct.unpack("<f", struct.pack("<I", (b >> 16) << 16))[0]

    vals = [123.456, 0.0, -7.25, 1e-20, 3.4e38, 1.0, 2.0, 65535.9, -0.001,
            0.1, -1e-30, 1.9999999, 255.9, 256.0, 1e30]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    got = {r["i"]: r["b"] for r in df.select(
        "i", bfloat16_round(F.col("v")).alias("b")).collect()}
    for i, v in enumerate(vals):
        assert got[i] == bf(v), v


def test_distributed_rank_matches_window_form(spark):
    """r7 ask #4: mann_whitney_u / rank_corr must (a) reproduce the exact
    values of the single-window rank formulation they replaced and (b) plan
    every Window partitioned (no Exchange-SinglePartition rank over raw
    rows — the 100 TB scale-killer)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from myscaledb_spark.operators.stats import mann_whitney_u, rank_corr

    ev = spark.table("events").filter(F.col("event_type").isin("click", "error"))
    got = mann_whitney_u(ev, "value", F.col("event_type") == "click").first()

    tagged = ev.select(F.col("value").alias("v"),
                       (F.col("event_type") == "click").alias("a"))
    ranked = tagged.withColumn(
        "r",
        F.rank().over(Window.orderBy("v"))
        + (F.count(F.lit(1)).over(Window.partitionBy("v")) - 1) / 2.0,
    )
    old = ranked.agg(
        F.sum(F.when(F.col("a"), F.col("r"))).alias("r1"),
        F.count(F.when(F.col("a"), 1)).cast("double").alias("n1"),
        F.count(F.when(~F.col("a"), 1)).cast("double").alias("n2"),
    ).first()
    assert got.u_stat == old.r1 - old.n1 * (old.n1 + 1) / 2  # bit-exact
    assert (got.n1, got.n2) == (old.n1, old.n2)

    li = spark.table("lineitem")
    rc = rank_corr(li, "l_quantity", "l_extendedprice").first()
    rx = F.rank().over(Window.orderBy("x")) + (
        F.count(F.lit(1)).over(Window.partitionBy("x")) - 1) / 2.0
    ry = F.rank().over(Window.orderBy("y")) + (
        F.count(F.lit(1)).over(Window.partitionBy("y")) - 1) / 2.0
    base = li.select(F.col("l_quantity").alias("x"),
                     F.col("l_extendedprice").alias("y"))
    old_rc = (base.withColumn("rx", rx).withColumn("ry", ry)
              .agg(F.corr("rx", "ry").alias("c")).first().c)
    assert rc.rank_corr == pytest.approx(old_rc, rel=1e-12)

    for df in (
        mann_whitney_u(ev, "value", F.col("event_type") == "click"),
        rank_corr(li, "l_quantity", "l_extendedprice"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window " in line:
                assert "_pid" in line, f"unpartitioned Window in plan: {line}"


def test_rank_corr_skew_guard_low_cardinality_axis(spark):
    """r8 VERDICT finding #4 (skew guard): a heavily-tied axis must not
    funnel every tie of a value through one window task. rank_corr routes
    a low-cardinality axis (approx distinct ≤ 65536) through a
    distinct-value rank table — ties collapse map-side in a groupBy, the
    tiny table broadcast-joins back — and stays EXACT while doing it.
    Pins exactness on the worst shapes: binary axis (one value = 50% of
    all rows), constant axis (rho undefined → NaN), and a heavy-hitter
    axis (90% one value)."""
    import math

    from pyspark.sql import functions as F

    from myscaledb_spark.operators.stats import rank_corr

    li = spark.table("lineitem").limit(20000)

    def exact_spearman(df, xc, yc):
        pdf = df.select(F.col(xc).alias("x"), F.col(yc).alias("y")).toPandas()
        return pdf["x"].rank().corr(pdf["y"].rank())

    # binary axis: every tie run is half the input
    b = li.withColumn("_b", (F.col("l_orderkey") % 2 == 0).cast("int"))
    got = rank_corr(b, "_b", "l_extendedprice").first().rank_corr
    assert got == pytest.approx(exact_spearman(b, "_b", "l_extendedprice"),
                                abs=1e-12)

    # heavy hitter: 90% of rows share one value (the r8 funnel case)
    h = li.withColumn(
        "_h",
        F.when(F.col("l_linenumber") > 1, F.lit(7.0)).otherwise(
            F.col("l_quantity")
        ),
    )
    got = rank_corr(h, "_h", "l_extendedprice").first().rank_corr
    assert got == pytest.approx(exact_spearman(h, "_h", "l_extendedprice"),
                                abs=1e-12)

    # constant axis: zero rank variance → NaN (matches F.corr semantics)
    c = li.withColumn("_c", F.lit(1.0))
    assert math.isnan(rank_corr(c, "_c", "l_extendedprice").first().rank_corr)


def test_grouped_tdigest_sql_routes_to_real_estimator(spark):
    """r7 ask #6: the canonical grouped quantileTDigest SQL shape must use
    the per-group Dunning digest — a single-group query therefore equals
    the whole-table helper exactly; non-canonical shapes keep the
    percentile_approx mapping (no error)."""
    from pyspark.sql import functions as F

    from myscaledb_spark.operators.stats import tdigest_quantiles
    from myscaledb_spark.sql_dialect import ch_sql

    out = {
        r.l_returnflag: (r.q50, r.q90)
        for r in ch_sql(
            spark,
            "SELECT l_returnflag, quantileTDigest(0.5)(l_extendedprice) AS q50, "
            "quantileTDigest(0.9)(l_extendedprice) AS q90 "
            "FROM lineitem GROUP BY l_returnflag",
        ).collect()
    }
    li_a = spark.table("lineitem").filter(F.col("l_returnflag") == "A")
    whole = tdigest_quantiles(li_a, "l_extendedprice", [0.5, 0.9])
    assert out["A"] == (whole[0], whole[1])

    # WHERE routes through too
    got = ch_sql(
        spark,
        "SELECT l_returnflag, quantileTDigest(0.5)(l_extendedprice) AS q50 "
        "FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_returnflag",
    ).collect()
    assert len(got) == 1 and got[0].q50 == whole[0]

    # non-canonical shape (expression key) falls back to percentile_approx
    fb = ch_sql(
        spark,
        "SELECT upper(l_returnflag) AS k, "
        "quantileTDigest(0.5)(l_extendedprice) AS q50 "
        "FROM lineitem GROUP BY upper(l_returnflag)",
    )
    assert fb.count() == 3
