"""Special functions (erfc, lgamma, regularized incomplete beta) as column
expressions, for hypothesis-test p-values
(`src/AggregateFunctions/registerAggregateFunctions.cpp:66-74`: welchTTest /
studentTTest / mannWhitneyUTest return (stat, p-value) tuples).

Neither Spark SQL nor the oracle side should rely on engine-specific libm
wrappers (Spark has no erf/lgamma built-ins), so the approximations are built
from elementary ops (log/exp/sqrt/abs/arithmetic) through a tiny dual-backend
expression builder: the SAME Python code path emits either a PySpark Column
or a DuckDB SQL string. Identical expression trees ⇒ identical IEEE-double
evaluation on both engines ⇒ the driver gate's value-hash matches.

Approximations (all classical, public-domain formulas):
  - erfc: Chebyshev fit (Numerical Recipes `erfcc` form), |rel err| ≲ 1.2e-7
  - lgamma: Lanczos, g=7, 9 coefficients, ~15 significant digits
  - I_x(a,b): continued fraction (A&S 26.5.8) at fixed depth — no early
    termination, so the expression tree is static and engine-independent;
    depth 24 converges to double precision for the t-CDF parameter regime
    (a = dof/2 ≫ b = 1/2) on either side of the symmetry split.

Scale note: these expressions only ever run on one-row aggregate outputs
(the test statistics), so tree size, not data volume, is the constraint.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class SparkOps:
    """Backend emitting PySpark Columns."""

    @staticmethod
    def lit(v: float) -> Column:
        return F.lit(float(v))

    @staticmethod
    def add(x, y):
        return x + y

    @staticmethod
    def sub(x, y):
        return x - y

    @staticmethod
    def mul(x, y):
        return x * y

    @staticmethod
    def div(x, y):
        return x / y

    @staticmethod
    def neg(x):
        return -x

    @staticmethod
    def log(x):
        return F.log(x)

    @staticmethod
    def exp(x):
        return F.exp(x)

    @staticmethod
    def sqrt(x):
        return F.sqrt(x)

    @staticmethod
    def abs(x):
        return F.abs(x)

    @staticmethod
    def lt(x, y):
        return x < y

    @staticmethod
    def where(cond, a, b):
        return F.when(cond, a).otherwise(b)


class SqlOps:
    """Backend emitting DuckDB SQL strings (fully parenthesized; `ln` is
    natural log in DuckDB — its `log` is log10; literals cast to DOUBLE so
    DuckDB's decimal-literal parsing can't change the type)."""

    @staticmethod
    def lit(v: float) -> str:
        return f"({float(v)!r}::DOUBLE)"

    @staticmethod
    def add(x, y):
        return f"({x} + {y})"

    @staticmethod
    def sub(x, y):
        return f"({x} - {y})"

    @staticmethod
    def mul(x, y):
        return f"({x} * {y})"

    @staticmethod
    def div(x, y):
        return f"({x} / {y})"

    @staticmethod
    def neg(x):
        return f"(-({x}))"

    @staticmethod
    def log(x):
        return f"ln({x})"

    @staticmethod
    def exp(x):
        return f"exp({x})"

    @staticmethod
    def sqrt(x):
        return f"sqrt({x})"

    @staticmethod
    def abs(x):
        return f"abs({x})"

    @staticmethod
    def lt(x, y):
        return f"({x} < {y})"

    @staticmethod
    def where(cond, a, b):
        return f"(CASE WHEN {cond} THEN {a} ELSE {b} END)"


# Lanczos g=7, n=9 (the standard public coefficient set)
_LANCZOS = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)

_HALF_LOG_2PI = 0.9189385332046727  # 0.5 * ln(2*pi)

# Chebyshev erfc fit coefficients (innermost-first in Horner order)
_ERFC_CHEB = (
    -1.26551223,
    1.00002368,
    0.37409196,
    0.09678418,
    -0.18628806,
    0.27886807,
    -1.13520398,
    1.48851587,
    -0.82215223,
    0.17087277,
)


def lgamma_expr(o, x):
    """Lanczos ln Γ(x) for x > 0."""
    xm1 = o.sub(x, o.lit(1.0))
    a = o.lit(_LANCZOS[0])
    for i in range(1, 9):
        a = o.add(a, o.div(o.lit(_LANCZOS[i]), o.add(xm1, o.lit(float(i)))))
    t = o.add(xm1, o.lit(7.5))
    out = o.add(o.lit(_HALF_LOG_2PI), o.mul(o.add(xm1, o.lit(0.5)), o.log(t)))
    out = o.sub(out, t)
    return o.add(out, o.log(a))


def erfc_expr(o, x):
    """Chebyshev erfc(x) for any real x (uses the z<0 reflection)."""
    az = o.abs(x)
    t = o.div(o.lit(1.0), o.add(o.lit(1.0), o.mul(o.lit(0.5), az)))
    poly = o.lit(_ERFC_CHEB[-1])
    for c in reversed(_ERFC_CHEB[:-1]):
        poly = o.add(o.lit(c), o.mul(t, poly))
    ans = o.mul(t, o.exp(o.add(o.neg(o.mul(az, az)), poly)))
    return o.where(o.lt(x, o.lit(0.0)), o.sub(o.lit(2.0), ans), ans)


def _betacf_expr(o, a, b, x, depth: int = 24):
    """A&S 26.5.8 continued fraction for I_x(a,b), evaluated innermost-out at
    fixed depth (static expression tree; no Lentz early-exit)."""
    ds = []
    for j in range(1, depth + 1):
        if j % 2 == 1:  # d_{2m+1}, m = (j-1)//2
            m = (j - 1) // 2
            num = o.neg(o.mul(o.mul(o.add(a, o.lit(float(m))),
                                    o.add(o.add(a, b), o.lit(float(m)))), x))
            den = o.mul(o.add(a, o.lit(2.0 * m)), o.add(a, o.lit(2.0 * m + 1.0)))
        else:  # d_{2m}, m = j//2
            m = j // 2
            num = o.mul(o.mul(o.lit(float(m)), o.sub(b, o.lit(float(m)))), x)
            den = o.mul(o.add(a, o.lit(2.0 * m - 1.0)), o.add(a, o.lit(2.0 * m)))
        ds.append(o.div(num, den))
    acc = o.lit(1.0)
    for d in reversed(ds):
        acc = o.add(o.lit(1.0), o.div(d, acc))
    return o.div(o.lit(1.0), acc)


def ibeta_expr(o, x, a, b, depth: int = 24):
    """Regularized incomplete beta I_x(a,b), 0 <= x <= 1, via the symmetric
    continued-fraction split (direct for x below the convergence threshold,
    1 - I_{1-x}(b,a) above). x is clamped to (0, 1) exclusive: Spark's ln(0)
    yields NULL while DuckDB's yields -inf, so the open-interval clamp is what
    keeps the two engines bit-identical at the boundaries (p→0 / p→1)."""
    lo, hi = o.lit(1e-308), o.lit(0.9999999999999999)
    x = o.where(o.lt(x, lo), lo, x)
    x = o.where(o.lt(hi, x), hi, x)
    ln_bt = o.add(
        o.sub(o.sub(lgamma_expr(o, o.add(a, b)), lgamma_expr(o, a)), lgamma_expr(o, b)),
        o.add(o.mul(a, o.log(x)), o.mul(b, o.log(o.sub(o.lit(1.0), x)))),
    )
    bt = o.exp(ln_bt)
    direct = o.div(o.mul(bt, _betacf_expr(o, a, b, x, depth)), a)
    flipped = o.sub(
        o.lit(1.0),
        o.div(o.mul(bt, _betacf_expr(o, b, a, o.sub(o.lit(1.0), x), depth)), b),
    )
    thresh = o.div(o.add(a, o.lit(1.0)), o.add(o.add(a, b), o.lit(2.0)))
    return o.where(o.lt(x, thresh), direct, flipped)


def t_two_sided_p_expr(o, t, v):
    """Two-sided p-value of Student's t: p = I_{v/(v+t²)}(v/2, 1/2)."""
    x = o.div(v, o.add(v, o.mul(t, t)))
    return ibeta_expr(o, x, o.div(v, o.lit(2.0)), o.lit(0.5))


def normal_two_sided_p_expr(o, z):
    """Two-sided p-value under N(0,1): p = erfc(|z| / sqrt(2))."""
    return erfc_expr(o, o.div(o.abs(z), o.lit(1.4142135623730951)))


def f_sf_p_expr(o, f, d1, d2):
    """Survival function of the F distribution (the one-way ANOVA p-value,
    `AggregateFunctionAnalysisOfVariance.h:70-90`):
    p = 1 - CDF_F(f; d1, d2) = I_{d2/(d2 + d1 f)}(d2/2, d1/2)."""
    x = o.div(d2, o.add(d2, o.mul(d1, f)))
    return ibeta_expr(o, x, o.div(d2, o.lit(2.0)), o.div(d1, o.lit(2.0)))


def norm_ppf(p: float) -> float:
    """Driver-side standard-normal quantile (Acklam's rational approximation,
    |rel err| < 1.15e-9 — the classical public-domain algorithm). Used only
    to fold a confidence-level parameter into ONE double literal that both
    backends then share, so approximation error can't split the engines."""
    if not 0.0 < p < 1.0:
        raise ValueError("norm_ppf requires 0 < p < 1")
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    import math

    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )
