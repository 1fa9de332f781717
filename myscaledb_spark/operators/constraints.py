"""CHECK constraints on insert (`src/Storages/ConstraintsDescription.cpp`,
`src/Interpreters/InterpreterInsertQuery.cpp` CheckConstraintsTransform —
every inserted block is validated against the table's CHECK expressions and
the whole insert fails with a named-constraint error on violation).

Spark-first: one aggregate pass computes the violation count per constraint
(conditional sums — a single job, no per-constraint scans), and a bounded
sample of offending rows is fetched only on failure for the error message.
The validated DataFrame is returned unchanged, so the pattern composes as
`write_with_checks(df, ...)` or inline `check_constraints(df, ...)` before
any sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myscaledb_spark.errors import MyScaleSparkError


class CheckConstraintViolation(MyScaleSparkError):
    def __init__(self, violations: dict[str, int], samples: dict[str, list]):
        self.violations = violations
        self.samples = samples
        detail = "; ".join(
            f"CHECK {name!r} violated by {n} row(s), e.g. {samples.get(name, [])[:2]}"
            for name, n in violations.items()
        )
        super().__init__(f"constraint check failed: {detail}")


def violation_counts(df: DataFrame, constraints: dict[str, Column]) -> DataFrame:
    """One-row violation audit: per-constraint violating-row counts plus
    n_rows, in a single pass. NULL predicate counts as a violation (the
    reference casts CHECK results to UInt8 and requires 1,
    src/Storages/ConstraintsDescription.cpp). This is the exact aggregate
    check_constraints gates inserts on, exposed as a DataFrame for audits."""
    aggs = [
        F.sum(F.when(cond, 0).otherwise(1)).cast("bigint").alias(name)
        for name, cond in constraints.items()
    ] + [F.count(F.lit(1)).alias("n_rows")]
    return df.agg(*aggs)


def check_constraints(
    df: DataFrame, constraints: dict[str, Column], sample_rows: int = 3
) -> DataFrame:
    """Validate CHECK constraints; returns df unchanged if all hold, raises
    CheckConstraintViolation naming each failed constraint otherwise.

    A constraint predicate must evaluate true for every row; NULL counts as
    a violation (the reference casts CHECK results to UInt8 and requires 1).
    """
    if not constraints:
        return df
    row = violation_counts(df, constraints).first()
    violations = {name: int(row[name] or 0) for name in constraints if row[name]}
    if not violations:
        return df
    samples = {}
    for name in violations:
        cond = constraints[name]
        samples[name] = [
            tuple(r)
            for r in df.filter(~F.coalesce(cond, F.lit(False))).head(sample_rows)
        ]
    raise CheckConstraintViolation(violations, samples)


def write_with_checks(
    df: DataFrame,
    path: str,
    constraints: dict[str, Column],
    fmt: str = "parquet",
    mode: str = "append",
) -> None:
    """INSERT with CHECK semantics: validate, then write — nothing lands on
    violation (the reference fails the whole block the same way)."""
    check_constraints(df, constraints).write.format(fmt).mode(mode).save(path)
