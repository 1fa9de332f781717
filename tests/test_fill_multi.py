"""Multi-column / DESC WITH FILL — the FillingTransform odometer port
(operators/fill_multi.py).  The full 29-statement reference pin runs in
test_reference_conformance.py (00995_order_by_with_fill); these unit tests
localize the core shapes.
"""

from __future__ import annotations

import pytest

from myscaledb_spark.operators.fill_multi import (
    FillSpec,
    InvalidFillError,
    validate_spec,
    with_fill_multi,
)
from myscaledb_spark.sql_dialect import ch_sql


@pytest.fixture(scope="module")
def ab(spark):
    return spark.createDataFrame(
        [(1, -2), (1, 3), (3, 2), (5, -1), (6, 5), (8, 0)], "a int, b int"
    )


def test_two_level_fill(ab):
    got = [(r.a, r.b) for r in with_fill_multi(ab, [FillSpec("a"), FillSpec("b")]).collect()]
    # 00995's '*** a WITH FILL, b WITH fill ***' block: inner fills run
    # strictly between a group's originals; inserted a-groups get b unset
    assert got == [
        (1, -2), (1, -1), (1, 0), (1, 1), (1, 2), (1, 3),
        (2, None), (3, 2), (4, None), (5, -1), (6, 5), (7, None), (8, 0),
    ]


def test_two_level_fill_inner_to_step(ab):
    got = [(r.a, r.b) for r in with_fill_multi(
        ab, [FillSpec("a"), FillSpec("b", to_value=6, step=2)]
    ).collect()]
    # the group grid is anchored ONCE (at the first original) — the off-grid
    # original 3 interleaves without re-anchoring, and TO=6 is exclusive
    assert got == [
        (1, -2), (1, 0), (1, 2), (1, 3), (1, 4), (2, None), (3, 2), (3, 4),
        (4, None), (5, -1), (5, 1), (5, 3), (5, 5), (6, 5), (7, None),
        (8, 0), (8, 2), (8, 4),
    ]


def test_desc_fill(spark):
    df = spark.createDataFrame([(5,), (1,)], "x int")
    got = [r.x for r in with_fill_multi(df, [FillSpec("x", descending=True)]).collect()]
    assert got == [5, 4, 3, 2, 1]


def test_validation_errors(spark):
    with pytest.raises(InvalidFillError):
        validate_spec(FillSpec("x", step=-1))          # ASC with negative step
    with pytest.raises(InvalidFillError):
        validate_spec(FillSpec("x", from_value=10, to_value=1))
    with pytest.raises(InvalidFillError):
        validate_spec(FillSpec("x", descending=True, from_value=1, to_value=10))
    with pytest.raises(InvalidFillError):
        validate_spec(FillSpec("x", from_value=-10), ch_type="UInt32")
    validate_spec(FillSpec("x", from_value=-10), ch_type="Int32")  # fine


def test_sql_surface_multi_fill_defaults(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, -2, 'p'), (1, 3, 'q'), (3, 2, 'r') "
        "AS t(a, b, s)"
    ).createOrReplaceTempView("_mfd")
    got = [
        tuple(r)
        for r in ch_sql(
            spark, "SELECT a, b, s FROM _mfd ORDER BY a WITH FILL, b WITH FILL"
        ).collect()
    ]
    # fill rows carry CH column defaults: 0 for the unset inner fill column
    # on inserted a-rows, '' for the String payload
    assert got == [
        (1, -2, "p"), (1, -1, ""), (1, 0, ""), (1, 1, ""), (1, 2, ""),
        (1, 3, "q"), (2, 0, ""), (3, 2, "r"),
    ]


def test_sql_surface_single_desc_fill(spark):
    spark.sql("SELECT * FROM VALUES (5),(2) AS t(x)").createOrReplaceTempView("_mfx")
    got = [r.x for r in ch_sql(spark, "SELECT x FROM _mfx ORDER BY x DESC WITH FILL").collect()]
    assert got == [5, 4, 3, 2]


def test_sql_surface_fill_then_plain_order_column(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 9), (1, 4), (3, 7) AS t(d, v)"
    ).createOrReplaceTempView("_mfo")
    got = [
        tuple(r)
        for r in ch_sql(
            spark, "SELECT d, v FROM _mfo ORDER BY d WITH FILL, v"
        ).collect()
    ]
    # v participates in the sort but not the fill; the inserted d=2 row
    # takes v's default 0
    assert got == [(1, 4), (1, 9), (2, 0), (3, 7)]
