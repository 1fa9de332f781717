"""Bitmap family vs python-set oracle (FunctionsBitmap.cpp analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from myscaledb_spark.functions import bitmap as bm


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(
        [
            Row(a=[1, 2, 3, 5, 8], b=[2, 3, 13]),
            Row(a=[], b=[1]),
            Row(a=[7], b=[7]),
            Row(a=[4, 6], b=[]),
        ]
    )


def test_scalar_ops(spark, pair_df):
    rows = pair_df.select(
        bm.bitmap_and("a", "b").alias("and_"),
        bm.bitmap_or("a", "b").alias("or_"),
        bm.bitmap_xor("a", "b").alias("xor_"),
        bm.bitmap_andnot("a", "b").alias("andnot_"),
        bm.bitmap_and_cardinality("a", "b").alias("andc"),
        bm.bitmap_or_cardinality("a", "b").alias("orc"),
        bm.bitmap_xor_cardinality("a", "b").alias("xorc"),
        bm.bitmap_andnot_cardinality("a", "b").alias("andnotc"),
        bm.bitmap_has_any("a", "b").alias("hasany"),
        bm.bitmap_has_all("a", "b").alias("hasall"),
        bm.bitmap_cardinality("a").alias("card"),
        bm.bitmap_min("a").alias("mn"),
        bm.bitmap_max("a").alias("mx"),
        "a",
        "b",
    ).collect()
    for r in rows:
        A, B = set(r.a), set(r.b)
        assert r.and_ == sorted(A & B)
        assert r.or_ == sorted(A | B)
        assert r.xor_ == sorted(A ^ B)
        assert r.andnot_ == sorted(A - B)
        assert (r.andc, r.orc, r.xorc, r.andnotc) == (
            len(A & B), len(A | B), len(A ^ B), len(A - B)
        )
        assert r.hasany == bool(A & B)
        assert r.hasall == B.issubset(A)
        assert r.card == len(A)
        assert r.mn == (min(A) if A else None)
        assert r.mx == (max(A) if A else None)


def test_build_contains_subset(spark):
    r = (
        spark.range(1)
        .select(
            bm.bitmap_build(F.array(*[F.lit(x) for x in [5, 1, 5, 3]])).alias("bm")
        )
        .select(
            "bm",
            bm.bitmap_contains("bm", 3).alias("c3"),
            bm.bitmap_contains("bm", 4).alias("c4"),
            bm.bitmap_subset_in_range("bm", 1, 5).alias("rng"),
            bm.bitmap_subset_limit("bm", 3, 2).alias("lim"),
            bm.bitmap_transform(
                "bm",
                F.array(F.lit(1), F.lit(5)),
                F.array(F.lit(100), F.lit(3)),
            ).alias("tr"),
        )
        .first()
    )
    assert r.bm == [1, 3, 5]
    assert r.c3 is True and r.c4 is False
    assert r.rng == [1, 3]  # [lo, hi) half-open
    assert r.lim == [3, 5]
    assert r.tr == [3, 100]  # 1->100, 5->3, dedup with existing 3


def test_group_aggregates(spark):
    df = spark.createDataFrame(
        [Row(g=1, v=[1, 2, 3]), Row(g=1, v=[2, 3, 4]), Row(g=1, v=[3, 4, 5]),
         Row(g=2, v=[10, 11])]
    )
    r = {
        row.g: row
        for row in df.groupBy("g")
        .agg(
            bm.group_bitmap_or_agg("v").alias("orr"),
            bm.group_bitmap_and_agg("v").alias("andd"),
            bm.group_bitmap_xor_agg("v").alias("xorr"),
        )
        .collect()
    }
    assert r[1].orr == [1, 2, 3, 4, 5]
    assert r[1].andd == [3]
    # {1,2,3} ^ {2,3,4} ^ {3,4,5} = {1,3,5}
    assert r[1].xorr == [1, 3, 5]
    assert r[2].orr == [10, 11] and r[2].andd == [10, 11] and r[2].xorr == [10, 11]


def test_group_bitmap_state(spark):
    df = spark.createDataFrame([Row(g=1, v=3), Row(g=1, v=1), Row(g=1, v=3)])
    r = df.groupBy("g").agg(
        bm.group_bitmap_state("v").alias("s"), bm.group_bitmap("v").alias("n")
    ).first()
    assert r.s == [1, 3] and r.n == 2
