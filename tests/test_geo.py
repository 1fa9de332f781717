"""Geo family: geohash encode/decode/inBox (pinned to the public geohash
test vectors and cross-checked Spark-expr ≡ Python-ref), pointInPolygon
even-odd semantics, cartesian polygon area/perimeter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.functions.geo import (
    geohash_decode,
    geohash_decode_py,
    geohash_encode,
    geohash_encode_py,
    geohashes_in_box,
    geohashes_in_box_py,
    point_in_polygon,
    polygon_area_cartesian,
    polygon_perimeter_cartesian,
)

# Public vectors: Wikipedia's (57.64911N, 10.40744E) -> u4pruydqqvj and the
# geohash.org README example ezs42 -> (42.605, -5.603) at precision 5.
VECTORS = [
    (10.40744, 57.64911, 11, "u4pruydqqvj"),
    (-5.60302734375, 42.60498046875, 5, "ezs42"),
    (0.0, 0.0, 12, geohash_encode_py(0.0, 0.0, 12)),
]


def test_encode_py_public_vectors():
    assert geohash_encode_py(10.40744, 57.64911, 11) == "u4pruydqqvj"
    assert geohash_encode_py(-5.60302734375, 42.60498046875, 5) == "ezs42"


def test_decode_py_roundtrip():
    lon, lat = geohash_decode_py("ezs42")
    assert geohash_encode_py(lon, lat, 5) == "ezs42"
    assert lon == pytest.approx(-5.603, abs=1e-3)
    assert lat == pytest.approx(42.605, abs=1e-3)
    assert geohash_decode_py("") == (0.0, 0.0)


@pytest.mark.parametrize("precision", [1, 2, 5, 11, 12])
def test_spark_encode_matches_py(spark, precision):
    pts = [
        (-180.0, -90.0),
        (180.0, 90.0),
        (0.0, 0.0),
        (10.40744, 57.64911),
        (-5.60302734375, 42.60498046875),
        (-122.419, 37.774),
        (139.6917, 35.6895),
        (-0.1278, 51.5074),
        (179.9999999, -89.9999999),
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = [
        r.gh
        for r in df.select(
            geohash_encode(F.col("lon"), F.col("lat"), precision).alias("gh")
        ).collect()
    ]
    assert got == [geohash_encode_py(lon, lat, precision) for lon, lat in pts]


def test_spark_decode_matches_py(spark):
    ghs = ["u4pruydqqvj", "ezs42", "s", "7zzzzzzzzzzz", "kpbpbpbpbpbp", ""]
    df = spark.createDataFrame([(g,) for g in ghs], "gh string")
    rows = df.select(geohash_decode(F.col("gh")).alias("d")).collect()
    for g, r in zip(ghs, rows):
        lon, lat = geohash_decode_py(g)
        assert (r.d.longitude, r.d.latitude) == (lon, lat), g


def test_spark_inbox_matches_py(spark):
    boxes = [
        (10.0, 57.0, 10.5, 57.5, 3),
        (-5.7, 42.5, -5.5, 42.7, 4),
        (0.0, 0.0, 0.0001, 0.0001, 6),
        (5.0, 5.0, 4.0, 6.0, 3),  # inverted -> empty
    ]
    df = spark.createDataFrame(
        boxes, "lon0 double, lat0 double, lon1 double, lat1 double, p int"
    )
    for (lon0, lat0, lon1, lat1, p), row in zip(
        boxes,
        [
            df.where((F.col("lon0") == b[0]) & (F.col("p") == b[4]))
            .select(
                geohashes_in_box(
                    F.col("lon0"), F.col("lat0"), F.col("lon1"), F.col("lat1"), b[4]
                ).alias("a")
            )
            .collect()[0]
            for b in boxes
        ],
    ):
        assert row.a == geohashes_in_box_py(lon0, lat0, lon1, lat1, p)


def test_point_in_polygon_even_odd(spark):
    # concave "L" polygon
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0), (1.0, 4.0), (0.0, 4.0)]
    pts = [
        (0.5, 0.5, True),
        (2.0, 0.5, True),
        (0.5, 3.0, True),
        (2.0, 2.0, False),  # inside bounding box, outside the L
        (5.0, 5.0, False),
        (-1.0, 0.5, False),
    ]
    df = spark.createDataFrame(pts, "x double, y double, want boolean")
    ring_col = F.array(
        *[
            F.struct(F.lit(a).alias("x"), F.lit(b).alias("y"))
            for a, b in ring
        ]
    )
    rows = df.select(
        "want", point_in_polygon(F.col("x"), F.col("y"), ring_col).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.want


def test_polygon_area_perimeter(spark):
    square = [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0)]
    ring = F.array(
        *[F.struct(F.lit(a).alias("x"), F.lit(b).alias("y")) for a, b in square]
    )
    [r] = (
        spark.range(1)
        .select(
            polygon_area_cartesian(ring).alias("area"),
            polygon_perimeter_cartesian(ring).alias("perim"),
        )
        .collect()
    )
    assert r.area == pytest.approx(9.0)
    assert r.perim == pytest.approx(12.0)


# --- property tests -----------------------------------------------------------

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    lat=st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
    p=st.integers(min_value=1, max_value=12),
)
def test_py_roundtrip_cell_invariants(lon, lat, p):
    gh = geohash_encode_py(lon, lat, p)
    assert len(gh) == p
    dlon, dlat = geohash_decode_py(gh)
    # decoded center re-encodes to the same cell
    assert geohash_encode_py(dlon, dlat, p) == gh
    # center is within half a cell span of the input (in-range points)
    lon_bits = (p * 5) // 2 + (1 if p % 2 else 0)
    lat_bits = (p * 5) // 2
    if -180.0 <= lon < 180.0 and -90.0 <= lat < 90.0:
        assert abs(dlon - lon) <= math.ldexp(360.0, -lon_bits)
        assert abs(dlat - lat) <= math.ldexp(180.0, -lat_bits)


def test_spark_encode_matches_py_random_batch(spark):
    rng = random.Random(20260814)
    pts = [
        (rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for p in (3, 12):
        got = [
            r.gh
            for r in df.select(
                geohash_encode(F.col("lon"), F.col("lat"), p).alias("gh")
            ).collect()
        ]
        assert got == [geohash_encode_py(lon, lat, p) for lon, lat in pts]


def test_inbox_degenerate_box_single_cell(spark):
    """GeoHash.cpp items==0 fallback: a valid point-box on a cell boundary
    still yields its one (aligned-origin) cell."""
    assert geohashes_in_box_py(0.0, 0.0, 0.0, 0.0, 3) == [
        geohash_encode_py(0.0, 0.0, 3)
    ]
    [r] = (
        spark.range(1)
        .select(
            geohashes_in_box(
                F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0), 3
            ).alias("a")
        )
        .collect()
    )
    assert r.a == [geohash_encode_py(0.0, 0.0, 3)]


def test_empty_ring_guards(spark):
    import pyspark.sql.types as T

    empty = F.lit(None).cast(
        T.ArrayType(
            T.StructType(
                [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
            )
        )
    )
    zero_len = F.slice(
        F.array(F.struct(F.lit(0.0).alias("x"), F.lit(0.0).alias("y"))), 1, 0
    )
    [r] = (
        spark.range(1)
        .select(
            point_in_polygon(F.lit(1.0), F.lit(1.0), zero_len).alias("pip"),
            polygon_area_cartesian(zero_len).alias("area"),
            polygon_perimeter_cartesian(zero_len).alias("perim"),
        )
        .collect()
    )
    assert (r.pip, r.area, r.perim) == (False, 0.0, 0.0)


def test_decode_invalid_char_is_null(spark):
    [r] = (
        spark.createDataFrame([("ezs42a",), ("EZS42",)], "gh string")
        .select(geohash_decode(F.col("gh")).alias("d"))
        .limit(1)
        .collect()
    )
    assert r.d is None
