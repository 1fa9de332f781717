"""Geo gate entries: geohashEncode/Decode round-trip, geohashesInBox,
pointInPolygon over testdata-derived points, polygon area/perimeter.

Oracle strategy:
  - geohash entries embed the pinned Python reference's outputs as VALUES
    (the same closed chain as hash_sip_int: Spark-expr ≡ Python-ref ≡ public
    test vectors, tests/test_geo.py).
  - pointInPolygon / polygon metrics get genuine independent SQL oracles —
    DuckDB recomputes the even-odd crossing parity / shoelace over an edge
    VALUES list with the identical double expression tree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register

# --- geohash encode/decode round-trip ----------------------------------------

_GH_POINTS = [
    (-180.0, -90.0),
    (180.0, 90.0),
    (0.0, 0.0),
    (10.40744, 57.64911),
    (-5.60302734375, 42.60498046875),
    (-122.419, 37.774),
    (139.6917, 35.6895),
    (-0.1278, 51.5074),
    (179.9999999, -89.9999999),
    (-73.9857, 40.7484),
]
_GH_PRECISIONS = [1, 4, 7, 12]


def _geohash_oracle_sql() -> str:
    from myscaledb_spark.functions.geo import geohash_decode_py, geohash_encode_py

    rows = []
    i = 0
    for p in _GH_PRECISIONS:
        for lon, lat in _GH_POINTS:
            gh = geohash_encode_py(lon, lat, p)
            dlon, dlat = geohash_decode_py(gh)
            # bare decimal literals parse as DECIMAL in DuckDB (ulp-lossy);
            # route through a quoted-string -> DOUBLE cast
            rows.append(
                f"({i}, '{gh}', CAST('{dlon!r}' AS DOUBLE), CAST('{dlat!r}' AS DOUBLE))"
            )
            i += 1
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(id, gh, dec_lon, dec_lat)"
    )


@register("geohash_roundtrip", _geohash_oracle_sql())
def geohash_roundtrip_q(spark, sf_dir):
    """geohashEncode at 4 precisions over boundary/landmark points, then
    geohashDecode of the produced hash (GeoHash.cpp:225-261). Decoded cell
    centers are exactly-representable interval midpoints, so the doubles
    compare bit-exactly against the Python reference literals."""
    from myscaledb_spark.functions.geo import geohash_decode, geohash_encode

    rows = []
    i = 0
    for p in _GH_PRECISIONS:
        for lon, lat in _GH_POINTS:
            rows.append((i, float(lon), float(lat), p))
            i += 1
    df = spark.createDataFrame(rows, "id int, lon double, lat double, p int")
    parts = [
        df.where(F.col("p") == p).select(
            "id", geohash_encode(F.col("lon"), F.col("lat"), p).alias("gh")
        )
        for p in _GH_PRECISIONS
    ]
    enc = parts[0]
    for more in parts[1:]:
        enc = enc.unionAll(more)
    d = geohash_decode(F.col("gh"))
    return enc.select(
        "id",
        "gh",
        d["longitude"].alias("dec_lon"),
        d["latitude"].alias("dec_lat"),
    )


# --- geohashesInBox ----------------------------------------------------------

_GH_BOXES = [
    (10.0, 57.0, 10.5, 57.5, 3),
    (-5.7, 42.5, -5.5, 42.7, 4),
    (0.0, 0.0, 0.0001, 0.0001, 6),
    (-122.52, 37.70, -122.35, 37.84, 5),
]


def _inbox_oracle_sql() -> str:
    from myscaledb_spark.functions.geo import geohashes_in_box_py

    rows = []
    for bid, (lon0, lat0, lon1, lat1, p) in enumerate(_GH_BOXES):
        for gh in geohashes_in_box_py(lon0, lat0, lon1, lat1, p):
            rows.append(f"({bid}, '{gh}')")
    return "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(box_id, gh)"


@register("geohashes_in_box_gate", _inbox_oracle_sql())
def geohashes_in_box_q(spark, sf_dir):
    """geohashesInBox over four boxes (grid alignment, sub-cell box, coastal
    city box), exploded to (box_id, geohash) rows (GeoHash.cpp:263-344)."""
    from myscaledb_spark.functions.geo import geohashes_in_box

    frames = []
    for bid, (lon0, lat0, lon1, lat1, p) in enumerate(_GH_BOXES):
        one = spark.createDataFrame(
            [(bid, lon0, lat0, lon1, lat1)],
            "box_id int, lon0 double, lat0 double, lon1 double, lat1 double",
        ).select(
            "box_id",
            F.explode(
                geohashes_in_box(
                    F.col("lon0"), F.col("lat0"), F.col("lon1"), F.col("lat1"), p
                )
            ).alias("gh"),
        )
        frames.append(one)
    out = frames[0]
    for more in frames[1:]:
        out = out.unionAll(more)
    return out


# --- pointInPolygon over testdata-derived points ------------------------------

# concave "arrow" ring; vertices at .x5 offsets so no (k/10, m/10) grid point
# lies on an axis-aligned edge
_RING = [
    (0.55, 0.15),
    (7.85, 2.35),
    (4.15, 4.05),
    (7.25, 8.45),
    (2.95, 6.75),
    (0.35, 8.05),
    (1.45, 4.25),
]


def _pip_oracle_sql() -> str:
    edges = ", ".join(
        f"({ax!r}, {ay!r}, {bx!r}, {by!r})"
        for (ax, ay), (bx, by) in zip(_RING, _RING[1:] + _RING[:1])
    )
    return f"""
    WITH pts AS (
      SELECT c_custkey, c_mktsegment,
             (c_custkey % 97) / 10.0 + 0.0009765625 AS x,
             (c_custkey % 89) / 10.0 + 0.00048828125 AS y
      FROM customer
    ),
    edges AS (SELECT * FROM (VALUES {edges}) AS e(ax, ay, bx, by)),
    crossings AS (
      SELECT p.c_custkey, p.c_mktsegment,
             SUM(CASE WHEN ((e.ay > p.y) != (e.by > p.y))
                       AND p.x < (e.bx - e.ax) * (p.y - e.ay) / (e.by - e.ay) + e.ax
                      THEN 1 ELSE 0 END) AS k
      FROM pts p CROSS JOIN edges e
      GROUP BY p.c_custkey, p.c_mktsegment
    )
    SELECT c_mktsegment, COUNT(*) AS n_inside, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM crossings WHERE k % 2 = 1
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """


@register("point_in_polygon_customers", _pip_oracle_sql())
def point_in_polygon_q(spark, sf_dir):
    """pointInPolygon of customer-key-derived grid points against a concave
    ring, aggregated per market segment. The oracle recomputes the even-odd
    parity in SQL with the identical double tree, so borderline intersections
    resolve identically on both engines."""
    from myscaledb_spark.functions.geo import point_in_polygon

    ring = F.array(
        *[F.struct(F.lit(a).alias("x"), F.lit(b).alias("y")) for a, b in _RING]
    )
    # the +1/1024, +1/2048 nudges (exact binary fractions, identical on
    # both engines) move the grid OFF the ring's rational edges: a point
    # exactly on an edge has ill-defined even-odd parity and the engines'
    # equal-magnitude double comparisons can break the tie differently
    # (observed at sf0.1: one customer out of 15k sat on an edge)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        ((F.col("c_custkey") % 97) / 10.0 + 0.0009765625).alias("x"),
        ((F.col("c_custkey") % 89) / 10.0 + 0.00048828125).alias("y"),
    )
    return (
        c.where(point_in_polygon(F.col("x"), F.col("y"), ring))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_inside"),
            F.sum("c_custkey").alias("key_sum"),
        )
        .orderBy("c_mktsegment")
    )


# --- polygon area / perimeter -------------------------------------------------


def _poly_metrics_oracle_sql() -> str:
    edges = ", ".join(
        f"({i}, {ax!r}, {ay!r}, {bx!r}, {by!r})"
        for i, ((ax, ay), (bx, by)) in enumerate(
            zip(_RING, _RING[1:] + _RING[:1])
        )
    )
    return f"""
    WITH edges AS (SELECT * FROM (VALUES {edges}) AS e(i, ax, ay, bx, by)),
    s AS (
      SELECT SUM(ax * by - bx * ay ORDER BY i) AS shoelace,
             SUM(sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay)) ORDER BY i) AS perim
      FROM edges
    )
    SELECT ROUND(ABS(shoelace) / 2, 6) AS area, ROUND(perim, 6) AS perimeter FROM s
    """


@register("polygon_metrics", _poly_metrics_oracle_sql())
def polygon_metrics_q(spark, sf_dir):
    """polygonAreaCartesian + polygonPerimeterCartesian of the gate ring
    (polygonArea.cpp / polygonPerimeter.cpp), rounded to 6."""
    from myscaledb_spark.functions.geo import (
        polygon_area_cartesian,
        polygon_perimeter_cartesian,
    )

    ring = F.array(
        *[F.struct(F.lit(a).alias("x"), F.lit(b).alias("y")) for a, b in _RING]
    )
    return spark.range(1).select(
        F.round(polygon_area_cartesian(ring), 6).alias("area"),
        F.round(polygon_perimeter_cartesian(ring), 6).alias("perimeter"),
    )
